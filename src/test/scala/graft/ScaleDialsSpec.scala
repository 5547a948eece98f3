package graft

import org.apache.spark.sql.functions._

import graft.operators.{Embeddings, NearDup}

/** Tests for the SCALE dials of the candidate-generation operators —
  * the properties that decide whether a plan survives 100 TB, asserted
  * on synthetic corpora small enough to count exactly:
  *
  *   - SimHash: with band entropy sized to the corpus
  *     ([[NearDup.simHashBandBitsFor]]), candidate-join output grows
  *     ~linearly in n on unrelated docs (the frozen 4-bit default is
  *     Θ(n²) by construction — that mode is for small corpora only).
  *   - Exact n-gram: the `maxDocFreq` cap bounds the candidate join on
  *     stop-shingle-heavy corpora without losing planted near-dups.
  *   - ANN LSH: `planes` actually changes bucket granularity, and
  *     multi-`tables` recall recovers a planted neighbor via an
  *     independent hyperplane family.
  */
class ScaleDialsSpec extends SparkSpecBase {

  // -------------------------------------------------- MinHash banding

  /** Moderate-similarity corpus: every doc = a 9-token shared template
    * prefix + 31 unique tokens → pairwise J ≈ 7/69 ≈ 0.10 (the fat
    * tail that degenerates r = 1 banding), plus one planted near-dup
    * pair (docs 1000/1001, one token changed, J ≈ 0.85). */
  private lazy val moderateCorpus = {
    import spark.implicits._
    val template = (1 to 9).map(i => s"tmpl$i").mkString(" ")
    val background = (0 until 40).map { i =>
      (i.toLong, template + " " + (1 to 31).map(j => s"d${i}u$j").mkString(" "))
    }
    val base = template + " " + (1 to 31).map(j => s"plu$j").mkString(" ")
    (background ++ Seq((1000L, base), (1001L, base.replace("plu15", "CHANGED"))))
      .toDF("doc_id", "text")
  }

  test("r=2 banding cuts moderate-J candidates ~10x, keeps the planted J>=0.8 pair") {
    val sh = NearDup.shingles(moderateCorpus)
    val r1 = NearDup.minHashBandedCandidates(sh, rowsPerBand = 1).count()
    val r2 = NearDup.minHashBandedCandidates(sh, rowsPerBand = 2).count()
    val n = 42L
    val allPairs = n * (n - 1) / 2
    // r=1: P(cand) = 1-(1-J)^16 ≈ 0.82 at J = 0.10 — most pairs pay
    // for exact confirmation; the r=1 mode has degenerated.
    assert(r1 > allPairs / 2, s"expected r=1 to degenerate: $r1 of $allPairs")
    // r=2: P(cand) = 1-(1-J^2)^8 ≈ 0.08 — an order of magnitude fewer.
    assert(r2 * 8 < r1, s"expected ~10x cut: r1=$r1 r2=$r2")
    // ...while the planted near-dup pair still confirms (P ≈ 1-3.5e-5),
    // under the battery's cross-engine SLICED sha256 family.
    val got = NearDup.minHashPairsBanded(moderateCorpus, rowsPerBand = 2,
        word = NearDup.SlicedSha256MinHashFamily)
      .select("doc_a", "doc_b").as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)]).collect().toSet
    assert(got.contains((1000L, 1001L)), s"planted pair missing from $got")
  }

  test("r=1 vs r=2 banding recall measured by Eval.pairRecall (the battery's report shape)") {
    // the dial trade as NUMBERS, not an analytic bound: found = each
    // banding's CONFIRMED pairs, truth = exact n-gram Jaccard — the
    // exact composition behind neardup_minhash_recall /
    // neardup_minhash_banded_recall. On this corpus both settings keep
    // the planted pair (recall 1000‰) and the exact confirm keeps
    // precision 1000‰ — what r=2 buys is the candidate cut the test
    // above measures; what this pins is that the cut costs ZERO
    // confirmed pairs here, and that the report machinery agrees with
    // a hand count.
    val truth = NearDup.ngramJaccardPairs(moderateCorpus)
    def rep(rows: Int) = graft.operators.Eval.pairRecall(
      NearDup.minHashPairsBanded(moderateCorpus, rowsPerBand = rows,
        word = NearDup.SlicedSha256MinHashFamily),
      truth, aCol = "doc_a", bCol = "doc_b").collect().head
    for (rows <- Seq(1, 2)) {
      val r = rep(rows)
      assert(r.getLong(4) === 1000L, s"r=$rows recall")
      assert(r.getLong(5) === 1000L, s"r=$rows precision")
      assert(!r.getBoolean(6))
      assert(r.getLong(0) > 0L, "truth must be non-empty for the claim to bite")
    }
  }

  test("SlicedSha256MinHashFamily words are the documented digest slices") {
    import spark.implicits._
    // word i must equal the 60-bit window of sha256("(i div 4):"+s) at
    // hex offset 1 + 15·(i mod 4) — computed here via the long-form
    // reference expressions, row by row, for two digests' worth of i.
    val df = Seq("alpha beta gamma", "x").toDF("s")
    val checks = (0 until 8).map { i =>
      val digest = sha2(concat(lit(s"${i / 4}:"), col("s")), 256)
      val expected = conv(substring(digest, 1 + 15 * (i % 4), 15), 16, 10)
        .cast("long")
      (NearDup.SlicedSha256MinHashFamily(i, col("s")) === expected).as(s"ok$i")
    }
    val row = df.select(checks: _*).collect()
    assert(row.forall(r => (0 until 8).forall(i => r.getBoolean(i))))
    // and distinct i map to distinct words on real text (independence
    // smoke check — a slicing bug that reused a window would collide)
    val words = df.limit(1).select(
      (0 until 8).map(i =>
        NearDup.SlicedSha256MinHashFamily(i, col("s")).as(s"w$i")): _*)
      .collect().head
    assert((0 until 8).map(words.getLong).distinct.size === 8)
  }

  // ---------------------------------------------------------- SimHash

  /** n docs of 10 globally-unique tokens each → disjoint shingle sets,
    * so signatures are iid and candidates are pure band collisions. */
  private def unrelatedDocs(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, (0 until 10).map(j => s"d${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("simhash candidates grow ~linearly when band bits track corpus size") {
    val bands = 8
    def candCount(n: Int): Long = {
      val bandBits = NearDup.simHashBandBitsFor(n)
      // hammingMax = widthBits disables the Hamming filter: what we are
      // counting is the JOIN OUTPUT — the thing that explodes at scale.
      NearDup.simHashCandidates(
        unrelatedDocs(n),
        widthBits = bands * bandBits, bands = bands,
        hammingMax = bands * bandBits).count()
    }
    val c1k = candCount(1000) // bandBits = 13 → E ≈ 8·C(1000,2)/2^13 ≈ 490
    val c2k = candCount(2000) // bandBits = 14 → E ≈ 8·C(2000,2)/2^14 ≈ 975
    assert(c1k > 50, s"collision counting degenerate: c1k=$c1k")
    val ratio = c2k.toDouble / c1k
    // Linear scaling doubles (≈2); a quadratic join would quadruple.
    assert(ratio < 3.0, s"candidate growth not linear: $c1k -> $c2k (x$ratio)")
  }

  test("simhash default banding is the quadratic mode (the documented trade)") {
    // Sanity-check the premise of the dial: at the frozen 4-bit default
    // the same unrelated corpus yields ~64 % of ALL pairs as candidates.
    val n = 200
    val cand = NearDup.simHashCandidates(
      unrelatedDocs(n), hammingMax = 64).count()
    val allPairs = n.toLong * (n - 1) / 2
    assert(cand > allPairs / 2,
      s"expected ≥ half of all pairs at 4-bit bands, got $cand of $allPairs")
  }

  test("wide-signature simhash still confirms the exact planted pairs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok20", "CHANGED") // J = 35/41 ≈ 0.853
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
      .toDF("doc_id", "text")
    val got = NearDup.simHashPairs(
      docs, widthBits = 128, bands = 16, hammingMax = 127)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 853L), (1L, 4L, 1000L), (2L, 4L, 853L)))
  }

  test("sha256 hash family (the oracle-replicable one) confirms the planted pairs") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok20", "CHANGED")
    val unrelated = (1 to 40).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
      .toDF("doc_id", "text")
    // the battery's scaled config: 16 × 12-bit bands, no Hamming
    // prefilter, sha256-derived 60-bit hash words
    val got = NearDup.simHashPairs(
      docs, widthBits = SparkEntry.ScaledSimHashWidth,
      bands = SparkEntry.ScaledSimHashBands,
      hammingMax = SparkEntry.ScaledSimHashWidth,
      family = NearDup.Sha256Family)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 853L), (1L, 4L, 1000L), (2L, 4L, 853L)))
  }

  // ----------------------------------------------------- n-gram df cap

  /** Every doc opens with the same 4 stop tokens (2 corpus-wide hot
    * shingles) and continues with unique filler; docs 100/101 are
    * identical (the planted exact near-dup). */
  private lazy val hotCorpus = {
    import spark.implicits._
    val prefix = "stopa stopb stopc stopd"
    val planted = prefix + " " + (1 to 40).map(i => s"pl$i").mkString(" ")
    val background = (0 until 30).map { i =>
      (i.toLong, prefix + " " + (0 until 40).map(j => s"bg${i}u$j").mkString(" "))
    }
    (background ++ Seq((100L, planted), (101L, planted))).toDF("doc_id", "text")
  }

  test("maxDocFreq bounds the hot-shingle candidate join, keeps planted pairs") {
    val sh = NearDup.shingles(hotCorpus)
    val uncapped = NearDup.ngramCandidates(sh, "doc_id", Long.MaxValue).count()
    val capped = NearDup.ngramCandidates(sh, "doc_id", 5L).count()
    val n = 32L
    assert(uncapped === n * (n - 1) / 2) // hot shingles pair EVERY doc
    assert(capped === 1L)                // cap leaves only the planted pair
    val got = NearDup.ngramJaccardPairs(hotCorpus, maxDocFreq = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((100L, 101L, 1000L)))
    // and the capped exact path agrees with the complete baseline here
    val baseline = NearDup.ngramJaccardPairs(hotCorpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === baseline)
  }

  // ------------------------------------------- winnowing df cap

  /** Every doc opens with the same 6-token hot preamble (several
    * corpus-wide winnow fingerprints — k=3, w=4 selects at least one
    * k-gram of any 6-token run) and continues with unique filler;
    * docs (n+100, n+101) are identical (the planted pair). */
  private def hotWinnowCorpus(n: Int) = {
    import spark.implicits._
    val hot = "wina winb winc wind wine winf"
    val planted = hot + " " + (1 to 20).map(i => s"wpl$i").mkString(" ")
    val background = (0 until n).map { i =>
      (i.toLong, hot + " " + (0 until 20).map(j => s"wbg${i}u$j").mkString(" "))
    }
    (background ++ Seq((n + 100L, planted), (n + 101L, planted)))
      .toDF("doc_id", "text")
  }

  test("winnowPairs: the df cap bounds hot-fingerprint growth, keeps the planted pair") {
    import graft.operators.TextAnalysis
    // Above the WinnowMaxDocFreq cap the hot preamble's fingerprints
    // are dropped from the candidate join entirely: pair count must not
    // grow as the corpus doubles (a quadratic join would quadruple).
    val p1 = TextAnalysis.winnowPairs(hotWinnowCorpus(100)).count()
    val p2 = TextAnalysis.winnowPairs(hotWinnowCorpus(200)).count()
    assert(p1 === 1L, s"expected only the planted pair, got $p1")
    assert(p2 === 1L, s"expected only the planted pair at 2x corpus, got $p2")
    val got = TextAnalysis.winnowPairs(hotWinnowCorpus(100))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((200L, 201L)))
    // and BELOW the cap the hot fingerprints do pair (the dial is the
    // only thing standing between this corpus and all-pairs)
    val small = TextAnalysis.winnowPairs(hotWinnowCorpus(20)).count()
    assert(small > 20L, s"sub-cap corpus should pair via the hot preamble: $small")
  }

  test("tfidfSimilarity: maxDf drops corpus-hot terms; pair count stays bounded") {
    import graft.operators.TextAnalysis
    def corpus(n: Int) = {
      import spark.implicits._
      val hot = (1 to 6).map(i => s"hot$i").mkString(" ")
      val planted = (1 to 20).map(i => s"tpl$i").mkString(" ")
      val background = (0 until n).map { i =>
        (i.toLong, hot + " " + (0 until 20).map(j => s"tbg${i}u$j").mkString(" "))
      }
      (background ++ Seq((n + 100L, hot + " " + planted),
        (n + 101L, hot + " " + planted))).toDF("doc_id", "text")
    }
    // maxDf = 50: the hot terms (df = n+2 > 50) leave the posting
    // stream, so the term equijoin pairs only docs sharing RARE terms —
    // the planted twins — independent of corpus size.
    val p1 = TextAnalysis.tfidfSimilarity(corpus(100), maxDf = 50L).count()
    val p2 = TextAnalysis.tfidfSimilarity(corpus(200), maxDf = 50L).count()
    assert(p1 === 1L, s"expected only the planted pair, got $p1")
    assert(p2 === 1L, s"expected only the planted pair at 2x corpus, got $p2")
    val row = TextAnalysis.tfidfSimilarity(corpus(100), maxDf = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).head
    assert((row._1, row._2) === (200L, 201L))
    // identical rare-term vectors → cosine 1.0 (up to integer division)
    assert(row._3 >= 999000L, s"twin cosine should be ~1e6: ${row._3}")
  }

  // ------------------------------------------------------ ANN dials

  private lazy val randomEmb = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until 256).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
  }

  test("planes is a real dial: bucket count grows with it, bounded by 2^planes") {
    def nBuckets(planes: Int): Long =
      Embeddings.annLsh(randomEmb, planes = planes)
        .select("bucket").distinct().count()
    val b2 = nBuckets(2)
    val b6 = nBuckets(6)
    assert(b2 <= 4 && b6 <= 64)
    assert(b6 > b2, s"bucket count must grow with planes: planes=2 -> $b2, planes=6 -> $b6")
  }

  test("planesFor sizes buckets to the corpus") {
    assert(Embeddings.planesFor(1000000L, 1024L) === 10)   // 2^10 buckets of ~1k
    assert(Embeddings.planesFor(100L, 1024L) === 1)        // tiny corpus → min
    assert(Embeddings.planesFor(1L << 40, 1024L) === 30)
  }

  test("centroidStepFor keeps the IVF centroid count FIXED as the corpus grows") {
    // the sizing function itself: step tracks n, so K = n/step does not
    assert(Embeddings.centroidStepFor(1L << 20, 4096L) === 256L)
    assert(Embeddings.centroidStepFor(1L << 21, 4096L) === 512L)
    assert(Embeddings.centroidStepFor(100L, 4096L) === 1L) // tiny corpus → all seeds

    // and the seed predicate realizes ≈ targetCentroids in BOTH
    // selection modes — centroid count must NOT track corpus size
    // (ids offset by 7 so the modulo mode is not trivially aligned)
    import spark.implicits._
    def ids(n: Int) = (0 until n).map(i => i.toLong + 7L).toDF("vec_id")
    def seedCount(n: Int, byHash: Boolean): Long = {
      val step = Embeddings.centroidStepFor(n.toLong, 64L)
      ids(n).filter(Embeddings.centroidSeedPred(col("vec_id"), step, byHash)).count()
    }
    for (byHash <- Seq(false, true)) {
      val k1 = seedCount(2000, byHash)
      val k2 = seedCount(4000, byHash)
      assert(k1 >= 40 && k1 <= 96, s"byHash=$byHash: k(2000)=$k1 not ≈ 64")
      assert(k2 >= 40 && k2 <= 96, s"byHash=$byHash: k(4000)=$k2 not ≈ 64")
    }
  }

  test("hash-seeded IVF (sparse ids) finds a planted twin pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val planted = Array.fill(16)(rnd.nextFloat() * 2f - 1f)
    val twin = planted.map(x => x * 1.0001f)
    // sparse, non-dense ids: the modulo seed rule would degenerate here
    val corpus = (0 until 200).map { i =>
      (i.toLong * 1000L + 17L, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    } ++ Seq((999983L, planted), (999991L, twin))
    val emb = corpus.toDF("vec_id", "embedding")
    val step = Embeddings.centroidStepFor(202L, 16L) // K ≈ 16
    val rows = Embeddings.annIvf(emb, centroidStep = step, seedByHash = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows.size === 202)
    // near-identical twins share the argmax centroid → same cell →
    // mutual top-1 by exact cosine
    assert(rows(999983L)._1 === 999991L)
    assert(rows(999991L)._1 === 999983L)
    assert(rows(999983L)._2 > 999000L)
  }

  test("Lloyd-refined IVF keeps the full output contract and finds planted twins") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val planted = Array.fill(16)(rnd.nextFloat() * 2f - 1f)
    val twin = planted.map(x => x * 1.0001f)
    val corpus = (0 until 200).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    } ++ Seq((1000L, planted), (1001L, twin))
    val emb = corpus.toDF("vec_id", "embedding")
    val step = Embeddings.centroidStepFor(202L, 16L)
    val rows = Embeddings.annIvf(emb, centroidStep = step, kmeansIter = 1)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.size === 202) // every vector still emitted after refinement
    assert(rows(1000L)._2 === 1001L)
    assert(rows(1001L)._2 === 1000L)
    assert(rows(1000L)._3 > 999000L)
    // cell ids remain seed ids (identity persists through refinement)
    val seedIds = corpus.map(_._1).filter(_ % step == 0).toSet
    assert(rows.values.map(_._1).toSet.subsetOf(seedIds))
  }

  test("multi-table ANN recovers a planted neighbor via an independent family") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val planted = Array.fill(16)(rnd.nextFloat() * 2f - 1f)
    val twin = planted.map(x => x * 1.0001f) // cosine ≈ 1 − ε
    val corpus = (0 until 200).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    } ++ Seq((1000L, planted), (1001L, twin))
    val emb = corpus.toDF("vec_id", "embedding")

    val rows = Embeddings.annLsh(emb, planes = 6, tables = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // the twins are near-identical → same sign pattern in EVERY family,
    // so any table buckets them together and they are mutual top-1
    assert(rows(1000L)._1 === 1001L)
    assert(rows(1001L)._1 === 1000L)
    assert(rows(1000L)._2 > 999000L) // cos ≈ 1.0

    // the families are genuinely independent bucketings: table 1
    // assigns different buckets than table 0 for at least one vector
    val b0 = Embeddings.annLsh(emb, planes = 6, tables = 1).select("vec_id", "bucket")
    val prep = emb.select(col("vec_id"),
      Embeddings.bucketOf(Embeddings.quantize(col("embedding")), 6, 1).as("b1"))
    val joined = b0.join(prep, "vec_id")
      .filter(col("bucket") =!= col("b1")).count()
    assert(joined > 0, "table-1 buckets must differ from table-0 somewhere")
  }
}
