package graft

import org.apache.spark.sql.functions._

import graft.operators.{Embeddings, NearDup}

/** Crafted-input tests for the scale operators: all three near-dup
  * candidate paths must produce the exact confirmed pair set (and the
  * Jaccard value is checked against a hand model); cosine top-k must
  * rank by true cosine; LSH ANN must only ever pair bucket-mates.
  */
class NearDupEmbeddingsSpec extends SparkSpecBase {

  private def shingleSet(text: String): Set[String] =
    text.split("\\s+").filter(_.nonEmpty).sliding(NearDup.ShingleN)
      .filter(_.length == NearDup.ShingleN).map(_.mkString(" ")).toSet

  // 40 distinct tokens → 38 shingles; one changed word kills 3 of them:
  // J = 35 / 41 ≈ 0.853 ≥ 0.8 — a genuine near-dup under the threshold.
  private val base =
    (1 to 40).map(i => s"tok$i").mkString(" ")
  private val nearDup = base.replace("tok20", "CHANGED")
  private val unrelated =
    "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
      .toDF("doc_id", "text")
  }

  private lazy val expectedPairs: Set[(Long, Long, Long)] = {
    val sets = Map(1L -> shingleSet(base), 2L -> shingleSet(nearDup),
      3L -> shingleSet(unrelated), 4L -> shingleSet(base))
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      union = (sets(a) | sets(b)).size
      if union > 0 && inter * 1000 >= NearDup.ThresholdMilli * union
    } yield (a, b, (1000L * inter) / union)).toSet
  }

  private def runPath(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Set[(Long, Long, Long)] =
    f(docs).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("exact n-gram path equals the set model (incl. an identical-doc pair)") {
    // sanity on the fixture itself: 1-4 identical, 1-2 near, 3 unrelated
    assert(expectedPairs.contains((1L, 4L, 1000L)))
    assert(expectedPairs.exists { case (a, b, _) => (a, b) == (1L, 2L) })
    assert(!expectedPairs.exists { case (a, b, _) => b == 3L || a == 3L })
    assert(runPath(NearDup.ngramJaccardPairs(_)) === expectedPairs)
  }

  test("minhash and simhash paths confirm to the same exact pair set") {
    assert(runPath(NearDup.minHashPairs(_)) === expectedPairs)
    assert(runPath(NearDup.simHashPairs(_)) === expectedPairs)
  }

  test("incremental minhash emits exactly the base×increment cross pairs") {
    // base = odd ids {1, 3}, increment = even ids {2, 4}: the cross
    // subset of the full model is (1,2) near-dup and (1,4) identical;
    // (2,4) is increment-internal and must NOT appear.
    val base = docs.where(col("doc_id") % 2 === 1)
    val inc = docs.where(col("doc_id") % 2 === 0)
    val got = NearDup.minHashPairsBetween(base, inc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val crossModel = expectedPairs.filter { case (a, b, _) => a % 2 == 1 && b % 2 == 0 }
    assert(crossModel.map(p => (p._1, p._2)) === Set((1L, 2L), (1L, 4L)))
    assert(got === crossModel)
  }

  test("minhash signatures round-trip parquet: the incremental persistence seam") {
    import org.apache.spark.sql.DataFrame
    val base = docs.where(col("doc_id") % 2 === 1)
    val inc = docs.where(col("doc_id") % 2 === 0)
    val shA = NearDup.shingles(base, "doc_id", "text")
    val shB = NearDup.shingles(inc, "doc_id", "text")

    // persist the accumulated base side's signatures between "runs"
    val dir = java.nio.file.Files.createTempDirectory("graft_sigs").toString
    NearDup.minHashSignatures(shA).write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    // bit-exact round trip: k int64 mins per doc
    assert(persisted.collect().toSet ===
      NearDup.minHashSignatures(shA).collect().toSet)

    // candidates from PERSISTED base signatures + fresh increment ones
    def explodeSig(sig: DataFrame, as: String) = sig.select(
      col("doc_id").as(as),
      posexplode(array((0 until NearDup.NumMinHashes).map(i => col(s"h$i")): _*))
        .as(Seq("hi", "hv")))
    val cand = explodeSig(persisted, "doc_a")
      .join(explodeSig(NearDup.minHashSignatures(shB), "doc_b"), Seq("hi", "hv"))
      .select("doc_a", "doc_b")
    val viaSeam = NearDup.confirmBetween(cand, shA, shB)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = NearDup.minHashPairsBetween(base, inc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSeam === direct && direct.nonEmpty)
  }

  test("all three paths equal the model on a randomized corpus (fixed seed)") {
    import spark.implicits._
    // 12 base docs (80-120 tokens over a 50-word vocab), each with an
    // exact copy or a 1-3-token mutation — a deterministic minefield of
    // planted near-dups plus random background similarity.
    val rnd = new scala.util.Random(1234)
    val vocab = (1 to 50).map(i => s"w$i")
    def randDoc(): Seq[String] =
      Seq.fill(80 + rnd.nextInt(41))(vocab(rnd.nextInt(vocab.size)))
    val corpus = (0 until 12).flatMap { i =>
      val base = randDoc()
      val variantTokens = {
        val muts = 1 + rnd.nextInt(3)
        val idxs = Seq.fill(muts)(rnd.nextInt(base.size)).distinct
        base.zipWithIndex.map { case (w, j) =>
          if (idxs.contains(j)) s"MUT${i}_$j" else w
        }
      }
      val variant = if (i % 3 == 0) base else variantTokens
      Seq((i * 2L, base.mkString(" ")), (i * 2L + 1L, variant.mkString(" ")))
    }
    val df = corpus.toDF("doc_id", "text")

    val sets = corpus.map { case (id, t) => id -> shingleSet(t) }.toMap
    val model = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      union = (sets(a) | sets(b)).size
      if union > 0 && inter * 1000 >= NearDup.ThresholdMilli * union
    } yield (a, b, (1000L * inter) / union)).toSet
    assert(model.nonEmpty) // the fixture must actually plant pairs

    def run(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      f(df).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(NearDup.ngramJaccardPairs(_)) === model)
    assert(run(NearDup.minHashPairs(_)) === model)
    assert(run(NearDup.simHashPairs(_)) === model)
  }

  test("cosine top-k ranks by true cosine, self excluded") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)), // closest to 0
      (2L, Array(0.5f, 0.5f, 0f, 0f)), // second
      (3L, Array(0f, 1f, 0f, 0f)),     // orthogonal-ish third
      (4L, Array(-1f, 0f, 0f, 0f)))    // opposite, last
      .toDF("vec_id", "embedding")
    val got = Embeddings.cosineTopK(emb, col("vec_id") === 0, k = 4)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.reverse) // cos desc
    // true cosines: 1↦0.9938…, 2↦0.7071…, 3↦0, 4↦-1
    assert(math.abs(got(0)._2 - 993884) <= 1)
    assert(math.abs(got(1)._2 - 707107) <= 1)
    assert(got(2)._2 === 0L)
    assert(got(3)._2 === -1000000L)
  }

  test("cosine near-dup emits exactly the above-threshold bucket-mate pairs") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(1.0001f, 2.0002f, 3.0003f, 4.0004f)), // twin of 0: cos ≈ 1
      (2L, Array(-1f, -2f, -3f, -4f)))                 // opposite bucket
      .toDF("vec_id", "embedding")
    val got = Embeddings.cosineNearDupPairs(emb, thresholdMicro = 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(p => (p._1, p._2)).toSet === Set((0L, 1L)))
    assert(got.head._3 >= 999000L) // cos ≈ 1.0
    // threshold actually filters: at an impossible threshold, no rows
    assert(Embeddings.cosineNearDupPairs(emb, thresholdMicro = 1000001L).count() === 0)
  }

  test("IVF ANN assigns to the max-cosine centroid and pairs within cells") {
    import spark.implicits._
    // centroidStep = 10 → centroids are ids 0 and 10. Hand-computable
    // 2-D geometry: {0, 1, 2} land in cell 0, {10, 11} in cell 10.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),        // centroid of cell 0
      (1L, Array(0.95f, 0.05f, 0f, 0f)),  // cos(1,0)=.99868 > cos(1,10)
      (2L, Array(0.9f, 0.1f, 0f, 0f)),    // best mate is 1, not centroid 0
      (10L, Array(0f, 1f, 0f, 0f)),       // centroid of cell 10
      (11L, Array(0.05f, 0.95f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val rows = Embeddings.annIvf(emb, centroidStep = 10L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(rows.keySet === Set(0L, 1L, 2L, 10L, 11L))
    assert(rows(0L)._1 === 0L && rows(1L)._1 === 0L && rows(2L)._1 === 0L)
    assert(rows(10L)._1 === 10L && rows(11L)._1 === 10L)
    // top-1 by true cosine within the cell:
    assert(rows(0L)._2 === 1L)  // cos(0,1)=.99868 > cos(0,2)=.99388
    assert(rows(1L)._2 === 0L)  // cos(1,0)=.99868 > cos(1,2)=.99827
    assert(rows(2L)._2 === 1L)  // cos(2,1)=.99827 > cos(2,0)=.99388
    assert(rows(10L)._2 === 11L && rows(11L)._2 === 10L)
    assert(rows(1L)._3 === 998618L) // exact fixed-point cosine 9.5e13/√(9.05e13·1e14)
  }

  test("semDedup drops higher-id intra-cell twins, dup_of = smallest twin") {
    import spark.implicits._
    // same IVF geometry as above: centroids 0 and 10. Ids 1, 2, 3 are
    // identical vectors in cell 0 (cos = 1); 11 twins centroid 10.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),        // centroid of cell 0
      (1L, Array(0.95f, 0.05f, 0f, 0f)),  // first-seen of the twin trio
      (2L, Array(0.95f, 0.05f, 0f, 0f)),  // twin of 1 → dropped
      (3L, Array(0.95f, 0.05f, 0f, 0f)),  // twin of 1 AND 2 → dup_of = min = 1
      (10L, Array(0f, 1f, 0f, 0f)),       // centroid of cell 10
      (11L, Array(0f, 1f, 0f, 0f)))       // twin of 10 → dropped
      .toDF("vec_id", "embedding")
    // τ = 999000: cos(1, 0) = 998618 < τ, so 1 survives its own
    // centroid; only the EXACT twins (cos_x1e6 = 1000000) are dups
    val got = Embeddings.semDedup(emb, centroidStep = 10L, thresholdMicro = 999000L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L, 10L, 11L))
    assert(got(0L) === ((0L, -1L, true)))
    assert(got(1L) === ((0L, -1L, true)))
    assert(got(2L) === ((0L, 1L, false)))
    assert(got(3L) === ((0L, 1L, false))) // min twin, not 2
    assert(got(10L) === ((10L, -1L, true)))
    assert(got(11L) === ((10L, 10L, false)))
    // at an impossible threshold nothing is dropped
    val all = Embeddings.semDedup(emb, centroidStep = 10L, thresholdMicro = 1000001L)
    assert(all.where(!col("kept")).count() === 0)
  }

  test("IVF nprobe recovers a true neighbor split across a cell boundary") {
    import spark.implicits._
    // 2-D geometry: centroids c0 at 0° and c10 at ~25.8°; a (12°) homes
    // to c0, b (14°) homes to c10, yet a and b are each other's true
    // nearest (2° apart, cos ≈ 0.9994) — the classic boundary split.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),          // centroid of cell 0
      (10L, Array(0.9f, 0.436f, 0f, 0f)),   // centroid of cell 10
      (1L, Array(0.978f, 0.208f, 0f, 0f)),  // a → home cell 0
      (2L, Array(0.970f, 0.242f, 0f, 0f)))  // b → home cell 10
      .toDF("vec_id", "embedding")

    def run(nprobe: Int) = Embeddings.annIvf(emb, centroidStep = 10L, nprobe = nprobe)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val single = run(1)
    assert(single(1L)._1 === 0L && single(2L)._1 === 10L) // homes as designed
    assert(single(1L)._2 === 0L)   // nprobe=1: best is the home centroid…
    assert(single(2L)._2 === 10L)  // …the boundary neighbor is invisible
    val probed = run(2)
    assert(probed(1L)._1 === 0L && probed(2L)._1 === 10L) // homes unchanged
    assert(probed(1L)._2 === 2L)   // nprobe=2 finds the true neighbor
    assert(probed(2L)._2 === 1L)
  }

  test("knnGraph: one slot per neighbor even when several tables duplicate the pair") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(1f, 2f, 3f, 4f)),      // identical to 0 → same bucket in EVERY table
      (2L, Array(-1f, -2f, -3f, -4f)))  // opposite → never a bucket-mate
      .toDF("vec_id", "embedding")
    val got = Embeddings.knnGraph(emb, k = 2, tables = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // k = 2 with 3 tables: a leaked duplicate would give (0, 1) rank 2
    // as well; the re-agg must leave exactly one edge each way, and the
    // lonely opposite vector emits nothing
    assert(got === Set((0L, 1L, 1L), (1L, 0L, 1L)))
  }

  test("LSH ANN pairs only bucket-mates; identical vectors are mutual top-1") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 2f, 3f, 4f)),
      (1L, Array(1f, 2f, 3f, 4f)),      // identical to 0 → same bucket
      (2L, Array(-1f, -2f, -3f, -4f)))  // opposite → different bucket
      .toDF("vec_id", "embedding")
    val rows = Embeddings.annLsh(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    assert(rows(0L)._1 === rows(1L)._1)        // same bucket
    assert(rows(0L)._2 === 1L && rows(1L)._2 === 0L)
    assert(rows(0L)._3 === 1000000L)           // exact cosine 1.0
    assert(rows(2L)._1 !== rows(0L)._1)        // opposite signs → other bucket
    assert(rows(2L)._2 === -1L && rows(2L)._3 === 0L) // lonely-bucket sentinel
  }

  /** Reference unit-cost Levenshtein (full DP) for the model checks. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  test("edit-distance confirm equals the DP model on candidates; cutoff excludes") {
    val got = NearDup.editDistancePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    val texts = Map(1L -> base, 2L -> nearDup, 3L -> unrelated, 4L -> base)
    // model: every shingle-sharing pair within the cutoff, true distance
    val sets = texts.map { case (k, v) => k -> shingleSet(v) }
    val expected = (for {
      a <- texts.keys; b <- texts.keys
      if a < b && (sets(a) & sets(b)).nonEmpty
      d = lev(texts(a), texts(b)) if d <= NearDup.MaxEditDist
    } yield (a, b) -> d.toLong).toMap

    assert(got === expected)
    assert(got((1L, 4L)) === 0L)          // identical docs
    assert(got.contains((1L, 2L)))        // one-token rewrite within cutoff
    // a tight cutoff drops the rewrite but keeps the identical pair
    val tight = NearDup.editDistancePairs(docs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight === Set((1L, 4L)))
  }

  test("scalar quantization: exact codes on a known vector, zero on constant") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0f, 1f, 0.5f, 0.25f)),
      (1L, Array(0.3f, 0.3f, 0.3f, 0.3f))) // constant → all-zero codes
      .toDF("vec_id", "embedding")
    val rows = Embeddings.scalarQuantize(emb).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // model of the fixed-point pipeline for vector 0
    val qv = Array(0f, 1f, 0.5f, 0.25f)
      .map(x => math.round(x.toDouble * Embeddings.Scale))
    val (mn, mx) = (qv.min, qv.max)
    val codes = qv.map(x => (x - mn) * 255 / (mx - mn))
    val sig = codes.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum % 1000000007L
    val errMax = qv.zip(codes)
      .map { case (x, c) => math.abs(x - (mn + c * (mx - mn) / 255)) }.max
    assert(rows(0L) === ((mn, mx, sig, errMax)))
    // floor error bound: err ≤ (mx−mn)/255 + 1
    assert(errMax <= (mx - mn) / 255 + 1)

    val (cmn, cmx, csig, cerr) = rows(1L)
    assert(cmn === cmx && csig === 0L && cerr === 0L)
  }

  test("scalar quantization error stays within the floor bound (fixed seed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val emb = (0L until 50L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 1.2f - 0.6f))).toDF("vec_id", "embedding")
    val bad = Embeddings.scalarQuantize(emb)
      .filter(col("err_max") > (col("mx") - col("mn")) / 255 + 1)
      .count()
    assert(bad === 0L)
  }

  test("ivf centroids round-trip parquet: the index-maintenance seam") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // base on EVEN ids so the id%step seed predicate finds seeds
    val base = emb.where(col("vec_id") % 2 === 0)
    val inc = emb.where(col("vec_id") % 2 === 1)

    // "run 1": build + persist the coarse quantizer from the base only
    val cents = Embeddings.ivfCentroids(base, centroidStep = 10L)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    cents.write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    assert(persisted.collect().map(_.getLong(0)).sorted.toSeq ===
      cents.collect().map(_.getLong(0)).sorted.toSeq)

    // "run 2": assign ONLY the increment against the frozen table —
    // bit-identical to assigning against the in-memory centroids
    def cells(c: org.apache.spark.sql.DataFrame) =
      Embeddings.ivfAssign(inc, c)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSeam = cells(persisted)
    assert(viaSeam === cells(cents))
    assert(viaSeam.nonEmpty)

    // cell identities agree with the inline assignment annIvf performs
    // for the base corpus (same centroid table by construction)
    val inline = Embeddings.annIvf(base, centroidStep = 10L)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seamBase = Embeddings.ivfAssign(base, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seamBase === inline)
  }

  test("pq codebooks round-trip parquet: frozen-codebook increment encoding") {
    // the PQ sibling of the IVF maintenance seam: build + persist the
    // per-subspace codebooks from the base corpus, then encode ONLY
    // the increment against the frozen table — codes must be
    // bit-identical to encoding against the in-memory codebooks, so
    // accumulated code tables stay valid across runs.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.where(col("vec_id") % 2 === 0)
    val inc = emb.where(col("vec_id") % 2 === 1)
    val cents = Embeddings.pqCentroids(base, centroidStep = 10L)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    cents.write.mode("overwrite").parquet(dir)
    val persisted = spark.read.parquet(dir)
    def codes(c: org.apache.spark.sql.DataFrame) =
      Embeddings.pqEncode(inc, c)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
    val viaSeam = codes(persisted)
    assert(viaSeam === codes(cents))
    assert(viaSeam.nonEmpty)
    // every increment vector carries all PqSubspaces codes
    assert(viaSeam.keySet.map(_._1).forall(id =>
      (0 until Embeddings.PqSubspaces).forall(s => viaSeam.contains(id -> s.toLong))))
  }

  test("frozen-index IVF-PQ search equals the inline build (full round trip)") {
    // the composed deployment seam: persist BOTH index artifacts,
    // reload, search via annIvfPqWith — results must be bit-identical
    // to annIvfPq's inline build of the same index
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_frozen").toString
    Embeddings.ivfCentroids(emb, centroidStep = 10L)
      .write.mode("overwrite").parquet(s"$dir/ivf")
    Embeddings.pqCentroids(emb, centroidStep = 10L)
      .write.mode("overwrite").parquet(s"$dir/pq")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val frozen = key(Embeddings.annIvfPqWith(emb, col("vec_id") % 5 === 0,
      spark.read.parquet(s"$dir/ivf"), spark.read.parquet(s"$dir/pq")))
    val inline = key(Embeddings.annIvfPq(emb, col("vec_id") % 5 === 0,
      centroidStep = 10L))
    assert(frozen === inline)
    assert(frozen.nonEmpty)
  }

  test("IVF-PQ at the dial extreme (probe all cells, refine >= corpus) IS exact L2") {
    // the refinement contract's endpoint: with every cell probed the
    // candidate set is the whole corpus (minus self), and with the
    // shortlist covering it the exact rerank makes the search
    // bit-identical to brute-force l2TopK — ids, ranks, AND distances.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count().toInt
    val cells = (n / 10) + 1 // centroidStep = 10 ⇒ ≤ this many cells
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val refined = key(Embeddings.annIvfPq(emb, col("vec_id") % 5 === 0,
      k = 3, centroidStep = 10L, nprobe = cells, refine = Some(n)))
    val exact = key(Embeddings.l2TopK(emb, col("vec_id") % 5 === 0, k = 3))
    assert(refined === exact)
    assert(refined.nonEmpty)
  }

  test("IVF-PQ refined recall is monotone in nprobe (code-ranked is NOT guaranteed)") {
    // The guaranteed contract is on the REFINED search: nprobe widens
    // the candidate pool (a superset), and under the exact-L2 rerank a
    // vector can only displace a true-top-3 member from the reported 3
    // by being globally closer — i.e. by being a truth member itself —
    // so hits are monotone in the probe dial. The same claim is FALSE
    // for raw code-ranked top-k (a wider pool can push a true hit out
    // through a PQ misranking — observed on this very fixture: 73 hits
    // at nprobe=1 vs 67 at nprobe=4), which is exactly why the
    // refinement stage exists.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.count().toInt
    val truth = Embeddings.l2TopK(emb, col("vec_id") % 5 === 0, k = 3)
    def hits(nprobe: Int) = graft.operators.Eval.topKRecall(
      Embeddings.annIvfPq(emb, col("vec_id") % 5 === 0,
        centroidStep = 10L, nprobe = nprobe, refine = Some(n)), truth)
      .collect().head.getLong(3)
    val h1 = hits(1)
    val h4 = hits(4)
    assert(h4 >= h1)
    assert(h1 > 0L)
  }

  test("pqEncode: seeds are zero-distortion; codes point at the nearest subvector") {
    import spark.implicits._
    // 4-dim vectors, m = 2 subspaces of 2 dims. centroidStep = 10 →
    // seeds are ids 0 and 10, giving per-subspace codebooks
    //   sub 0: {0→(1,0), 10→(0,1)}   sub 1: {0→(0.5,0), 10→(0,0.5)}
    val emb = Seq(
      (0L,  Array(1f, 0f, 0.5f, 0f)),
      (10L, Array(0f, 1f, 0f, 0.5f)),
      // mixed membership: sub 0 nearest seed-0's (1,0), sub 1 nearest
      // seed-10's (0,0.5) — codes may differ per subspace, the whole
      // point of PQ over one global codebook
      (3L,  Array(0.9f, 0.1f, 0.1f, 0.45f)))
      .toDF("vec_id", "embedding")
    val cents = Embeddings.pqCentroids(emb, centroidStep = 10L, m = 2)
    val got = Embeddings.pqEncode(emb, cents, m = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // every (vec, sub) encoded; seeds encode to themselves, distortion 0
    assert(got.keySet === Set((0L, 0L), (0L, 1L), (10L, 0L), (10L, 1L),
      (3L, 0L), (3L, 1L)))
    assert(got((0L, 0L)) === ((0L, 0L)) && got((0L, 1L)) === ((0L, 0L)))
    assert(got((10L, 0L)) === ((10L, 0L)) && got((10L, 1L)) === ((10L, 0L)))
    // the mixed vector splits its codes across the two codebooks
    assert(got((3L, 0L))._1 === 0L)
    assert(got((3L, 1L))._1 === 10L)
    assert(got((3L, 0L))._2 > 0L && got((3L, 1L))._2 > 0L)
  }

  test("pqAdcTopK at step=1 (every vector a centroid) equals exact L2 ranking") {
    import spark.implicits._
    // With centroidStep = 1 every subvector encodes to itself with
    // zero distortion, so the ADC distance IS the exact quantized
    // squared L2 — the approximation-collapses-to-exact invariant.
    val vecs = Seq(
      0L  -> Array(1f, 0f, 0f, 0f),
      1L  -> Array(0.9f, 0.1f, 0f, 0f),
      2L  -> Array(0.5f, 0.5f, 0.2f, 0f),
      3L  -> Array(0f, 1f, 0.4f, 0.1f),
      4L  -> Array(-1f, 0f, 0f, 0.3f))
    val emb = vecs.toDF("vec_id", "embedding")
    val got = Embeddings.pqAdcTopK(emb, col("vec_id") === 0, k = 4,
        centroidStep = 1L, m = 2)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    def q(x: Float): Long = math.round(x.toDouble * Embeddings.Scale)
    val exact = vecs.tail.map { case (id, v) =>
      id -> v.zip(vecs.head._2).map { case (a, b) =>
        val d = q(a) - q(b); d * d }.sum
    }.sortBy { case (id, d) => (d, id) }
    assert(got.toSeq === exact)
  }

  test("annIvfPq = ADC ranking restricted to the query's IVF cell") {
    import spark.implicits._
    // the annIvf geometry: ids 0/10 seed two cells (centroidStep 10);
    // {0,1,2} land in cell 0, {10,11} in cell 10
    val emb = Seq(
      (0L,  Array(1f, 0f, 0f, 0f)),
      (1L,  Array(0.95f, 0.05f, 0f, 0f)),
      (2L,  Array(0.9f, 0.1f, 0.05f, 0f)),
      (10L, Array(0f, 0f, 1f, 0f)),
      (11L, Array(0f, 0.05f, 0.95f, 0f)))
      .toDF("vec_id", "embedding")
    val pred = col("vec_id").isin(1L, 11L)
    val got = Embeddings.annIvfPq(emb, pred, k = 3,
        centroidStep = 10L, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // differential: full ADC ranking (k large enough to keep every
    // candidate), filtered to same-cell pairs, re-ranked per query
    val cells = Embeddings.ivfAssign(emb,
        Embeddings.ivfCentroids(emb, centroidStep = 10L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Embeddings.pqAdcTopK(emb, pred, k = 100,
        centroidStep = 10L, m = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val want = full
      .filter { case (q, nb, _) => cells(q) == cells(nb) }
      .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
        rows.sortBy { case (_, nb, d) => (d, nb) }.take(3).zipWithIndex
          .map { case ((_, nb, d), i) => (q, nb, i + 1L, d) }
      }
    assert(got.toSet === want.toSet)
    // the cell restriction is real: every result pair shares a cell
    assert(got.forall { case (q, nb, _, _) => cells(q) == cells(nb) })
    assert(got.nonEmpty)
  }

  test("ivfAssign: duplicate ids fail loudly by default; opt-out keeps one row per input row") {
    import spark.implicits._
    val emb = Seq(
      (0L,  Array(1f, 0f, 0f, 0f)),
      (10L, Array(0f, 0f, 1f, 0f)),
      (1L,  Array(0.9f, 0.1f, 0f, 0f)),
      (1L,  Array(0f, 0.1f, 0.9f, 0f))) // duplicate id, different cell
      .toDF("vec_id", "embedding")
    // seeds are ids 0 and 10 (id 1 is not a seed at step 10), so the
    // centroid table is independent of the duplicate rows
    val cents = Embeddings.ivfCentroids(
      emb.filter(col("vec_id") =!= 1L), centroidStep = 10L)

    // default: the in-plan guard fails the JOB, naming the bad id
    val ex = intercept[Exception] {
      Embeddings.ivfAssign(emb, cents).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("duplicate id in column 'vec_id': 1")))

    // opt-out (corpus validated upstream): one output row per INPUT
    // row — both rows of id 1 assign, each to its own argmax cell
    val rows = Embeddings.ivfAssign(emb, cents, assertUniqueIds = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === 4)
    assert(rows.count(_._1 == 1L) === 2)
    assert(rows.filter(_._1 == 1L).map(_._2).toSet === Set(0L, 10L))

    // unique-id input passes the guard untouched, bit-identical to the
    // unguarded assignment
    val uniq = emb.filter(col("vec_id") =!= 1L)
    assert(Embeddings.ivfAssign(uniq, cents).collect().map(r =>
        (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Embeddings.ivfAssign(uniq, cents, assertUniqueIds = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("dupNgramStats flags exactly the cross-doc shared span") {
    import spark.implicits._
    // A and B share the 5-token span S1..S5 inside otherwise-unique
    // text; C is unique; D is too short for any 3-gram; E repeats a
    // gram twice WITHIN itself only (must NOT count: duplication is
    // distinct-doc granular).
    val corpus = Seq(
      (1L, "u1 u2 u3 S1 S2 S3 S4 S5 u4 u5"),
      (2L, "v1 v2 S1 S2 S3 S4 S5 v3 v4 v5"),
      (3L, "c1 c2 c3 c4 c5"),
      (4L, "a b"),
      (5L, "r1 r2 r3 x r1 r2 r3")
    ).toDF("doc_id", "text")
    val got = NearDup.dupNgramStats(corpus)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // 10 tokens → 8 positional grams; the span's 3 interior grams
    // (S1S2S3, S2S3S4, S3S4S5) are shared, consecutive → run 3.
    assert(got(1L) === ((8L, 3L, 375L, 3L)))
    assert(got(2L) === ((8L, 3L, 375L, 3L)))
    assert(got(3L) === ((3L, 0L, 0L, 0L)))
    assert(got(4L) === ((0L, 0L, 0L, 0L)))
    assert(got(5L) === ((5L, 0L, 0L, 0L)))
  }

  test("dupNgramStats: multiplicity counts every duplicated position") {
    import spark.implicits._
    // The whole of A appears twice inside B: every A-position is
    // duplicated (fraction 1000), and B's repeated copies each count
    // at their own positions.
    val corpus = Seq(
      (1L, "p q r"),
      (2L, "p q r z p q r")
    ).toDF("doc_id", "text")
    val got = NearDup.dupNgramStats(corpus)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) === ((1L, 1L, 1000L, 1L)))
    // B: 5 grams; "p q r" occurs at positions 1 and 5 → 2 duplicated
    // positions, non-consecutive → max run 1.
    assert(got(2L) === ((5L, 2L, 400L, 1L)))
  }

  test("substringDedup removes covered spans everywhere but the canonical doc") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "u1 u2 u3 S1 S2 S3 S4 S5 u4 u5"),
      (2L, "v1 v2 S1 S2 S3 S4 S5 v3 v4 v5"),
      (3L, "c1 c2 c3 c4 c5"),
      (4L, "a b"),
      (5L, "r1 r2 r3 x r1 r2 r3")
    ).toDF("doc_id", "text")
    val got = NearDup.substringDedup(corpus)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1 is canonical for the shared span → untouched; doc 2 loses
    // positions 3..7 (the union of its three duplicated grams' spans);
    // within-doc-only repetition (doc 5) is not duplication.
    assert(got(1L) === (("u1 u2 u3 S1 S2 S3 S4 S5 u4 u5", 10L, 0L)))
    assert(got(2L) === (("v1 v2 v3 v4 v5", 10L, 5L)))
    assert(got(3L) === (("c1 c2 c3 c4 c5", 5L, 0L)))
    assert(got(4L) === (("a b", 2L, 0L)))
    assert(got(5L) === (("r1 r2 r3 x r1 r2 r3", 7L, 0L)))
  }

  test("substringDedup: full-duplicate doc empties; pass is idempotent") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "p q r"),
      (2L, "p q r z p q r"),
      (3L, "p q r")
    ).toDF("doc_id", "text")
    val once = NearDup.substringDedup(corpus)
    val got = once.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    // canon(p q r) = 1; doc 2 keeps only the uncovered "z"; doc 3
    // empties entirely.
    assert(got(1L) === (("p q r", 0L)))
    assert(got(2L) === (("z", 6L)))
    assert(got(3L) === (("", 3L)))
    // idempotence: the surviving copies are all in canonical docs, so a
    // second pass removes nothing.
    val twice = NearDup.substringDedup(
      once.select(col("doc_id"), col("text")))
    assert(twice.agg(sum(col("n_removed"))).head.getLong(0) === 0L)
  }
}
