package graft

import graft.operators.Bpe

/** Model-based tests for BPE vocabulary induction: the distributed
  * trainer must equal a direct in-memory implementation of greedy BPE
  * (overlap-counted pair statistics, greedy left-to-right merge
  * application, (count DESC, lhs, rhs) tie-break) on crafted and
  * seeded-random dictionaries.
  */
class BpeSpec extends SparkSpecBase {

  /** Reference implementation over an in-memory dict. */
  private def modelTrain(
      dict: Seq[(String, Long)], k: Int): Seq[(Long, String, String, Long)] = {
    var seqs = dict.map { case (w, n) => (w.map(_.toString).toList, n) }
    (1 to k).map { round =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((s, n) <- seqs; Seq(a, b) <- s.sliding(2) if s.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + n
      val ((l, r), c) = counts.toSeq.sortBy { case ((pl, pr), pc) => (-pc, pl, pr) }.head
      seqs = seqs.map { case (s, n) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += (l + r); i += 2 }
          else { out += s(i); i += 1 }
        }
        (out.toList, n)
      }
      (round.toLong, l, r, c)
    }
  }

  private def run(dict: Seq[(String, Long)], k: Int): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    Bpe.trainMerges(dict.toDF("word", "n"), k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
  }

  test("greedy overlap semantics: 'aaa' merges to [aa, a], then [aa,a] pairs") {
    // round 1: (a,a) counted at BOTH positions of "aaa" (overlap) → c = 10+3 = 13
    val dict = Seq(("aaa", 5L), ("ab", 3L), ("ba", 2L))
    // "aaa"→ a a a: pairs (a,a)x2*5=10; "ab": (a,b)x3; "ba": (b,a)x2 → best (a,a)
    val got = run(dict, 2)
    assert(got.head === ((1L, "a", "a", 10L)))
    // after greedy merge "aaa" → [aa, a]: round-2 pairs are (aa,a)x5, (a,b)x3, (b,a)x2
    assert(got(1) === ((2L, "aa", "a", 5L)))
    assert(got === modelTrain(dict, 2))
  }

  test("adjacent disjoint merge sites both fire: 'aaaa' → [aa, aa]") {
    // the single-space-delimiter encoding failed exactly here: the
    // first " a a " match consumed the shared middle space and the
    // second site couldn't fire ([aa, a, a] instead of [aa, aa])
    val dict = Seq(("aaaa", 5L))
    val got = run(dict, 2)
    assert(got.head === ((1L, "a", "a", 15L))) // 3 overlap-counted positions × 5
    assert(got(1) === ((2L, "aa", "aa", 5L)))  // greedy left-to-right result
    assert(got === modelTrain(dict, 2))
  }

  test("vocabulary exhaustion stops training cleanly short of k") {
    val got = run(Seq(("ab", 3L)), 5) // one possible merge, then dry
    assert(got === Seq((1L, "a", "b", 3L)))
    assert(run(Seq(("a", 2L)), 3) === Seq()) // nothing mergeable at all
  }

  test("argmax ties break by (lhs, rhs) binary order") {
    // (a,b) and (b,a) both have count 4 → (a,b) wins lexicographically
    val dict = Seq(("ab", 4L), ("ba", 4L), ("c", 9L))
    val got = run(dict, 1)
    assert(got === Seq((1L, "a", "b", 4L)))
    assert(got === modelTrain(dict, 1))
  }

  test("distributed trainer equals the model on seeded random dicts, k=6") {
    // a 2-letter alphabet with words up to 8 chars maximizes runs and
    // adjacent disjoint merge sites — the hard cases for merge
    // application semantics
    for (seed <- Seq(4242, 7, 99)) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "ab"
      val dict = (0 until 24).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          1L + rnd.nextInt(9))
      }.distinct.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      assert(run(dict, 6) === modelTrain(dict, 6), s"seed $seed diverged")
    }
  }

  test("32 merge rounds complete with per-round truncation and match the model") {
    // a 40-symbol word sustains 39 merges, so all 32 requested rounds
    // fire — the plan stays O(1) deep because trainMerges truncates
    // lineage every round (the 32k-vocab plausibility case; an
    // untruncated loop would stack 32 agg+crossJoin layers)
    val dict = Seq(
      ("abcdefghijklmnopqrstuvwxyz0123456789abcd", 2L),
      ("ab", 5L), ("cdcd", 3L))
    assert(run(dict, 32) === modelTrain(dict, 32))
  }

  test("encode applies merges in rank order per word and rolls up per doc") {
    import spark.implicits._
    // merges: (a,b)→ab then (ab,c)→abc. "abc" → 1 piece; "cab" → c + ab
    // = 2; "ba" stays 2 (b then a — rank order matters, (a,b) applies
    // to ADJACENT a,b only).
    val docs = Seq((1L, "abc cab"), (2L, "ba")).toDF("doc_id", "text")
    val got = Bpe.encode(docs, Seq(("a", "b"), ("ab", "c")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 6L, 3L))) // 2 words, 6 chars, abc→1 + cab→2 pieces
    assert(got(2L) === ((1L, 2L, 2L))) // ba: no adjacent (a,b) → 2 pieces
  }

  test("batched rounds == sequential rounds == model (the safe-batch contract)") {
    import spark.implicits._
    def runB(dict: Seq[(String, Long)], k: Int, b: Int, inc: Boolean = true) =
      Bpe.trainMerges(dict.toDF("word", "n"), k, maxBatch = b, incremental = inc)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    // a wider alphabet gives the ranking DISJOINT high-count pairs, so
    // batches actually form (the 2-letter corpora above mostly cut at
    // size 1-2); crafted rows then trip each safeBatch condition:
    // "xyxy" makes (x,y) overlap-heavy (condition 1 cuts), "pq"+"pqr"
    // plants the concat collision (p,q)→"pq" vs existing symbol "pq"
    // feeding (pq,r) (condition 2), and the 4-count ties straddle a
    // cut (condition 3).
    val crafted = Seq(
      ("xyxy", 9L), ("pq", 7L), ("pqr", 6L), ("de", 4L), ("fg", 4L),
      ("hi", 4L), ("jk", 3L), ("xp", 2L))
    for (k <- Seq(3, 8, 12)) {
      val seqr = runB(crafted, k, 1)
      // the crafted dict may exhaust short of k — compare the rounds
      // that actually fired (modelTrain throws on an empty round)
      assert(seqr.nonEmpty && seqr === modelTrain(crafted, seqr.size),
        s"sequential != model at k=$k")
      for (b <- Seq(4, 16))
        assert(runB(crafted, k, b) === seqr, s"batched(b=$b) != sequential at k=$k")
    }
    for (seed <- Seq(11, 1234)) {
      val rnd = new scala.util.Random(seed)
      val dict = (0 until 40).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (Seq.fill(len)("abcdef" (rnd.nextInt(6))).mkString, 1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      val seqr = runB(dict, 10, 1)
      // BOTH engine paths on the random dicts: full recount (the
      // production default) and incremental count maintenance
      assert(runB(dict, 10, 16, inc = false) === seqr,
        s"seed $seed full-recount batched diverged")
      assert(runB(dict, 10, 16) === seqr, s"seed $seed incremental diverged")
    }
    // the self-pair counterexample (safeBatch condition 4): merging
    // (b,b) over "bbbb" MINTS (bb,bb) with the self-pair's own count 9,
    // which sequential greedy picks at rank 2 ahead of (c,a) count 7 —
    // a batch that extended past the self-pair recorded (c,a) instead
    val selfPair = Seq(("bbbb", 9L), ("caa", 4L), ("cacba", 3L))
    val sp1 = runB(selfPair, 4, 1)
    assert(sp1.take(2).map(t => (t._2, t._3, t._4)) ===
      Seq(("b", "b", 27L), ("bb", "bb", 9L)))
    for (b <- Seq(2, 4, 16))
      assert(runB(selfPair, 4, b) === sp1, s"self-pair batched(b=$b) diverged")
    // incremental count maintenance == full per-round recount, on the
    // corpus crafted to trip every batching condition (affected-word
    // filter + delta merge must track the same counts the full recount
    // sees, including near-exhaustion where zero-count rows must drop)
    for ((d, k) <- Seq((crafted, 12), (selfPair, 4), (Seq(("ab", 3L)), 5)))
      assert(runB(d, k, 16, inc = false) === runB(d, k, 16),
        s"incremental diverged on $d")
  }

  /** In-memory mirror of [[Bpe.trainMerges]]'s batched driver loop —
    * same top-(maxBatch+1) collection, same [[Bpe.safeBatch]], same
    * greedy left-to-right application — so the batched==sequential
    * contract can be differential-searched over thousands of random
    * dicts without scheduling a Spark job per trial. */
  private def modelTrainBatched(
      dict: Seq[(String, Long)], k: Int, maxBatch: Int): Seq[(Long, String, String, Long)] = {
    var seqs = dict.map { case (w, n) => (w.map(_.toString).toList, n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1
    var dry = false
    while (rank <= k && !dry) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((s, n) <- seqs if s.length >= 2; Seq(a, b) <- s.sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + n
      val top = counts.toSeq.sortBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        .take(math.min(maxBatch, k - rank + 1) + 1)
        .map { case ((l, r), c) => (l, r, c) }
      dry = top.isEmpty
      if (!dry) {
        val batch = Bpe.safeBatch(top, math.min(maxBatch, k - rank + 1))
        batch.foreach { case (l, r, c) => merges += ((rank.toLong, l, r, c)); rank += 1 }
        seqs = seqs.map { case (s, n) =>
          (batch.foldLeft(s) { case (cur, (l, r, _)) =>
            val out = scala.collection.mutable.ListBuffer[String]()
            var i = 0
            while (i < cur.length) {
              if (i + 1 < cur.length && cur(i) == l && cur(i + 1) == r) { out += (l + r); i += 2 }
              else { out += cur(i); i += 1 }
            }
            out.toList
          }, n)
        }
      }
    }
    merges.toSeq
  }

  test("differential search: batched == sequential over 4000 random dicts") {
    // brute-force re-validation of every safeBatch condition: mixed-
    // character words (each position drawn independently) over small
    // alphabets maximize self-pairs, concat collisions, and count ties;
    // this family finds the pre-fix condition-4 divergence within a few
    // hundred trials. Pure in-memory, so thousands of trials are cheap.
    val rnd = new scala.util.Random(20260816L)
    var trials = 0
    while (trials < 4000) {
      val alphabet = "abc" + ("defg".take(rnd.nextInt(4)))
      val dict = (0 until (2 + rnd.nextInt(8))).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq.sorted
      val k = 1 + rnd.nextInt(10)
      val b = 2 + rnd.nextInt(15)
      val seqr = modelTrainBatched(dict, k, 1)
      assert(seqr === modelTrain(dict, seqr.size), s"trial $trials: sequential != model ($dict k=$k)")
      assert(modelTrainBatched(dict, k, b) === seqr, s"trial $trials: batched(b=$b) diverged ($dict k=$k)")
      trials += 1
    }
  }

  test("wordDict lowercases, splits on whitespace and drops empties") {
    import spark.implicits._
    val docs = Seq((1L, "The  the\tcat"), (2L, " the ")).toDF("doc_id", "text")
    val got = Bpe.wordDict(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("the" -> 3L, "cat" -> 1L))
  }
}
