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
    def runB(dict: Seq[(String, Long)], k: Int, b: Int) =
      Bpe.trainMerges(dict.toDF("word", "n"), k, maxBatch = b)
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
      assert(runB(dict, 10, 16) === seqr, s"seed $seed batched diverged")
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
