package graft

import graft.operators.Eval

/** Semantics tests for [[graft.operators.Eval.pairRecall]]: pair
  * normalization (orientation + duplicates), the four counts, rounded
  * permilles, and the vacuous-denominator convention. The fixture-scale
  * battery (emb_neardup_recall) covers oracle parity. */
class EvalSpec extends SparkSpecBase {

  import spark.implicits._

  private def report(found: Seq[(Long, Long)], truth: Seq[(Long, Long)]) =
    Eval.pairRecall(
      found.toDF("vec_a", "vec_b"), truth.toDF("vec_a", "vec_b"))
      .collect().head

  test("orientation and duplicates normalize before counting") {
    // found (2,1) and (1,2) are ONE pair; truth (1,2) hits it
    val r = report(Seq((2L, 1L), (1L, 2L), (3L, 4L)), Seq((1L, 2L), (5L, 6L)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 2L, 1L, 1L)))
    assert(r.getLong(4) === 500L) // recall 1/2
    assert(r.getLong(5) === 500L) // precision 1/2
  }

  test("empty denominators report vacuous 1000, not failure") {
    val none = Seq.empty[(Long, Long)]
    val r1 = report(none, Seq((1L, 2L)))
    assert(r1.getLong(4) === 0L)    // recall 0/1
    assert(r1.getLong(5) === 1000L) // precision over empty found
    assert(r1.getBoolean(6), "empty found side must flag vacuous")
    val r2 = report(Seq((1L, 2L)), none)
    assert(r2.getLong(4) === 1000L) // recall over empty truth
    assert(r2.getLong(5) === 0L)    // precision 0/1
    assert(r2.getBoolean(6), "empty truth side must flag vacuous")
  }

  test("perfect agreement is 1000/1000 with zero extras") {
    val r = report(Seq((1L, 2L), (3L, 4L)), Seq((4L, 3L), (2L, 1L)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 2L, 2L, 0L)))
    assert((r.getLong(4), r.getLong(5)) === ((1000L, 1000L)))
    assert(!r.getBoolean(6), "non-empty sides: a TRUE 1000/1000 is not vacuous")
  }

  // ---- topKRecall: (query, neighbor) hits, per-list duplicates
  // tolerated, micro recall over the truth rows

  private def topk(found: Seq[(Long, Long)], truth: Seq[(Long, Long)]) =
    Eval.topKRecall(
      found.toDF("query_id", "neighbor_id"),
      truth.toDF("query_id", "neighbor_id"))
      .collect().head

  test("topKRecall counts exact (query, neighbor) matches micro-averaged") {
    // q1 truth {2,3}, found {2,9} → 1 hit; q2 truth {5}, found {5} → 1
    val r = topk(
      found = Seq((1L, 2L), (1L, 9L), (2L, 5L)),
      truth = Seq((1L, 2L), (1L, 3L), (2L, 5L)))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 3L, 3L, 2L)))
    assert(r.getLong(4) === 667L) // round(2000/3)
  }

  test("topKRecall: a neighbor hit under the WRONG query is not a hit") {
    val r = topk(found = Seq((1L, 5L)), truth = Seq((2L, 5L)))
    assert((r.getLong(1), r.getLong(3), r.getLong(4)) === ((1L, 0L, 0L)))
  }

  test("confusion: one cell per (label, pred) with inner-join scoping") {
    val truth = Seq((1L, "en"), (2L, "en"), (3L, "fr"), (9L, "de"))
      .toDF("doc_id", "label")
    // doc 9 unpredicted, doc 7 unlabeled — both drop; 2 is misclassified
    val pred = Seq((1L, "en"), (2L, "fr"), (3L, "fr"), (7L, "en"))
      .toDF("doc_id", "pred")
    val cells = Eval.confusion(pred, truth)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cells === Map(
      ("en", "en") -> 1L, ("en", "fr") -> 1L, ("fr", "fr") -> 1L))
  }

  test("topKRecall duplicates collapse; empty truth is vacuous 1000") {
    val r = topk(
      found = Seq((1L, 2L), (1L, 2L)), truth = Seq((1L, 2L), (2L, 1L), (2L, 1L)))
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 1L, 1L)))
    assert(r.getLong(4) === 500L)
    assert(!r.getBoolean(5))
    val r2 = topk(Seq((1L, 2L)), Seq.empty)
    assert(r2.getLong(4) === 1000L)
    assert(r2.getBoolean(5), "empty truth must flag vacuous")
  }
}
