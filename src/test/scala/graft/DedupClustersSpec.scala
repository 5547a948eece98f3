package graft

import graft.operators.DedupClusters

/** Semantics tests for connected-component cluster resolution
  * ([[graft.operators.DedupClusters]]): hand-checkable graphs pin the
  * star-contraction output; a seeded randomized differential test
  * checks every component assignment against a driver-side union-find
  * ground truth (the fixture-scale battery covers oracle parity).
  */
class DedupClustersSpec extends SparkSpecBase {

  import spark.implicits._

  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    DedupClusters
      .components(pairs.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("a chain resolves to one component rooted at the minimum") {
    // worst case for label propagation (diameter = n), routine for
    // star contraction
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = comps(chain)
    assert(got === (0L to 9L).map(_ -> 0L).toMap)
  }

  test("disjoint components keep separate minima; duplicates and reversed edges collapse") {
    val got = comps(Seq((5L, 3L), (3L, 5L), (5L, 3L), (10L, 11L), (12L, 11L)))
    assert(got === Map(3L -> 3L, 5L -> 3L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("self-loops and empty input are tolerated") {
    assert(comps(Seq((7L, 7L))) === Map.empty)
    assert(comps(Seq.empty) === Map.empty)
  }

  test("resolve emits cluster size and exactly one canonical doc per cluster") {
    val res = DedupClusters
      .resolve(Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("doc_a", "doc_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(res === Array(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (8L, 8L, 2L, true), (9L, 8L, 2L, false)))
  }

  test("randomized graphs match a union-find ground truth (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
      assert(comps(edges) === want)
    }
  }
}
