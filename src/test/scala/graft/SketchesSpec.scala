package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Count–Min sketch properties: one-sided error (estimate ≥ exact,
  * always — forced via a tiny width), exactness in the collision-free
  * regime, the cellwise merge seam, weighted builds, and heavy-hitter
  * thresholding.
  */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  /** keys with planted frequencies: k1 ×8, k2 ×3, k3..k10 ×1. */
  private def stream: DataFrame = (
    Seq.fill(8)("k1") ++ Seq.fill(3)("k2") ++ (3 to 10).map(i => s"k$i")
  ).toDF("k")

  private def exact: Map[String, Long] =
    stream.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("estimate >= exact for every key, even with forced collisions") {
    // width 4 with 10 distinct keys: collisions guaranteed in every row
    val cms = Sketches.cmsBuild(stream, "k", depth = 2, width = 4L)
    val est = Sketches.cmsEstimate(stream.distinct(), cms, "k", depth = 2, width = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ex = exact
    ex.foreach { case (k, c) =>
      assert(est(k) >= c, s"$k: est ${est(k)} < exact $c")
    }
    // total stream mass bounds any single estimate
    est.values.foreach(e => assert(e <= 19L))
  }

  test("collision-free regime: estimates are exact; unseen keys estimate 0") {
    val cms = Sketches.cmsBuild(stream, "k") // width 1024 >> 10 keys
    val est = Sketches.cmsEstimate(
        (exact.keys.toSeq :+ "never-seen").toDF("k"), cms, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) => assert(est(k) === c) }
    assert(est("never-seen") === 0L)
  }

  test("cmsMerge(cms(A), cms(B)) equals cms(A union B) cell for cell") {
    val a = stream.limit(7)
    val b = stream.exceptAll(a)
    def cells(df: DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = cells(Sketches.cmsMerge(
      Sketches.cmsBuild(a, "k", width = 8L),
      Sketches.cmsBuild(b, "k", width = 8L)))
    val whole = cells(Sketches.cmsBuild(stream, "k", width = 8L))
    assert(merged === whole)
  }

  test("weighted build equals the build over row-expanded input") {
    val weighted = Seq(("k1", 8L), ("k2", 3L), ("k3", 1L)).toDF("k", "tf")
    val expanded = weighted.as[(String, Long)].collect()
      .flatMap { case (k, n) => Seq.fill(n.toInt)(k) }.toSeq.toDF("k")
    def cells(df: DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(
      cells(Sketches.cmsBuild(weighted, "k", weight = col("tf"))) ===
        cells(Sketches.cmsBuild(expanded, "k")))
  }

  test("heavyHitters keeps keys at/above threshold with exact audit counts") {
    val hh = Sketches.heavyHitters(stream, "k", threshold = 3L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // collision-free width: est == exact, so survivors are exactly k1, k2
    assert(hh.keySet === Set("k1", "k2"))
    assert(hh("k1") === ((8L, 8L)))
    assert(hh("k2") === ((3L, 3L)))
    // one-sided error contract on whatever survives
    hh.values.foreach { case (est, ex) => assert(est >= ex) }
  }

  test("kmv: exact below k, ~1/sqrt(k) accurate above, deterministic") {
    // set "small": 50 distinct keys (< k=64) -> sketch is the set, exact
    // set "big": 5000 distinct keys -> estimate within 3 RSE (~40%)
    val items = ((1 to 50).map(i => ("small", s"s$i")) ++
      (1 to 5000).map(i => ("big", s"b$i"))).toDF("grp", "key")
    def run(): Map[String, Long] =
      Sketches.kmvEstimate(Sketches.kmvSketch(items, "grp", "key"), "grp")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = run()
    assert(est("small") === 50L)
    assert(math.abs(est("big") - 5000L) <= 2000L,
      s"kmv estimate ${est("big")} off by > 3 RSE from 5000")
    assert(est === run()) // deterministic hash -> identical sketch
  }

  test("kmvMerge(kmv(A), kmv(B)) equals kmv(A union B) row for row") {
    val a = (1 to 300).map(i => ("g", s"a$i")).toDF("grp", "key")
    val b = (1 to 300).map(i => ("g", s"x$i")).toDF("grp", "key")
    val u = ((1 to 300).map(i => ("g", s"a$i")) ++
      (1 to 300).map(i => ("g", s"x$i"))).toDF("grp", "key")
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(a, "grp", "key"),
      Sketches.kmvSketch(b, "grp", "key"), "grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val direct = Sketches.kmvSketch(u, "grp", "key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(merged === direct)
  }

  test("kmv plan: the per-set sort is WindowGroupLimit-capped") {
    val items = (1 to 500).map(i => (s"g${i % 3}", s"k$i")).toDF("grp", "key")
    val plan = Sketches.kmvSketch(items, "grp", "key")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side top-k pushdown:\n${plan.take(2000)}")
  }
}
