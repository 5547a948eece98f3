package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–Min sketch (Cormode & Muthukrishnan 2005) — fixed-size
  * approximate frequency state for keys too numerous to count exactly:
  * heavy-hitter vocabulary/n-gram discovery, hot-key detection ahead
  * of a salting decision, boilerplate phrase mining. Complements the
  * built-in sketches the battery already carries
  * (`approx_count_distinct` = cardinality, `percentile_approx` =
  * ranks): CMS answers point FREQUENCY queries, with one-sided error
  * (estimate ≥ true count always; overshoot ≤ εN with probability
  * 1 − δ at width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉).
  *
  * Why this beats a word-count at 100 TB: an exact count shuffles
  * per-key partial maps — state ∝ distinct keys per partition, which
  * for 8-gram keys is essentially the partition itself. The CMS build
  * is the same one hash-aggregation but over (row, cell) — partial
  * state is capped at depth·width CELLS per partition no matter the
  * key cardinality, the result table is ≤ depth·width rows (always
  * broadcastable), and sketches of corpus increments MERGE by cellwise
  * addition without rescanning history (the daily-ingest seam, proven
  * by a spec property). The probe side is NARROW: depth broadcast
  * joins + a `least`, no shuffle until the above-threshold survivors
  * (small by the definition of a heavy hitter) are deduped.
  *
  * Determinism (cross-run AND cross-engine): row r's hash is an
  * independent 60-bit slice of ONE sha256 of the key (offsets 1+15r —
  * 4 disjoint slices fit in the 64 hex chars, hence depth ≤ 4), taken
  * mod width; counts are exact int64 sums. The DuckDB oracle replays
  * the identical sketch bit-for-bit — no RNG seeds to ship.
  */
object Sketches {

  /** Default geometry: 4 × 1024 cells ≈ ε = e/1024 ≈ 0.27 % of the
    * stream mass per estimate at δ = e⁻⁴ ≈ 2 %. */
  val CmsDepth: Int = 4
  val CmsWidth: Long = 1024L

  /** Row-r cell of `key`: slice r of the key's sha256, mod width. */
  private def cell(key: Column, r: Int, width: Long): Column =
    pmod(conv(substring(sha2(key, 256), 1 + 15 * r, 15), 16, 10).cast("long"),
      lit(width))

  /** Build the sketch over `items(keyCol)` (one count per row, or
    * `weight` per row — e.g. a pre-aggregated tf): a (r, c, cnt) cell
    * table, ≤ depth·width rows, via one hash-aggregation whose
    * map-side partial state is capped at depth·width cells per
    * partition regardless of key cardinality. */
  def cmsBuild(
      items: DataFrame,
      keyCol: String,
      depth: Int = CmsDepth,
      width: Long = CmsWidth,
      weight: Column = lit(1L)): DataFrame = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1, 4], got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    items
      .select(col(keyCol).as("__k"), weight.cast("long").as("__wt"))
      .select(col("__wt"), explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"), cell(col("__k"), r, width).as("c"))): _*)).as("__rc"))
      .groupBy(col("__rc.r").as("r"), col("__rc.c").as("c"))
      .agg(sum(col("__wt")).as("cnt"))
  }

  /** Cellwise merge of sketches built with the same geometry — the
    * increment seam: cms(A ∪ B) = merge(cms(A), cms(B)) exactly. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("r"), col("c")).agg(sum(col("cnt")).as("cnt"))

  /** Tag each row of `items` with `est` = min over rows of its cell
    * counts (0 for a never-seen key). NARROW on the items side: depth
    * broadcast joins against the ≤ width-row per-row slices, then a
    * `least` projection — no shuffle, no groupBy. */
  def cmsEstimate(
      items: DataFrame,
      cms: DataFrame,
      keyCol: String,
      depth: Int = CmsDepth,
      width: Long = CmsWidth): DataFrame = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1, 4], got $depth")
    val joined = (0 until depth).foldLeft(items) { (df, r) =>
      val slice = cms.filter(col("r") === r)
        .select(col("c").as(s"__c$r"), col("cnt").as(s"__cnt$r"))
      df.withColumn(s"__c$r", cell(col(keyCol), r, width))
        .join(broadcast(slice), Seq(s"__c$r"), "left")
    }
    val est = (0 until depth)
      .map(r => coalesce(col(s"__cnt$r"), lit(0L)))
      .reduce(least(_, _))
    (0 until depth).foldLeft(joined.withColumn("est", est)) {
      (df, r) => df.drop(s"__c$r", s"__cnt$r")
    }
  }

  /** Keys whose CMS estimate reaches `threshold`, with the exact count
    * alongside as the one-sided-error audit (est ≥ exact, always).
    * The probe never shuffles below the threshold filter; the exact
    * count joins only against the (small) survivor set — at production
    * scale swap the audit join out and ship `est` alone. Output:
    * (keyCol, est_count, exact_count). */
  def heavyHitters(
      items: DataFrame,
      keyCol: String,
      threshold: Long,
      depth: Int = CmsDepth,
      width: Long = CmsWidth): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    // Materialized-once seam (the minHashPairs structure): `items` is
    // typically a narrow tokenize/explode pipeline and feeds THREE
    // consumers here — the sketch build, the estimate probe, and the
    // exact audit join — each re-running the generate without an
    // exchange of its own. All three prune to the same single keyCol
    // column, so one pinned repartition is the shared canonical
    // exchange (AQE stage reuse); the pin spreads the two sha256-dense
    // consumers (build + probe hash every occurrence), which AQE's
    // byte-based coalescing otherwise serializes onto few tasks — see
    // NearDup.seamRepartition.
    val keyed = NearDup.seamRepartition(items.select(col(keyCol)), keyCol)
    val cms = cmsBuild(keyed, keyCol, depth, width)
    val survivors = cmsEstimate(keyed, cms, keyCol, depth, width)
      .filter(col("est") >= threshold)
      .select(col(keyCol), col("est")).distinct()
    val exact = keyed.join(survivors.select(col(keyCol)), Seq(keyCol))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("exact_count"))
    survivors.join(exact, Seq(keyCol))
      .select(col(keyCol), col("est").as("est_count"), col("exact_count"))
  }

  // ------------------------------------------------------------- KMV sketch

  /** KMV size: the k smallest distinct hashes kept per set. Relative
    * standard error ≈ 1/√(k−2) ≈ 13 %. */
  val KmvK: Int = 64

  /** 60-bit key hash — the sha256-hex-slice idiom shared with [[cell]],
    * reproducible in any engine with sha256. Uniform on [0, 2⁶⁰). */
  private def hash60(key: Column): Column =
    conv(substring(sha2(key.cast("string"), 256), 1, 15), 16, 10).cast("long")

  /** k-minimum-values distinct-count sketch (Bar-Yossef et al.): per
    * set, the k smallest DISTINCT key hashes. Fixed-size, mergeable
    * (union sketches = re-rank the union of members, see
    * [[kmvMerge]]), and — because the hash is deterministic — every
    * engine builds the byte-identical sketch, so estimates are
    * oracle-exact, not merely bounded.
    *
    * Scale shape: one distinct hash-agg on (set, h), then
    * `row_number ≤ k` which the optimizer executes as
    * WindowGroupLimit — each map partition forwards at most k rows
    * per set to the sort, never the full distinct stream. Output:
    * (setCol, h, rk), ≤ k rows per set. */
  def kmvSketch(
      items: DataFrame,
      setCol: String,
      keyCol: String,
      k: Int = KmvK): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(setCol)).orderBy(col("h"))
    items.select(col(setCol), hash60(col(keyCol)).as("h")).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Merge two KMV sketches of the SAME k: union members, re-rank,
    * keep the k smallest — the distributive property that lets
    * per-day / per-partition sketches roll up without revisiting raw
    * data. */
  def kmvMerge(a: DataFrame, b: DataFrame, setCol: String,
      k: Int = KmvK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(setCol)).orderBy(col("h"))
    a.select(col(setCol), col("h"))
      .unionByName(b.select(col(setCol), col("h"))).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Distinct-count estimate from a KMV sketch: when the set holds
    * fewer than k distinct keys the sketch IS the distinct hash set
    * (count is exact); otherwise est = ⌊(k−1)·2⁶⁰ / h_k⌋ with the
    * numerator in DECIMAL(38,0) — (k−1)·2⁶⁰ overflows int64 for
    * k > 8, the [[graft.operators.Curation]] chi² lesson. Exact
    * integer floor both engines reproduce bit-for-bit. */
  def kmvEstimate(sk: DataFrame, setCol: String, k: Int = KmvK): DataFrame =
    sk.groupBy(col(setCol))
      .agg(count(lit(1)).as("__n"), max(col("h")).as("__hk"))
      .select(col(setCol),
        when(col("__n") < k, col("__n"))
          .otherwise(expr(
            s"cast(cast(${k - 1} as decimal(38,0)) * ${1L << 60} div __hk as bigint)"))
          .as("kmv_distinct"))
}
