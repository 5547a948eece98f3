package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed event-sequence operators over the events stream — the batch
  * analogue of the streaming keyed-state family
  * ([[graft.streaming.Streams]]): gap-based sessionization and top-k
  * per key.
  *
  * Scale shapes: both operators shuffle ONCE on the partition key
  * (user), then work per-partition — a sort within each hash partition,
  * never a global sort. Timestamps compare in exact integer
  * microseconds (`unix_micros`), so the DuckDB oracle (`epoch_us`)
  * matches bit-for-bit.
  */
object Sessions {

  /** Default session gap: 12 h in microseconds. */
  val DefaultGapMicros: Long = 12L * 3600 * 1000000

  /** Assigns a per-user `session_seq` (1-based) to every event: a new
    * session starts at the first event and wherever the gap since the
    * previous event exceeds `gapMicros`. Ordering ties on `tsCol` are
    * broken by `tieCol`, making the assignment fully deterministic.
    *
    * Shape: one hash shuffle on `userCol`, one per-partition sort, two
    * stacked window functions over the SAME window spec (lag + running
    * sum → a single Window exec, no second sort). Running state per
    * user is a single counter — the batch twin of
    * `flatMapGroupsWithState` sessionization.
    */
  def sessionize(
      events: DataFrame,
      gapMicros: Long = DefaultGapMicros,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val us = unix_micros(col(tsCol))
    val prev = lag(us, 1).over(w)
    val newSession = when(prev.isNull || (us - prev) > gapMicros, 1L).otherwise(0L)
    events.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: `(userCol, session_seq, n_events, t_start,
    * t_end, extraAggs...)` — [[sessionize]] followed by one hash-agg.
    */
  def sessionStats(
      events: DataFrame,
      gapMicros: Long = DefaultGapMicros,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      extraAggs: Seq[Column] = Nil): DataFrame =
    sessionize(events, gapMicros, userCol, tsCol, tieCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start") +: max(col(tsCol)).as("t_end") +: extraAggs: _*)

  /** Top-`k` rows per key by `orderCols` (include a unique tiebreaker
    * for determinism), with the 1-based rank in `rankCol`.
    *
    * Shape: `row_number` + a rank filter — the pattern Spark's
    * WindowGroupLimit rule rewrites into a per-partition top-k
    * (inserted BEFORE the shuffle as a partial limit, like a partial
    * agg), so each map task forwards at most k rows per key instead of
    * sorting whole groups. Asserted in PlanShapeSpec.
    */
  def topKPerKey(
      df: DataFrame,
      k: Int,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      rankCol: String = "rk"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn(rankCol, row_number().over(w).cast("long"))
      .filter(col(rankCol) <= k)
  }

  /** Floor division in exact long arithmetic (`pmod` is non-negative,
    * so the quotient rounds toward −∞ for any sign). The final double
    * divide is exact: the numerator is an integral multiple of `d`
    * below 2^53 (comfortably true for microsecond timestamps until
    * year ~2255). */
  private def floorDivL(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast("long")

  /** Interval-containment join: every `points` row paired with every
    * `intervals` row whose `[startCol, endCol]` contains its `tsCol`
    * (bounds inclusive), plus optional exact-match `keys`.
    *
    * Spark-first shape: the naive predicate has no equality conjunct
    * (when `keys` is empty), so Catalyst can only plan a broadcast
    * nested loop — per-point × per-interval work. This operator makes
    * its own equijoin key: each interval explodes to the `binMicros`-
    * wide time bins it overlaps, each point maps to its single bin,
    * and the join is an equijoin on (keys…, bin) with the containment
    * test as a residual filter. A point meets an interval in exactly
    * one bin (the point's own), so no post-join dedup is needed.
    *
    * Scale dials: exploded interval rows = Σ(span/bin + 1) — size
    * `binMicros` near the typical interval span so each interval
    * explodes to O(1) bins; per-bin candidates = intervals CONCURRENT
    * in that bin (peak overlap, not interval count) — a genuinely hot
    * bin (thousands of simultaneous intervals) is a skew key like any
    * other: salt it or split the bin. Both sides shuffle once on the
    * bin key; no nested loop anywhere (PlanShapeSpec-asserted).
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      binMicros: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binMicros >= 1, s"binMicros must be >= 1, got $binMicros")
    val bin = graft.core.Cols.fresh("__bin",
      points.columns.toSeq ++ intervals.columns)
    val iv = intervals.withColumn(bin,
      explode(sequence(
        floorDivL(unix_micros(col(startCol)), binMicros),
        floorDivL(unix_micros(col(endCol)), binMicros))))
    val pt = points.withColumn(bin, floorDivL(unix_micros(col(tsCol)), binMicros))
    pt.join(iv, keys :+ bin)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop(bin)
  }

  /** Trailing-window rolling aggregates per key: every row gets each
    * `aggs` aggregate evaluated over the key's rows with timestamp in
    * `[row.ts − horizonMicros, row.ts]` — both bounds inclusive, in
    * exact integer microseconds. A RANGE frame, so all peers at an
    * equal timestamp share one frame and the result is deterministic
    * under ts ties (no tiebreaker needed, unlike row frames).
    *
    * Shape: one hash shuffle on `keys`, one per-partition sort, and a
    * SINGLE WindowExec evaluating every aggregate (all share the same
    * frame spec). Spark's sliding frame advances two pointers
    * monotonically per partition — each row enters and leaves the
    * frame once, so cost is linear in rows, never rows × frame size;
    * state is the current frame buffer, bounded by horizon × per-key
    * event rate (the batch twin of a watermarked sliding window).
    */
  def rollingAggs(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      horizonMicros: Long,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(horizonMicros >= 0, s"horizon must be >= 0, got $horizonMicros")
    require(aggs.nonEmpty, "rollingAggs needs at least one aggregate")
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-horizonMicros, 0)
    // one select, not a withColumn fold: chained withColumns hide the
    // shared spec behind per-step projections and Catalyst plans one
    // WindowExec (and one sort) PER aggregate; a single projection
    // collapses them into one (PlanShapeSpec-asserted)
    df.select(df.columns.toIndexedSeq.map(col) ++
      aggs.map { case (name, a) => a.over(w).as(name) }: _*)
  }

  /** As-of join: for every left row, the LATEST right row with
    * `right.ts <= left.ts` on the same keys (inclusive, the ASOF JOIN
    * `>=` convention), as a left join — unmatched rows keep null
    * payloads. `toleranceMicros` additionally voids matches older than
    * the given horizon (pandas merge_asof's tolerance).
    *
    * Spark-first shape: NOT a range join (the naive
    * `l.ts >= r.ts` theta-join explodes to |matches per key|² and then
    * re-aggregates). Instead: union both sides, ONE shuffle on the
    * keys, ONE per-partition sort on (ts, side), and a running
    * `last(payload, ignoreNulls)` window — linear state, the same
    * merge-sorted-streams plan a native ASOF JOIN executes, built from
    * stock operators. Payload rides in a single struct so every output
    * column comes from the SAME right row, never column-wise mixed.
    *
    * Determinism precondition: `right` unique per (keys, ts) — ties
    * among identical timestamps have no defined "latest". Pre-aggregate
    * the right side (e.g. `max_by` per (key, ts)) to discharge it.
    *
    * @param payload right columns to pull; emitted under the same names
    * @param forward flip the direction: match the EARLIEST right row
    *   at-or-after each left ts (the "next response event" join —
    *   purchase → next support ticket, impression → next click)
    *   instead of the latest at-or-before. Same single union + one
    *   window pass: the scan just runs in reverse time order, and the
    *   tolerance horizon bounds `rts − ts` instead of `ts − rts`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String],
      toleranceMicros: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    val taken = left.columns.toSeq ++ right.columns ++ keys
    val side = graft.core.Cols.fresh("__side", taken)
    val pack = graft.core.Cols.fresh("__pack", taken)
    val rTs = graft.core.Cols.fresh("__rts", taken)
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(!payload.exists(left.columns.contains),
      s"payload ${payload.filter(left.columns.contains)} collides with left columns")

    // right rows carry (payload..., rts) packed in one struct; left rows
    // carry a typed null of the same struct
    val packed = struct(payload.map(col) :+ unix_micros(col(tsCol)).as(rTs): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as(side), packed.as(pack)): _*)
    val structType = r.schema(pack).dataType
    val l = left.select(
      left.columns.toIndexedSeq.map(col) ++
        Seq(lit(1).as(side), lit(null).cast(structType).as(pack)): _*)
    // align by name: right lacks left's non-key columns
    val rAligned = r.select(l.columns.toIndexedSeq.map(c =>
      if (r.columns.contains(c)) col(c) else lit(null).cast(l.schema(c).dataType).as(c)): _*)

    val w = Window
      .partitionBy(keys.map(col): _*)
      // right (side 0) sorts before left at equal ts → inclusive match;
      // forward mode scans in reverse time so "last right seen" =
      // earliest right at-or-after
      .orderBy(if (forward) col(tsCol).desc else col(tsCol).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(rAligned)
      .withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
      .where(col(side) === 1)
      // SQL equality never matches NULL keys, but Window.partitionBy
      // groups all NULL-key rows into ONE partition — void the match
      // so a null-key left row keeps the unmatched (null-payload)
      // contract instead of silently attributing to null-key rights
      .withColumn(pack,
        when(keys.map(col(_).isNotNull).reduce(_ && _), col(pack)))
    val inHorizon = toleranceMicros match {
      case None => matched
      case Some(tol) =>
        val gap =
          if (forward) col(s"$pack.$rTs") - unix_micros(col(tsCol))
          else unix_micros(col(tsCol)) - col(s"$pack.$rTs")
        matched.withColumn(pack, when(gap <= tol, col(pack)))
    }
    inHorizon.select(
      left.columns.toIndexedSeq.map(col) ++ payload.map(p => col(s"$pack.$p").as(p)): _*)
  }

  /** Time-series resampling to a fixed slot grid with gap-fill and
    * last-observation-carried-forward — the "regularize an irregular
    * event stream" op every monitoring / feature pipeline needs before
    * windowed models. Per key: slot index = unix_micros div
    * `slotMicros`; empty slots between the key's first and last active
    * slot are materialized (`is_gap = true`, `n_events = 0`) and the
    * summed value is forward-filled from the last non-empty slot.
    *
    * Output: (key, slot, n_events, value_locf, is_gap).
    *
    * Scale shape: one hash-agg on (key, slot) with map-side partials,
    * a per-key min/max agg, then a narrow per-key `sequence` explode
    * for the grid (size = key's active span ÷ slot — a dial the caller
    * controls; NOT corpus-sized) and ONE window pass per key for the
    * forward fill. No global sort, no stats cross-join; everything
    * partitions by the key. The LOCF window is the same
    * merge-sorted-streams trick as [[asofJoin]] — `last(ignoreNulls)`
    * over slot order.
    */
  def resampleLocf(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueExpr: Column,
      slotMicros: Long): DataFrame = {
    require(slotMicros > 0, s"slotMicros must be positive, got $slotMicros")
    val agg = events
      .select(col(keyCol).as("key"),
        expr(s"unix_micros($tsCol) div $slotMicros").as("slot"),
        valueExpr.as("__v"))
      .groupBy(col("key"), col("slot"))
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__sv"))
    val grid = agg.groupBy(col("key"))
      .agg(min(col("slot")).as("__s0"), max(col("slot")).as("__s1"))
      .select(col("key"), explode(sequence(col("__s0"), col("__s1"))).as("slot"))
    val w = Window.partitionBy(col("key")).orderBy(col("slot"))
    grid.join(agg, Seq("key", "slot"), "left")
      .select(col("key"), col("slot"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        last(col("__sv"), ignoreNulls = true).over(w).as("value_locf"),
        col("__n").isNull.as("is_gap"))
  }

  /** Per-key exact-moment outlier detection: flags rows whose squared
    * z-score exceeds `(threshMilli/1000)²`, computed WITHOUT a float
    * mean/stddev pass — the test is the cross-multiplied integer
    * identity z² = (n·x − S)² / (n·Q − S²) with S = Σx, Q = Σx² over
    * the key (all exact int64 sums; the final compare runs in double
    * on those exact integers, so both engines see identical operands
    * and agree bit-for-bit).
    *
    * Output: input id/value columns + z2_x1e6 (squared z, fixed-point)
    * for every flagged row.
    *
    * Scale shape: ONE window pass per key computes (n, S, Q) with the
    * three aggregates in a single WindowExec (same spec), then a
    * narrow filter — no self-join, no collect, no second scan. A
    * degenerate key (constant values, n·Q = S²) emits nothing rather
    * than dividing by zero.
    */
  /** Default |z| outlier cutoff (×1000): 1.5σ. */
  val DefaultZThreshMilli: Long = 1500L

  def zscoreOutliers(
      events: DataFrame,
      keyCol: String,
      valueCol: String,
      idCols: Seq[String],
      threshMilli: Long = DefaultZThreshMilli): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val x = col(valueCol).cast("double")
    val flagged = events
      .select((idCols :+ keyCol).map(col) :+ col(valueCol): _*)
      .withColumn("__n", count(lit(1)).over(w).cast("double"))
      .withColumn("__s", sum(col(valueCol)).over(w).cast("double"))
      .withColumn("__q", sum(col(valueCol) * col(valueCol)).over(w).cast("double"))
      .withColumn("__num", (col("__n") * x - col("__s")) * (col("__n") * x - col("__s")))
      .withColumn("__den", col("__n") * col("__q") - col("__s") * col("__s"))
      .where(col("__den") > 0 &&
        col("__num") * lit(1000000.0) > col("__den") * lit(threshMilli * threshMilli))
    flagged.select(
      (idCols :+ keyCol).map(col) :+ col(valueCol) :+
        round(col("__num") * 1e6 / col("__den")).cast("long").as("z2_x1e6"): _*)
  }

  /** Per-key winsorization — clamp each value into its key's exact
    * nearest-rank [loPct, hiPct] percentile band, the standard
    * outlier-TAMING step (where [[zscoreOutliers]] only flags):
    * reward normalization, sensor despiking, heavy-tail capping
    * before aggregation. Percentiles are pure integer nearest-rank
    * (`ceil(p·n/100)` as `(p·n+99) div 100`, clamped ≥ 1) over a
    * deterministic (value, id) order — no float interpolation, so
    * both engines pick the same element.
    *
    * Shape: ONE hash shuffle on the key; the ranked pass (row_number)
    * and the two band lookups (`max(CASE rn = target)`) are window
    * functions over the same partitioning, so no second exchange. The
    * band lookup trick keeps it one scan — no percentile subquery
    * joined back.
    */
  def winsorize(
      events: DataFrame,
      keyCol: String,
      valueCol: String,
      idCols: Seq[String],
      loPct: Int = 5,
      hiPct: Int = 95): DataFrame = {
    require(0 < loPct && loPct < hiPct && hiPct <= 100,
      s"need 0 < loPct < hiPct <= 100, got [$loPct, $hiPct]")
    val w = Window.partitionBy(col(keyCol))
    val wo = w.orderBy((col(valueCol) +: idCols.map(col)).map(_.asc): _*)
    val v = col(valueCol)
    events.select((idCols :+ keyCol).map(col) :+ v: _*)
      .withColumn("__rn", row_number().over(wo))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__lo", max(when(col("__rn") ===
        greatest(expr(s"($loPct * __n + 99) div 100"), lit(1L)), v)).over(w))
      .withColumn("__hi", max(when(col("__rn") ===
        expr(s"($hiPct * __n + 99) div 100"), v)).over(w))
      .select((idCols :+ keyCol).map(col) :+ v :+
        least(greatest(v, col("__lo")), col("__hi")).as(s"${valueCol}_winsorized") :+
        (v < col("__lo") || v > col("__hi")).as("clipped"): _*)
  }

  /** Default MAD multiple (×1000) for [[madOutliers]]: 3×. */
  val DefaultMadThreshMilli: Long = 3000L

  /** Median-absolute-deviation outliers — the ROBUST sibling of
    * [[zscoreOutliers]]: mean/variance are themselves dragged by the
    * outliers they're meant to find, while the median and MAD ignore
    * up to half the data being wild. Flags rows with
    * `|x − median| · 1000 > thresh · MAD` in exact integers: both
    * medians are nearest-rank (`(n+1) div 2`) picks of real data
    * values — no averaging of middle pairs, no floats, engine-exact.
    * Keys whose MAD is 0 (more than half the values identical) emit
    * nothing rather than flagging every nonconforming row — that
    * degenerate case is [[zscoreOutliers]]' territory.
    *
    * Shape: ONE hash shuffle on the key, then two ranked passes over
    * the same partitioning (value order, then deviation order) with
    * the band-lookup trick of [[winsorize]] — windowed conditional
    * max, no median subquery joined back.
    */
  def madOutliers(
      events: DataFrame,
      keyCol: String,
      valueCol: String,
      idCols: Seq[String],
      threshMilli: Long = DefaultMadThreshMilli): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    val v = col(valueCol)
    val wo1 = w.orderBy((v +: idCols.map(col)).map(_.asc): _*)
    val step1 = events.select((idCols :+ keyCol).map(col) :+ v: _*)
      .withColumn("__rn", row_number().over(wo1))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__med",
        max(when(col("__rn") === expr("(__n + 1) div 2"), v)).over(w))
      .withColumn("__dev", abs(v - col("__med")))
    val wo2 = w.orderBy((col("__dev") +: idCols.map(col)).map(_.asc): _*)
    step1
      .withColumn("__rn2", row_number().over(wo2))
      .withColumn("__mad",
        max(when(col("__rn2") === expr("(__n + 1) div 2"), col("__dev"))).over(w))
      .where(col("__mad") > 0 && col("__dev") * 1000 > lit(threshMilli) * col("__mad"))
      .select((idCols :+ keyCol).map(col) :+ v :+
        col("__med").as("median") :+ col("__dev").as("abs_dev") :+
        col("__mad").as("mad"): _*)
  }

  /** Cohort retention — the user-lifecycle matrix behind every
    * engagement dashboard: users are cohorted by the week of their
    * FIRST event, and each cell (cohort_week, period_weeks) counts the
    * cohort members active that many weeks later. `retained_x10000`
    * is the cell's integer fixed-point share of the cohort (period 0
    * is 10000 by construction — every member is active in their own
    * first week).
    *
    * Shape: first-touch per user (hash-agg on user — map-side partials
    * carry `min(ts)`), distinct user-weeks (second hash-agg), then an
    * equijoin on user and the cell aggregation. Cohort sizes come from
    * a separate tiny aggregate (rows = #weeks) that joins back
    * broadcast — never a window over the full activity stream. All
    * date math is exact integers: both engines truncate weeks to
    * Monday and the day-difference of two week-starts is a multiple
    * of 7.
    */
  def retention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firstTouch = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first_ts"))
      .select(col(userCol), date_trunc("week", col("__first_ts")).cast("date").as("cohort_week"))
    val activity = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("__week"))
      .distinct()
    val cells = activity.join(firstTouch, userCol)
      .select(col("cohort_week"),
        expr("datediff(__week, cohort_week) div 7").as("period_weeks"))
      .groupBy(col("cohort_week"), col("period_weeks"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = firstTouch.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("period_weeks"), col("n_users"),
        col("cohort_size"),
        expr("(n_users * 10000) div cohort_size").as("retained_x10000"))
  }

  /** First-order Markov transition matrix over each user's event
    * sequence — the path-analysis primitive behind "what do users do
    * after X" funnels and behavioral anomaly screens (a crawler whose
    * view→view self-loop share is 999‰ is not a person). Each user's
    * events are ordered by (ts, tie); every adjacent pair contributes
    * one (from_type, to_type) observation; output is the pair count
    * plus its per-source share in exact integer permille
    * (`n·1000 div Σ_from n`, so rows hash-match any engine replaying
    * the integer ops).
    *
    * Shape: ONE shuffle on user (the same partitioning every other
    * sequence operator here uses — a pre-bucketed events table serves
    * them all), a per-partition sort for the `lead`, then a hash-agg
    * onto the (from, to) pair space — whose cardinality is bounded by
    * |event types|², not by the corpus. The share window runs over
    * that tiny aggregate, not over events.
    */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val nxt = graft.core.Cols.fresh("__next", Seq(userCol, tsCol, typeCol, tieCol))
    val byFrom = Window.partitionBy(col("from_type"))
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .withColumn(nxt, lead(col(typeCol), 1).over(w))
      .where(col(nxt).isNotNull)
      .groupBy(col(typeCol).as("from_type"), col(nxt).as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share_x1000",
        call_function("div", col("n") * lit(1000L), sum(col("n")).over(byFrom)))
  }

  /** N-stage funnel attribution — the generalization of the battery's
    * view → click → purchase composition (the reference has no events
    * analogue; this is the conversion-analysis primitive): every event
    * of the LAST stage type is an anchor, and each anchor walks
    * backwards through the earlier stages, attributing at each hop to
    * the user's latest stage event at-or-before the previously
    * attributed timestamp and within `toleranceMicros` of it. An
    * unattributed hop leaves every earlier hop unattributed too (the
    * chain property — counts are monotone non-increasing stage to
    * stage).
    *
    * Output: (userCol, n_<last>, n_<last-1>, …, n_<first>) — per user,
    * how many anchors completed each suffix of the funnel; `n_<first>`
    * is the full-funnel count.
    *
    * Implementation is one [[asofJoin]] per hop (each a single
    * union + window pass over the user partitioning — the
    * merge-sorted-streams plan, never a range join), then one hash-agg.
    * Stage events are de-duplicated per (user, ts) by the max tie id
    * first, discharging asofJoin's right-uniqueness precondition
    * deterministically. All K−1 window passes share the SAME user
    * partitioning, so a pre-bucketed events table serves every hop
    * without a new exchange.
    */
  def funnel(
      events: DataFrame,
      stages: Seq[String],
      toleranceMicros: Long,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      tieCol: String = "event_id"): DataFrame = {
    require(stages.size >= 2, s"funnel needs >= 2 stages, got ${stages.size}")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct, got $stages")
    require(toleranceMicros > 0,
      s"toleranceMicros must be positive, got $toleranceMicros")
    // anchors: every last-stage event (no dedup — each is one funnel
    // instance); __ats = the hop's attribution timestamp, rewritten
    // after each hop to the newly attributed stage's ts
    val anchor = events.where(col(typeCol) === stages.last)
      .select(col(userCol), col(tsCol).as("__ats"))
    val attributed = stages.init.reverse.zipWithIndex.foldLeft(anchor) {
      case (cur, (stage, i)) =>
        val idCol = s"__id_$i"
        val usCol = s"__us_$i"
        val st = events.where(col(typeCol) === stage)
          .groupBy(col(userCol), col(tsCol))
          .agg(max(col(tieCol)).as(idCol))
          .select(col(userCol), col(tsCol).as("__ats"), col(idCol),
            unix_micros(col(tsCol)).as(usCol))
        asofJoin(cur, st, Seq(userCol), "__ats",
            payload = Seq(idCol, usCol),
            toleranceMicros = Some(toleranceMicros))
          // next hop attributes at-or-before THIS stage's event time;
          // null (unattributed) propagates — the chain property
          .withColumn("__ats", timestamp_micros(col(usCol)))
    }
    attributed.groupBy(col(userCol)).agg(
      count(lit(1)).as(s"n_${stages.last}"),
      stages.init.reverse.zipWithIndex.map { case (stage, i) =>
        count(col(s"__id_$i")).as(s"n_$stage")
      }: _*)
  }
}
