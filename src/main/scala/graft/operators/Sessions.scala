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
}
