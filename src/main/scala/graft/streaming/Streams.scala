package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Structured Streaming forms of the engine's operators — the
  * reference is batch-only (bounded input, run-to-completion; its
  * multiprocessing queues are plumbing, not a streaming semantic —
  * SURVEY §1.1), so these are capability extensions: the same logical
  * operators under `readStream`/`writeStream` with event-time
  * semantics.
  *
  * Everything here is a plain DataFrame/Dataset transform — the
  * streaming-ness comes from the source; the window aggregation also
  * runs unchanged on a batch frame (same code path as the
  * events_window query).
  */
object Streams {

  /** Event-time tumbling-window aggregation with a watermark — the
    * streaming form of the events_window query. Late rows beyond
    * `lateness` are dropped and window state is reclaimed, which is
    * what makes the aggregation runnable forever at 100 TB/day: state
    * is bounded by (watermark horizon × keys), not by stream length.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      windowLen: String = "1 hour",
      lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col(s"window.start").as("ws"), col(keyCol), col("n"))

  /** Streaming keyed dedup — the streaming analogue of the reference's
    * ConcurrentKeyBagSet (tiny_etl/commons.py:238-310): the state
    * store IS the bag, scoped by the watermark instead of by input
    * record, so memory stays bounded on an unbounded stream.
    */
  def dedupWithinWatermark(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String = "ts",
      lateness: String = "2 hours"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys)

  /** Output row of [[runningCounts]]. */
  final case class KeyTotal(key: String, total: Long)

  /** Custom keyed state via mapGroupsWithState: a running total per
    * key across micro-batches — the minimal shape of "bring your own
    * state machine" (sessionization, counters, CDC merge) that the
    * reference could only express as a shared in-memory dict. State is
    * one long per key, partitioned by the state store.
    */
  def runningCounts(ds: Dataset[(String, Long)]): Dataset[KeyTotal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .mapGroupsWithState[Long, KeyTotal](GroupStateTimeout.NoTimeout) {
        (key, rows, state) =>
          val total = state.getOption.getOrElse(0L) + rows.map(_._2).sum
          state.update(total)
          KeyTotal(key, total)
      }
  }
}
