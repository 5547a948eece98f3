package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture merge — the MERGE INTO / upsert primitive every
  * periodically-refreshed corpus needs: apply a batch of keyed changes
  * (updates, inserts, tombstone deletes) onto a base snapshot and emit
  * the next snapshot.
  *
  * Spark-first shape: ONE full-outer shuffle join on the key (both
  * sides hash-partitioned; AQE handles the size asymmetry — a daily
  * increment is usually ≪ the base, so the join often degenerates to
  * a broadcast of the changes), then a narrow per-column
  * `coalesce(update, base)` projection. No row-by-row driver logic,
  * no window. At the partitioned-storage layer this composes with
  * [[graft.sinks.ParquetSink]]'s dynamic partition overwrite: join →
  * write only the partitions the increment touched.
  *
  * Contract: `updates` carries the same columns as `base` (plus the
  * optional delete flag); per key the changes batch holds at most one
  * row (pre-aggregate a CDC stream by latest-ts first — the as-of
  * machinery in [[Sessions]] does exactly that); a delete-flagged row
  * removes the key; an update row's non-key columns REPLACE the
  * base's wholesale (snapshot semantics, not per-column patching —
  * nulls in an update row are written, not skipped).
  */
object Cdc {

  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val payload = base.columns.filterNot(keys.contains)
    val del = graft.core.Cols.fresh("__del", base.columns.toSeq ++ updates.columns)
    val hit = graft.core.Cols.fresh("__hit", base.columns.toSeq ++ updates.columns)
    val u0 = deleteCol match {
      case Some(c) => updates.withColumnRenamed(c, del)
      case None => updates.withColumn(del, lit(false))
    }
    val u = payload.foldLeft(u0.withColumn(hit, lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"__u_$c")
    }
    base.join(u, keys, "full_outer")
      .where(!coalesce(col(del), lit(false)))
      .select(keys.map(col) ++ payload.map { c =>
        // whole-row replace: if the key is in the changes batch, take
        // the update's value even when it is null
        when(coalesce(col(hit), lit(false)), col(s"__u_$c"))
          .otherwise(col(c)).as(c)
      }: _*)
  }

  /** Slowly-changing-dimension Type 2 — turn a keyed change LOG into a
    * versioned HISTORY table with validity intervals: one row per
    * value run, `valid_from`/`valid_to` half-open, `valid_to` null on
    * the current row. The other half of [[upsert]]: upsert maintains
    * the latest snapshot, scd2 preserves every state for
    * point-in-time joins (training-data freshness audits, "what did
    * this record say when the model was trained?").
    *
    * Two steps over ONE partitioning (key, ordered by ts + tie-break):
    * change compression — a row survives only if some payload column
    * IS DISTINCT FROM its predecessor's (null-safe, so null→value and
    * value→null are real transitions) — then `lead(ts)` over the
    * survivors stamps each run's end. Both windows sort by the same
    * spec, so the plan is one shuffle + one sort; no self-join, no
    * driver loop. Ties on ts are ordered by `tieBreak` (pass the
    * change-log sequence column) to keep replays deterministic.
    */
  def scd2(
      log: DataFrame,
      keys: Seq[String],
      tsCol: String,
      payload: Seq[String],
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    require(payload.nonEmpty, "scd2 needs at least one payload column")
    val order = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(order: _*)
    val changed = payload
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val first = row_number().over(w) === 1
    log.select(keys.map(col) ++ (col(tsCol) +: payload.map(col)) ++ tieBreak.map(col): _*)
      .withColumn("__keep", first || changed)
      .where(col("__keep"))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(tsCol, "valid_from")
      .drop("__keep")
      .drop(tieBreak: _*)
  }
}
