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
}
