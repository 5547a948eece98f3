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

  /** Keyed snapshot diff — classify every key as `added` / `removed` /
    * `changed` between two table versions and name the columns that
    * moved. The audit dual of [[upsert]]: upsert APPLIES a change
    * batch, diff RECOVERS one from two snapshots (regression checks
    * between pipeline runs, "what did the re-crawl actually touch",
    * deriving a CDC stream when the producer doesn't emit one).
    * Unchanged keys are absent from the output, so the diff of
    * identical snapshots is empty — the property a regression gate
    * asserts.
    *
    * Shape: ONE full-outer hash join on the key — both snapshots
    * partition on the same key, so on bucketed storage this is
    * shuffle-free — then a narrow projection of null-safe `<=>`
    * comparisons per payload column. `changed_cols` is the
    * comma-joined list of differing columns in declaration order
    * (deterministic — no set semantics to diverge on).
    */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    // compare column SETS, then realign: identically-schemed snapshots
    // whose columns merely differ in order are the same table version
    // and must diff, not throw
    require(before.columns.toSet == after.columns.toSet,
      s"snapshots must share a column set; before has ${
        before.columns.mkString(",")} vs after ${after.columns.mkString(",")}")
    val missingKeys = keys.filterNot(before.columns.contains)
    require(missingKeys.isEmpty,
      s"key column(s) ${missingKeys.mkString(",")} absent from the snapshots")
    // the output claims `change` / `changed_cols`; an input column with
    // either name would be silently clobbered by withColumn
    require(!before.columns.contains("change") && !before.columns.contains("changed_cols"),
      "'change' / 'changed_cols' are reserved output column names; rename the input column")
    val after0 = after.select(before.columns.map(col).toIndexedSeq: _*)
    val payload = before.columns.filterNot(keys.contains).toSeq
    val all = before.columns.toSeq
    val inB = graft.core.Cols.fresh("__in_b", all)
    val inA = graft.core.Cols.fresh("__in_a", all)
    val b = payload.foldLeft(before.withColumn(inB, lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"__b_$c")
    }
    val a = payload.foldLeft(after0.withColumn(inA, lit(true))) {
      (d, c) => d.withColumnRenamed(c, s"__a_$c")
    }
    val diffCols = payload.map(c => !(col(s"__b_$c") <=> col(s"__a_$c")))
    val anyDiff =
      if (diffCols.isEmpty) lit(false) else diffCols.reduce(_ || _)
    b.join(a, keys, "full_outer")
      .withColumn("change",
        when(col(inB).isNull, lit("added"))
          .when(col(inA).isNull, lit("removed"))
          .when(anyDiff, lit("changed")))
      .where(col("change").isNotNull)
      .withColumn("changed_cols",
        when(col("change") === "changed",
          concat_ws(",", payload.map(c =>
            when(!(col(s"__b_$c") <=> col(s"__a_$c")), lit(c))): _*))
          .otherwise(lit("")))
      .select(keys.map(col) ++ Seq(col("change"), col("changed_cols")): _*)
  }
}
