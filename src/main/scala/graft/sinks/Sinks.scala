package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.api.Sink

/** Sinks — Spark forms of the reference loaders (tiny_etl/loaders/).
  *
  * The reference's buffered appenders, ack counters, reconnect loops and
  * the round-robin LoadBalanceLoader process tier are all writer-side
  * concerns Spark already owns: task-parallel writes, JDBC batching, and
  * `repartition(n)` in place of the N-pipe balancer
  * (tiny_etl/loaders/loadbalancer.py:16-163 → one option).
  */

/** Required-column projection shared by all loaders: the reference drops
  * a row when any `required` field is null
  * (tiny_etl/loaders/commons.py:55-62). `select` + `na.drop` on the
  * required subset reproduces it, and stays a pushable filter.
  */
object Projection {
  def apply(df: DataFrame, cols: Seq[(String, Column, Boolean)]): DataFrame = {
    val projected = df.select(cols.map { case (name, c, _) => c.as(name) }: _*)
    val required = cols.collect { case (name, _, true) => name }
    if (required.isEmpty) projected else projected.na.drop("any", required)
  }
}

/** CSV_FileLoader (tiny_etl/loaders/files.py:11-101): `;`-separated, no
  * header, append mode. Buffering/file-naming/flush is Spark's writer.
  */
final case class CsvSink(
    outDir: String,
    sep: String = ";",
    header: Boolean = false,
    numFiles: Option[Int] = None)
    extends Sink {
  def write(df: DataFrame): Unit = {
    val d = numFiles.fold(df)(df.repartition(_))
    d.write
      .option("delimiter", sep)
      .option("header", header.toString)
      .mode("append")
      .csv(outDir)
  }
}

/** Parquet sink — the format the rebuilt engine actually favors at scale
  * (columnar, prunable, splittable; nothing like it exists in the
  * reference). The three data-layout levers that matter at 100 TB:
  *
  *   - `partitionBy` → hive-style directories, so selective reads
  *     prune whole partitions BEFORE listing files (the scan's
  *     `PartitionFilters`, spec-asserted);
  *   - `sortBy` → rows arrive at the writer clustered: one
  *     `repartition` on the partition columns (one task = one
  *     partition directory, no small-file explosion) + a
  *     `sortWithinPartitions`, so every parquet row group carries
  *     tight min/max stats on the sort key and point/range reads skip
  *     row groups;
  *   - `maxRecordsPerFile` → bounds file size so a hot partition
  *     still splits across readers.
  *
  *   `dynamicPartitionOverwrite` rewrites ONLY the partitions present
  *   in the incoming data (the daily-reload idiom) instead of
  *   truncating the whole root.
  *
  *   `format` swaps the columnar container (parquet default, orc the
  *   built-in alternative) — every layout lever above is
  *   format-agnostic, so the sink exposes it rather than forking.
  */
final case class ParquetSink(
    outDir: String,
    partitionBy: Seq[String] = Nil,
    mode: String = "overwrite",
    sortBy: Seq[String] = Nil,
    maxRecordsPerFile: Option[Long] = None,
    dynamicPartitionOverwrite: Boolean = false,
    format: String = "parquet")
    extends Sink {
  def write(df: DataFrame): Unit = {
    val clustered =
      if (sortBy.isEmpty) df
      else if (partitionBy.isEmpty) df.sortWithinPartitions(sortBy.map(col): _*)
      else df.repartition(partitionBy.map(col): _*)
        .sortWithinPartitions((partitionBy ++ sortBy).map(col): _*)
    var w = clustered.write.mode(mode)
    maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n))
    if (dynamicPartitionOverwrite) w = w.option("partitionOverwriteMode", "dynamic")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .format(format).save(outDir)
  }
}

/** Bucketed managed table — the co-located-join strategy at scale: two
  * tables bucketed (and sorted) on the same key join WITHOUT a shuffle
  * on either side, so a fact-to-fact join that would otherwise exchange
  * 100 TB becomes a per-bucket merge. Nothing like it exists in the
  * reference (its one table is a flat CSV/MySQL dump); this is the
  * Spark-native answer to "reuse a partitioning across stages".
  */
final case class BucketedTableSink(
    table: String,
    bucketCols: Seq[String],
    numBuckets: Int,
    sortCols: Seq[String] = Nil,
    mode: String = "overwrite")
    extends Sink {
  def write(df: DataFrame): Unit = {
    val w = df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }
}

/** MySQL_DBLoader (tiny_etl/loaders/mysql.py:10-135): batched JDBC append.
  * `numPartitions` is the LoadBalanceLoader replacement — N concurrent
  * connections, each batching `batchsize` rows per round trip; retry and
  * transactions belong to the JDBC driver. (No DB exists in the test
  * container; exercised only through the plan, not a live connection.)
  */
final case class JdbcSink(
    url: String,
    table: String,
    user: String,
    password: String,
    batchSize: Int = 1000,
    numPartitions: Int = 4)
    extends Sink {
  def write(df: DataFrame): Unit =
    df.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize)
      .option("numPartitions", numPartitions)
      .mode("append")
      .save()
}

/** NoopLoader (tiny_etl/loaders/commons.py:40-65): log-only sink. */
final case class ConsoleSink(numRows: Int = 20, truncate: Boolean = true)
    extends Sink {
  def write(df: DataFrame): Unit = df.show(numRows, truncate)
}

/** ConditionalLoader (tiny_etl/loaders/commons.py:67-110): route to the
  * wrapped sink iff the condition holds. The reference's condition is a
  * driver-side value/callable → a by-name Boolean here; row-level routing
  * is the `rowFilter` variant.
  */
final case class ConditionalSink(condition: () => Boolean, wrapped: Sink)
    extends Sink {
  def write(df: DataFrame): Unit = if (condition()) wrapped.write(df)
}

/** Row-level conditional routing: filter then delegate. */
final case class FilteredSink(rowCondition: Column, wrapped: Sink) extends Sink {
  def write(df: DataFrame): Unit = wrapped.write(df.filter(rowCondition))
}

/** LoadBalanceLoader (tiny_etl/loaders/loadbalancer.py:16-163): the
  * round-robin parallel sink tier is just an explicit repartition before
  * the delegate write — Spark's round-robin partitioning IS rotary_iter
  * (tiny_etl/commons.py:17-27) distributed.
  */
final case class RepartitionedSink(n: Int, wrapped: Sink) extends Sink {
  def write(df: DataFrame): Unit = wrapped.write(df.repartition(n))
}
