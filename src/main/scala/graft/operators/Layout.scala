package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering — Z-order (Morton)
  * interleaving, the technique behind "OPTIMIZE ZORDER BY" in lakehouse
  * engines: sort by the bit-interleave of several keys and every file's
  * bounding box is tight in ALL of them at once, so min/max row-group
  * stats prune selective reads on ANY of the dimensions, not just a
  * single sort key. A 1-D sort gives perfect pruning on one column and
  * none on the others; Z-order trades a constant factor on each for
  * usable pruning on all (per-file range ≈ global / fileCount^(1/D)).
  *
  * [[zValue]] is exact int64 bit arithmetic (shift/and/or only), so it
  * stays inside whole-stage codegen and any engine reproduces it — the
  * rel_zorder oracle interpolates the identical formula.
  */
object Layout {

  /** Morton interleave of `dims` values: bit j of dimension i lands at
    * position `j * dims.size + i`. Every input must already lie in
    * `[0, 2^bits)` — reduce keys first (e.g. `pmod(k, 1 << bits)` or a
    * range-normalize); out-of-range bits are silently dropped by the
    * mask, which would break locality, not correctness. `bits *
    * dims.size` must fit a positive int64 (≤ 62). */
  def zValue(dims: Seq[Column], bits: Int = 16): Column = {
    val d = dims.size
    require(d >= 1, "zValue needs at least one dimension")
    require(bits >= 1 && bits * d <= 62, s"bits * dims = ${bits * d} exceeds int64")
    val terms = for {
      j <- 0 until bits
      (c, i) <- dims.zipWithIndex
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * d + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Monotone normalization of a non-negative key in `[0,
    * maxExclusive)` onto the full `[0, 2^bits)` grid: `⌊k · 2^bits /
    * maxExclusive⌋`. Z-order NEEDS dimensions on comparable scales —
    * interleaving a 13-bit key with an 8-bit key lets the wide one
    * dominate every high bit and the layout degenerates to a 1-D sort
    * (spec-demonstrated). Exact for `maxExclusive · 2^bits < 2^53`; at
    * a larger domain normalize by shifting instead. */
  def normalize(c: Column, maxExclusive: Long, bits: Int = 16): Column = {
    require(maxExclusive >= 1, s"maxExclusive must be >= 1, got $maxExclusive")
    val a = c * lit(1L << bits)
    ((a - pmod(a, lit(maxExclusive))) / lit(maxExclusive)).cast("long")
  }

  /** The same formula as engine-neutral SQL text, for differential
    * oracles: `dims` are SQL expressions already reduced to
    * `[0, 2^bits)`. */
  def zValueSql(dims: Seq[String], bits: Int = 16): String = {
    val d = dims.size
    val terms = for {
      j <- 0 until bits
      (e, i) <- dims.zipWithIndex
    } yield s"((($e >> $j) & 1) << ${j * d + i})"
    terms.mkString("(", " | ", ")")
  }

  /** Cluster `df` for multi-dimensional pruning: range-partition on the
    * Z-value (contiguous z-ranges per output file ⇒ tight per-file
    * bounding boxes) and sort within each partition so row groups
    * inherit the same locality. `numFiles` sizes the output; at scale
    * pick `bytes / targetFileSize`. */
  def zOrderBy(
      df: DataFrame,
      dims: Seq[Column],
      numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val z = graft.core.Cols.fresh("__z", df.columns.toSeq)
    df.withColumn(z, zValue(dims, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** Small-file compaction planning — the operational counterpart of
    * [[zOrderBy]]: a table that has absorbed many small appends reads
    * at open-one-file-per-task speed until its files are rewritten
    * into ~`targetBytes` groups. Given a file listing `(dir, path,
    * bytes)`, files already ≥ `targetBytes` are marked `keep`
    * (rewriting them buys nothing); smaller files get a deterministic
    * group id `dir#⌊exclusive-cumsum(bytes)/targetBytes⌋` via a
    * path-ordered running sum — each group's total lands in
    * [targetBytes − last-file, targetBytes + one-file), the standard
    * streaming-friendly binning (first-fit-decreasing packs ~equally
    * but needs a size-sorted sequential pass; cumsum binning is
    * order-deterministic and engine-reproducible).
    *
    * Scale shape: ONE window partitioned by `(dir, small?)` — a
    * table's compaction unit is the partition directory, so the sort
    * is per-directory, never global; output is the per-file
    * assignment, the artifact a rewrite job consumes group by group.
    */
  def compactionPlan(
      files: DataFrame,
      targetBytes: Long,
      dirCol: String = "dir",
      pathCol: String = "path",
      bytesCol: String = "bytes"): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    val small = col(bytesCol) < targetBytes
    val smallC = graft.core.Cols.fresh("__small", Seq(dirCol, pathCol, bytesCol))
    val w = Window.partitionBy(col(dirCol), col(smallC))
      .orderBy(col(pathCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn(smallC, small)
      .withColumn("__cum", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .select(col(dirCol), col(pathCol),
        col(bytesCol).cast("long").as(bytesCol),
        when(col(smallC), lit("compact")).otherwise(lit("keep")).as("action"),
        when(col(smallC), concat(col(dirCol), lit("#"),
          call_function("div", col("__cum"), lit(targetBytes))))
          .as("group_id"))
  }

  /** Partition-directory name [[compact]] writes rewrite groups under. */
  val CompactGroupCol = "compact_group"

  /** Non-recursive file listing of `dir` as `(dir, path, bytes)` rows —
    * the input shape [[compactionPlan]] consumes — through the Hadoop
    * `FileSystem` API, so the same call works on `file:`, `hdfs:` and
    * `s3a:` paths (a `java.io.File` listing only ever worked locally).
    * Paths come back as full URIs (`FileStatus.getPath.toString`),
    * which is also what the parquet source's `_metadata.file_path`
    * yields — so plan paths and scan provenance share one form and the
    * [[compact]] join needs no per-scheme cases. Driver-side and
    * metadata-only by design: one RPC per directory, one row per file,
    * the same listing lakehouse OPTIMIZE jobs collect to build rewrite
    * plans. For tables with many partition directories, call once per
    * directory (the compaction unit) and union the tiny frames. */
  def listFiles(
      spark: SparkSession,
      dir: String,
      suffix: String = ".parquet"): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows =
      if (!fs.exists(p)) Seq.empty[(String, String, Long)]
      else fs.listStatus(p).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(suffix))
        .map(st => (dir, st.getPath.toString, st.getLen))
        .sortBy(_._2)
    rows.toDF("dir", "path", "bytes")
  }

  /** Execute a [[compactionPlan]] over real parquet files: every
    * `compact`-planned file is rewritten into exactly ONE output file
    * per rewrite group under `outDir/compact_group=<group_id>/`;
    * `keep` files are (correctly) not touched — rewriting a file that
    * is already at target size buys nothing.
    *
    * Scale shape: the data path is fully distributed — ONE parquet
    * scan over the union of compact-planned files, per-row provenance
    * from the file source's `_metadata.file_path`, a broadcast join of
    * the (path → group) plan slice, then a hash `repartition` on the
    * group id so each group lands whole in one task, whose
    * `partitionBy` write emits one file per group value it holds —
    * exactly one per group overall. Only the plan's PATH LIST touches
    * the driver (metadata, one row per file — the same shape lakehouse
    * OPTIMIZE jobs collect to build their rewrite jobs); row data
    * never does. Plan `path`s must be absolute; `file:` URIs and bare
    * paths both join (the scheme is normalized away on both sides).
    *
    * Returns the post-write manifest — `(group_id, out_files,
    * out_bytes)`, one row per group directory actually written, from a
    * fresh listing (NOT an echo of the plan) — so callers can assert
    * the layout contract: `out_files == 1` per group, group count ==
    * planned count. An empty/`keep`-only plan writes nothing and
    * returns an empty manifest. */
  def compact(spark: SparkSession, plan: DataFrame, outDir: String): DataFrame = {
    import spark.implicits._
    val normalize = (p: Column) => regexp_replace(p, "^file:/+", "/")
    val toCompact = plan.filter(col("action") === lit("compact"))
      .select(normalize(col("path")).as("__src"), col("group_id"))
    val paths = toCompact.select(col("__src")).as[String].collect().sorted
    if (paths.nonEmpty) {
      spark.read.parquet(paths.toIndexedSeq: _*)
        .withColumn("__src", normalize(col("_metadata.file_path")))
        .join(broadcast(toCompact.withColumnRenamed("group_id", CompactGroupCol)),
          Seq("__src"))
        .drop("__src")
        .repartition(col(CompactGroupCol))
        .write.mode("overwrite").partitionBy(CompactGroupCol).parquet(outDir)
    }
    // manifest listing through the Hadoop FileSystem API — the same
    // scheme-portability contract as [[listFiles]] (hdfs:///s3a://
    // output dirs list identically to file://)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val groupDirs =
      if (!fs.exists(outPath)) Seq.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(outPath).toSeq
        .filter(st => st.isDirectory &&
          st.getPath.getName.startsWith(CompactGroupCol + "="))
    val manifest = groupDirs.map { g =>
      val parts = fs.listStatus(g.getPath).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      // partitionBy hive-escapes special chars ('#' → %23) in dir names
      val gid = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(g.getPath.getName.stripPrefix(CompactGroupCol + "="))
      (gid, parts.length.toLong, parts.map(_.getLen).sum)
    }
    manifest.toDF("group_id", "out_files", "out_bytes")
  }
}
