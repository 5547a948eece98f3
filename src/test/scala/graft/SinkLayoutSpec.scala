package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ParquetSink

/** Layout-lever tests for the partitioned parquet sink: hive directory
  * structure, partition-pruned scans, within-file sort order (the
  * row-group min/max stats story), and dynamic partition overwrite.
  */
class SinkLayoutSpec extends SparkSpecBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"))

  test("partitionBy + sortBy: hive dirs, pruned scan, sorted files") {
    val out = Files.createTempDirectory("graft_layout").toString
    ParquetSink(out, partitionBy = Seq("lang"), sortBy = Seq("doc_id"))
      .write(docs)

    // hive-style directories, one per lang
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).toSet
    assert(dirs === langs.map(l => s"lang=$l"))

    // round trip: nothing lost
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())

    // selective read prunes PARTITIONS (not just rows): the scan node
    // carries the lang predicate as a PartitionFilter
    val plan = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"),
      s"lang predicate did not become a partition filter:\n${plan.take(2000)}")
    // and the pruned read equals reading the en directory directly
    val viaFilter = back.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val viaDir = spark.read.parquet(s"$out/lang=en")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaFilter.nonEmpty && viaFilter === viaDir)

    // within every data file, rows are sorted by the sortBy key — the
    // clustering that gives parquet row-group min/max stats their bite
    for (f <- new java.io.File(s"$out/lang=${langs.head}").listFiles()
        if f.getName.endsWith(".parquet")) {
      val ids = spark.read.parquet(f.getPath).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids === ids.sorted, s"${f.getName} not sorted by doc_id")
    }
  }

  test("one writer task per partition directory: no small-file explosion") {
    val out = Files.createTempDirectory("graft_layout1").toString
    ParquetSink(out, partitionBy = Seq("lang"), sortBy = Seq("doc_id"))
      .write(docs)
    for (d <- new java.io.File(out).listFiles() if d.isDirectory) {
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files === 1, s"${d.getName} holds $files files, expected 1")
    }
  }

  test("maxRecordsPerFile splits a hot partition") {
    val out = Files.createTempDirectory("graft_layout2").toString
    ParquetSink(out, partitionBy = Seq("lang"), sortBy = Seq("doc_id"),
      maxRecordsPerFile = Some(10L)).write(docs)
    val biggest = docs.groupBy("lang").count()
      .orderBy(col("count").desc).head
    val files = new java.io.File(s"$out/lang=${biggest.getString(0)}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val expectedMin = (biggest.getLong(1) + 9) / 10
    assert(files >= expectedMin,
      s"expected >= $expectedMin files for ${biggest.getLong(1)} rows, got $files")
  }

  test("zValue interleaves bits dimension-major") {
    import spark.implicits._
    // x = 0b101, y = 0b011 → z bits: x0@0, y0@1, x1@2, y1@3, x2@4, y2@5
    //                      = 1 + 2 + 0 + 8 + 16 + 0 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(graft.operators.Layout.zValue(Seq(col("x"), col("y")), bits = 3))
      .head.getLong(0)
    assert(z === 27L)
  }

  test("zOrderBy tightens per-file bounding boxes on BOTH dimensions") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val out = Files.createTempDirectory("graft_zorder").toString
    // normalize both keys onto the full grid — the keys span ~2^13 and
    // ~2^8, and an unnormalized interleave would let l_orderkey own
    // every high bit (a de-facto 1-D sort)
    val maxes = li.agg(max(col("l_orderkey")), max(col("l_partkey"))).head
    graft.operators.Layout.zOrderBy(li,
      Seq(
        graft.operators.Layout.normalize(col("l_orderkey"), maxes.getLong(0) + 1),
        graft.operators.Layout.normalize(col("l_partkey"), maxes.getLong(1) + 1)),
      // a power of 4 so files are whole z-quadrants (range-partition
      // boundaries come from sampling — quadrant alignment keeps the
      // per-file boxes tight regardless of the sampled split points)
      numFiles = 16).write.mode("overwrite").parquet(out)

    def globalRange(c: String): Double = {
      val r = li.agg(min(col(c)), max(col(c))).head
      (r.getLong(1) - r.getLong(0)).toDouble
    }
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length >= 12)
    def meanFileRange(c: String): Double = {
      val spans = files.map { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    // a 1-D sort would leave the OTHER key's per-file range ≈ global;
    // z-order shrinks BOTH (ideal for 16 quadrant files: ~global / 4)
    assert(meanFileRange("l_orderkey") < 0.6 * globalRange("l_orderkey"))
    assert(meanFileRange("l_partkey") < 0.6 * globalRange("l_partkey"))
  }

  test("z-order: MEASURED row-group skipping — a 2-D box scan reads a fraction of a 1-D sort's rows") {
    // The bounding-box test shows the boxes tighten; this one shows the
    // reader actually SKIPS: parquet row-group stats pruning happens
    // inside the scan, so the FileSourceScanExec numOutputRows metric
    // counts only rows from row groups the predicate could not rule
    // out. Layout A: classic 1-D range sort on l_orderkey. Layout B:
    // z-order on (l_orderkey, l_partkey). A selective l_partkey box
    // then measures real I/O: the 1-D layout's every file spans the
    // full partkey range (nothing skips), the z-layout's files cover
    // ~a quadrant strip each (most skip).
    import org.apache.spark.sql.execution.FileSourceScanExec
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val maxes = li.agg(max(col("l_orderkey")), max(col("l_partkey"))).head
    val (maxOrder, maxPart) = (maxes.getLong(0), maxes.getLong(1))

    val sortedOut = Files.createTempDirectory("graft_zskip_sorted").toString
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(sortedOut)
    val zOut = Files.createTempDirectory("graft_zskip_z").toString
    graft.operators.Layout.zOrderBy(li,
      Seq(
        graft.operators.Layout.normalize(col("l_orderkey"), maxOrder + 1),
        graft.operators.Layout.normalize(col("l_partkey"), maxPart + 1)),
      numFiles = 16).write.mode("overwrite").parquet(zOut)

    def scanRows(path: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(path).filter(pred)
      // collect() executes THIS Dataset's queryExecution (count() would
      // build and execute a different derived plan, leaving these
      // metrics untouched)
      val result = df.collect().length.toLong
      val scans = df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, "expected a FileSourceScanExec in the plan")
      (scans.map(_.metrics("numOutputRows").value).sum, result)
    }

    // bottom-eighth partkey box — selective on the dimension the 1-D
    // layout did NOT sort by
    val box = col("l_partkey") <= maxPart / 8
    val (sortedRead, sortedResult) = scanRows(sortedOut, box)
    val (zRead, zResult) = scanRows(zOut, box)
    assert(sortedResult === zResult, "both layouts must answer identically")
    val total = li.count()
    // 1-D-sorted: no file can be skipped on partkey → reads ~everything
    assert(sortedRead > (total * 0.9).toLong,
      s"expected the 1-D layout to read ~all $total rows, read $sortedRead")
    // z-ordered: partkey strips skip most quadrant files (ideal 4/16;
    // sampling-based splits and column-index effects leave slack)
    assert(zRead < sortedRead / 2,
      s"z-order should read < half the 1-D layout's rows: $zRead vs $sortedRead")
  }

  test("dynamic partition overwrite rewrites only the incoming partitions") {
    val out = Files.createTempDirectory("graft_layout3").toString
    val sink = ParquetSink(out, partitionBy = Seq("lang"))
    sink.write(docs)
    val before = spark.read.parquet(out)
    val nOther = before.filter(col("lang") =!= "en").count()
    val nEn = before.filter(col("lang") === "en").count()
    assert(nEn > 0 && nOther > 0)

    // daily-reload: re-deliver ONLY the en partition with shifted ids
    val enFixed = docs.filter(col("lang") === "en")
      .withColumn("doc_id", col("doc_id") + 1000000L)
    ParquetSink(out, partitionBy = Seq("lang"), dynamicPartitionOverwrite = true)
      .write(enFixed)

    val after = spark.read.parquet(out)
    assert(after.filter(col("lang") =!= "en").count() === nOther) // untouched
    assert(after.filter(col("lang") === "en").count() === nEn)
    assert(after.filter(col("lang") === "en" && col("doc_id") < 1000000L).count() === 0)
  }

  test("format=orc: same layout levers, identical round trip, pruned scan") {
    val out = Files.createTempDirectory("graft_layout_orc").toString
    ParquetSink(out, partitionBy = Seq("lang"), sortBy = Seq("doc_id"),
      format = "orc").write(docs)
    val back = spark.read.orc(out)
    assert(back.count() === docs.count())
    val got = back.select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want)
    val plan = back.filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"),
      s"orc scan did not get the partition filter:\n${plan.take(2000)}")
  }

  test("compactionPlan: big files keep, small files bin to ~target per dir") {
    import spark.implicits._
    val target = 100L
    // dir A: 5 small files of 40 -> cumsum bins 0,0,0(120? no: exclusive
    // cumsum 0,40,80,120,160 -> bins 0,0,0,1,1); one big file of 250
    // stays keep. dir B: one tiny file -> single bin 0.
    val listing = Seq(
      ("A", "a1", 40L), ("A", "a2", 40L), ("A", "a3", 40L),
      ("A", "a4", 40L), ("A", "a5", 40L), ("A", "big", 250L),
      ("B", "b1", 10L)).toDF("dir", "path", "bytes")
    val got = graft.operators.Layout.compactionPlan(listing, target)
      .collect().map(r => r.getString(1) ->
        ((r.getString(3), Option(r.getString(4))))).toMap
    assert(got("big") === (("keep", None)))
    assert(got("a1") === (("compact", Some("A#0"))))
    assert(got("a2") === (("compact", Some("A#0"))))
    assert(got("a3") === (("compact", Some("A#0"))))
    assert(got("a4") === (("compact", Some("A#1"))))
    assert(got("a5") === (("compact", Some("A#1"))))
    assert(got("b1") === (("compact", Some("B#0"))))
    // every compact group's total stays under target + one member file
    val totals = graft.operators.Layout.compactionPlan(listing, target)
      .where(col("action") === "compact")
      .groupBy("group_id")
      .agg(sum("bytes").as("t"), max("bytes").as("m"))
      .collect()
    totals.foreach(r =>
      assert(r.getLong(1) < target + r.getLong(2),
        s"group ${r.getString(0)} total ${r.getLong(1)} exceeds envelope"))
  }

  test("compact executes the plan: one file per group, keeps untouched, content exact") {
    import spark.implicits._
    import graft.operators.Layout
    val work = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val stage = s"$work/stage"
    val out = s"$work/out"
    // a small-file tree: 12 single-row-group files of ~equal size
    val rows = (0L until 240L).map(i => (i, s"v$i", i % 7))
    rows.toDF("id", "v", "k").repartition(12, col("id"))
      .write.parquet(stage)
    def listFiles(dir: String) =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val staged = listFiles(stage)
    assert(staged.length >= 8) // some hash partitions may be empty
    // target ≈ 4 files ⇒ ~3 rewrite groups; one file made keep-sized by
    // choosing target just under its byte size is brittle — instead
    // append one genuinely big file (many rows) so keep is exercised
    val bigDir = s"$work/big"
    (100000L until 101000L).map(i => (i, s"v$i", i % 7)).toDF("id", "v", "k")
      .coalesce(1).write.parquet(bigDir)
    val bigFile = listFiles(bigDir).head
    val bigDest = java.nio.file.Paths.get(stage, "zz_big.parquet")
    java.nio.file.Files.move(bigFile.toPath, bigDest)

    val all = listFiles(stage)
    val target = staged.map(_.length()).sorted.apply(staged.length / 2) * 4
    assert(bigDest.toFile.length() >= target, "keep arm needs a big file")
    val listing = all.map(f => (stage, f.getAbsolutePath, f.length()))
      .toSeq.toDF("dir", "path", "bytes")
    val plan = Layout.compactionPlan(listing, target)
    val nGroups = plan.where(col("action") === "compact")
      .select("group_id").distinct().count()
    assert(nGroups >= 2, s"want multiple rewrite groups, got $nGroups")
    assert(plan.where(col("action") === "keep").count() === 1L)

    val keepModifiedBefore = bigDest.toFile.lastModified()
    val manifest = Layout.compact(spark, plan, out)

    // layout contract: every planned group wrote exactly one file
    val got = manifest.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size.toLong === nGroups)
    assert(got.values.forall(_ === 1L), s"multi-file groups: $got")
    // keep file untouched on disk
    assert(bigDest.toFile.exists() &&
      bigDest.toFile.lastModified() === keepModifiedBefore)
    // content contract: rewritten ∪ keep == staged corpus exactly
    val back = spark.read.parquet(out).drop(Layout.CompactGroupCol)
      .unionByName(spark.read.parquet(bigDest.toString))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = (rows ++ (100000L until 101000L).map(i => (i, s"v$i", i % 7))).toSet
    assert(back === want)
    // input-bytes envelope per executed group (the plan's binning bound)
    plan.where(col("action") === "compact")
      .groupBy("group_id").agg(sum("bytes").as("t"), max("bytes").as("m"))
      .collect().foreach(r =>
        assert(r.getLong(1) < target + r.getLong(2),
          s"group ${r.getString(0)} total ${r.getLong(1)} exceeds envelope"))
  }

  test("compact on a keep-only plan writes nothing and returns an empty manifest") {
    import spark.implicits._
    import graft.operators.Layout
    val work = java.nio.file.Files.createTempDirectory("graft_compact_k").toString
    val plan = Seq(("d", s"$work/nope.parquet", 10L, "keep", null: String))
      .toDF("dir", "path", "bytes", "action", "group_id")
    val manifest = Layout.compact(spark, plan, s"$work/out")
    assert(manifest.count() === 0L)
    assert(!new java.io.File(s"$work/out").exists())
  }

  test("listFiles → plan → compact is scheme-portable end to end") {
    import spark.implicits._
    import graft.operators.Layout
    val work = java.nio.file.Files.createTempDirectory("graft_compact_fs").toString
    val stage = s"$work/stage"
    (0L until 120L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8, col("id")).write.parquet(stage)

    // Hadoop-FS listing: one row per parquet part, full URIs, sorted —
    // and it agrees exactly with a java.io ground-truth listing
    val listing = Layout.listFiles(spark, stage).cache()
    val got = listing.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val truth = new java.io.File(stage).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => (stage, "file:" + f.getAbsolutePath, f.length()))
      .sortBy(_._2)
    assert(got.toSeq === truth.toSeq)
    assert(got.forall(_._2.startsWith("file:")),
      "listFiles must return scheme-qualified URIs (the _metadata.file_path form)")

    // the URI-path plan drives compact to the same layout contract a
    // bare-path plan does: every group exactly one file, content exact
    val target = got.map(_._3).max * 3
    val plan = Layout.compactionPlan(listing, target)
    val manifest = Layout.compact(spark, plan, s"$work/out")
    val planned = plan.where(col("action") === "compact")
      .select("group_id").distinct().count()
    assert(manifest.count() === planned)
    assert(manifest.where(col("out_files") =!= 1L).count() === 0L)
    val back = spark.read.parquet(s"$work/out").drop(Layout.CompactGroupCol)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === (0L until 120L).map(i => (i, s"v$i")).toSet)

    // a missing directory lists as empty, not an error (object-store
    // listings of absent prefixes behave the same way)
    assert(Layout.listFiles(spark, s"$work/absent").count() === 0L)
  }
}
