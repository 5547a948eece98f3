package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's OWN published scale, reproduced: a ~4 GB corpus
  * built by duplicating the sample books
  * (`/root/reference/example/generate_test_data.py:66-67` targets
  * 4 × 1,024 MB by copying the seed corpus), run through the canonical
  * word-stats pipeline, measured in MB/s against the reference's one
  * published rate — 0.00050067901 s/KB ≈ 1.95 MB/s on its calibrated
  * 8-CPU host (`example/main.py:207,219-221`; BASELINE.md). Every
  * BENCH comparison so far extrapolates from sf0.1 (~1.4 MB); this
  * main is the apples-to-apples run at the scale the reference itself
  * documents.
  *
  * Corpus generation differs from the reference's `shutil.copy` in one
  * deliberate way: every whitespace token gets a per-replica marker
  * suffix (`_r0042`), the Soak.scala discipline. The canonical dedup
  * is keyed per (file, word_norm), so plain copies would already do
  * honest N× work — but marker suffixes additionally make every
  * replica's vocabulary disjoint, so no cross-file result could
  * collapse even if an operator dropped the file key, and the output
  * size itself certifies per-replica work. The replica index is
  * zero-padded so every replica is byte-identical in size and the
  * corpus size is exactly replicas × one measured replica.
  *
  * The timed pipeline is the 100 TB shape: [[graft.sources.ChunkedTextSource]]
  * (splittable TextInputFormat scan with byte offsets — no task ever
  * holds a whole file) feeding [[graft.operators.WordStats.fromLines]].
  * After the timed reps, the golden `dedup_audit` invariant
  * (`/root/reference/example/readme.md:68`: first-seen dedup leaves no
  * duplicate (file, word_norm)) is asserted at full scale.
  *
  * Emits ONE JSON line (compact — the harness tail window) and writes
  * the full record to SCALE4G.json.
  */
object ScaleAnchor {

  val BooksDir = "/root/reference/example/sample_data/books"

  /** Suffix every whitespace token of `line` with `marker` — a manual
    * scan, not a regex (this runs over the whole generated corpus). */
  private def suffixTokens(line: String, marker: String): String = {
    val sb = new java.lang.StringBuilder(line.length * 2)
    var i = 0
    var inTok = false
    while (i < line.length) {
      val c = line.charAt(i)
      val ws = Character.isWhitespace(c)
      if (inTok && ws) { sb.append(marker); inTok = false }
      if (!ws) inTok = true
      sb.append(c)
      i += 1
    }
    if (inTok) sb.append(marker)
    sb.toString
  }

  private def generate(outDir: java.nio.file.Path, targetBytes: Long): (Long, Int, Int) = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.createDirectories(outDir)
    val books = java.nio.file.Files.list(java.nio.file.Paths.get(BooksDir))
      .iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".txt")).sortBy(_.toString)
    require(books.nonEmpty, s"no .txt books under $BooksDir")
    // read each book ONCE into memory (13 MB total), pre-split to lines
    val bookLines: Seq[(String, Array[String])] = books.map { p =>
      val name = p.getFileName.toString.stripSuffix(".txt")
      val text = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      (name, text.split("\n", -1))
    }
    def writeReplica(r: Int): Long = {
      val marker = f"_r$r%04d"
      var bytes = 0L
      bookLines.foreach { case (name, lines) =>
        val f = outDir.resolve(s"${name}$marker.txt")
        if (!java.nio.file.Files.exists(f)) {
          val w = java.nio.file.Files.newBufferedWriter(f,
            java.nio.charset.StandardCharsets.UTF_8)
          try lines.foreach { ln => w.write(suffixTokens(ln, marker)); w.write("\n") }
          finally w.close()
        }
        bytes += java.nio.file.Files.size(f)
      }
      bytes
    }
    // one replica sizes them all (fixed-width marker ⇒ identical bytes)
    val perReplica = writeReplica(0)
    val nReplicas = math.max(1, math.ceil(targetBytes.toDouble / perReplica).toInt)
    // parallel generation: pure CPU (token scan) + sequential writes
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      Runtime.getRuntime.availableProcessors())
    try {
      val futs = (1 until nReplicas).map { r =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = writeReplica(r)
        })
      }
      val total = perReplica + futs.map(_.get()).sum
      (total, nReplicas, books.size)
    } finally pool.shutdown()
  }

  def main(args: Array[String]): Unit = {
    val targetMb = sys.env.getOrElse("SPARK_GRAFT_SCALE_MB", "4096").toLong
    val outRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale4g/books")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val genT0 = System.nanoTime()
    val (bytes, nReplicas, nBooks) =
      generate(java.nio.file.Paths.get(outRoot), targetMb << 20)
    val genSec = (System.nanoTime() - genT0) / 1e9

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pipeline() = graft.operators.WordStats.fromLines(
      graft.sources.ChunkedTextSource(Seq(outRoot)).load(spark))

    // untimed warmup on ONE replica's worth absorbs JVM/codegen cost
    Bench.materialize(graft.operators.WordStats.fromLines(
      graft.sources.ChunkedTextSource(Seq(outRoot), glob = "*_r0000.txt")
        .load(spark)))

    var best = Double.MaxValue
    var rows = 0L
    for (_ <- 1 to reps) {
      val t0 = System.nanoTime()
      rows = Bench.materialize(pipeline())
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec < best) best = sec
    }
    val mb = bytes / 1048576.0
    val mbPerSec = mb / best

    // golden invariant at full scale: first-seen dedup leaves no
    // duplicate (file, word_norm) — 0 rows, the reference's own audit
    val auditT0 = System.nanoTime()
    val audit = pipeline()
      .groupBy(col("file_path"),
        graft.functions.Scalars.wordNorm(col("word")).as("word_norm"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .count()
    val auditSec = (System.nanoTime() - auditT0) / 1e9

    // the reference's model rate on THIS host: t/KB = C · (8/n_cpu) ·
    // (1 + (1 − n_cpu/cpus_total)), n_cpu = 90% of cores
    // (example/main.py:54,198,207) — the honest comparison point; the
    // flat 1.95 MB/s is the published 8-CPU figure.
    val nCpu = math.max(1, (cpus.toInt * 0.9).toInt)
    val modelSecPerKb = 0.00050067901 * (8.0 / nCpu) *
      (1.0 + (1.0 - nCpu.toDouble / cpus.toInt))
    val modelMbPerSec = 1.0 / (modelSecPerKb * 1024)

    val line =
      f"""{"metric":"scale4g_wordstats_mb_per_sec","value":$mbPerSec%.2f,"unit":"MB/s","bytes":$bytes,"mb":$mb%.1f,"files":${nReplicas * nBooks},"replicas":$nReplicas,"gen_sec":$genSec%.1f,"wall_sec":$best%.2f,"reps":$reps,"rows":$rows,"dedup_audit_rows":$audit,"audit_sec":$auditSec%.2f,"baseline_published_mb_per_sec":1.95,"baseline_model_mb_per_sec":$modelMbPerSec%.2f,"x_published":${mbPerSec / 1.95}%.1f,"x_model":${mbPerSec / modelMbPerSec}%.1f,"cpus":$cpus}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALE4G.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
    if (audit != 0) sys.exit(1)
  }
}
