package graft.dev

import org.apache.spark.sql.SparkSession

/** Ad-hoc measured-experiment runner behind SCALE.md's numbers — the
  * walls recorded there must be reproducible, so the probes live in
  * the repo instead of a throwaway shell. Each probe is a named
  * experiment; run as:
  *
  *   sbt "runMain graft.dev.ScaleProbe <probe> [sfDir]"
  *
  * Probes time with a warmup pass and report min-of-2 (the bench's
  * own discipline). Not part of the battery; Verify/Bench never call
  * this.
  */
object ScaleProbe {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def minOf2(body: => Long): (Double, Long) = {
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val a = once(); val b = once()
    (math.min(a._1, b._1), b._2)
  }

  def main(args: Array[String]): Unit = {
    val probe = args.headOption.getOrElse("bpe_k64")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = session()
    probe match {
      case "bpe_k64" =>
        // batched (maxBatch=16) vs sequential (maxBatch=1) BPE training
        // wall at k=64 on the documents word dict — the driver-loop
        // round count is the variable under test, so the dict is
        // checkpointed once and shared.
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        val dict = graft.operators.Bpe.wordDict(docs).localCheckpoint()
        graft.operators.Bpe.trainMerges(dict, 4, maxBatch = 1).count() // warmup
        val (seqSec, seqN) =
          minOf2(graft.operators.Bpe.trainMerges(dict, 64, maxBatch = 1).count())
        val (batSec, batN) =
          minOf2(graft.operators.Bpe.trainMerges(dict, 64, maxBatch = 16).count())
        val same = {
          val a = graft.operators.Bpe.trainMerges(dict, 64, maxBatch = 1)
            .collect().map(_.toString).sorted.toSeq
          val b = graft.operators.Bpe.trainMerges(dict, 64, maxBatch = 16)
            .collect().map(_.toString).sorted.toSeq
          a == b
        }
        println(f"""{"probe":"bpe_k64","sequential_sec":$seqSec%.2f,"batched_sec":$batSec%.2f,"merges":$seqN,"merges_batched":$batN,"equal":$same}""")
      case "frontier_wall" =>
        // per-cell SEARCH wall for emb_ann_frontier's 2×2×2 dial grid
        // (m × nprobe × refine) — the axis the hash-matched battery
        // row cannot carry (wall time is host-dependent). Together
        // with the frontier's recall_permille and n_candidates this
        // completes the recall-vs-cost table in SCALE.md. Each cell
        // times ONLY Embeddings.annIvfPq (the serving search), with
        // the corpus and dials identical to the battery cell.
        import graft.operators.Embeddings
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val q = org.apache.spark.sql.functions.col("vec_id") % 20 === 0
        val mStep = Seq(
          Embeddings.PqSubspaces ->
            Embeddings.stepForBoundedK(emb.count(), graft.SparkEntry.PqCodebookK),
          graft.SparkEntry.ScaledPqSubspaces ->
            Embeddings.stepForBoundedK(emb.count(), graft.SparkEntry.ScaledPqCodebookK))
        val cells = for {
          (m, step) <- mStep
          nprobe <- Seq(1, graft.SparkEntry.IvfPqNprobe)
          refine <- Seq(Option.empty[Int], Some(graft.SparkEntry.IvfPqRefine))
        } yield {
          val (sec, n) = minOf2(
            Embeddings.annIvfPq(emb, q, m = m, pqStep = Some(step),
              nprobe = nprobe, refine = refine).count())
          s"""{"m":$m,"nprobe":$nprobe,"refine":${refine.getOrElse(0)},""" +
            f""""sec":$sec%.2f,"rows":$n}"""
        }
        println(s"""{"probe":"frontier_wall","cells":[${cells.mkString(",")}]}""")
      case "explain" =>
        // print the EXECUTED adaptive plan of a named battery query
        // (args: explain <query> [sfDir]) — AQE finalizes reuse
        // decisions only at execution, so an unexecuted .explain can
        // lie about ReusedExchange.
        val name = args.lift(1).getOrElse(sys.error("explain <query> [sfDir]"))
        val dir2 = args.lift(2).getOrElse("/root/testdata/sf0.01")
        val df = graft.SparkEntry.queries(name)(spark, dir2)
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString)
      case other =>
        System.err.println(s"unknown probe: $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
