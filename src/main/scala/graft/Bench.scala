package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failure-honest: a query
  * that throws is recorded with ok=false and its error, and the headline
  * total only sums successful queries, so a half-broken build can never
  * report plausible-looking numbers. One untimed warmup pass (flagship
  * entry at sf0.001) absorbs JVM/codegen startup cost.
  *
  * Each query is measured as the MIN of [[Bench.Reps]] back-to-back
  * runs: a single-shot reading over a 100+-query battery records GC /
  * JIT / machine-contention spikes as if they were plan costs (r6's
  * committed file had zero-shuffle narrow projections at 17× their
  * steady-state time). Min-of-N is the standard contention-robust
  * estimator for a deterministic workload — the plan can't run FASTER
  * than its true cost, so the min converges on the plan and discards
  * the noise.
  *
  * The timed action is [[Bench.materialize]], NOT `count()`: count()
  * plans an empty-column aggregate, and for a pure-projection query
  * ColumnPruning then deletes every projected expression — the bench
  * would measure a bare parquet scan. Iterating the executed plan's
  * own RDD forces every output column of the real plan to be computed.
  */
object Bench {

  /** Full materialization of a query: produce every UnsafeRow of the
    * physical plan (all projections evaluated), driver only counts. */
  def materialize(df: DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** Timed repetitions per query; the reported time is their min.
    * Clamped to ≥1 — a zero/negative override would skip the timing
    * loop entirely and record Double.MaxValue as a "measurement". */
  val Reps: Int =
    math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try materialize(SparkEntry.entry(spark))
    catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }

    def esc(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }

    // optional comma-separated query-name filter (local iteration aid,
    // mirrors Verify's 3rd arg; the driver always runs the full battery)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // min over Reps runs; stop timing at the first failure (reps of a
      // throwing query would just re-throw and double the error path).
      var best = Double.MaxValue
      var err: Option[String] = None
      var rep = 0
      while (rep < Reps && err.isEmpty) {
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir))
        catch { case e: Throwable =>
          err = Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
        val sec = (System.nanoTime() - t0) / 1e9
        if (err.isEmpty && sec < best) best = sec
        rep += 1
      }
      (name, if (err.isEmpty) best else 0.0, err)
    }
    val qs = results.map { case (name, sec, err) =>
      val okPart = err match {
        case None    => "\"ok\":true"
        case Some(m) => "\"ok\":false,\"error\":\"" + esc(m.take(200)) + "\""
      }
      "\"" + esc(name) + "\":{\"sec\":" + f"$sec%.4f" + "," + okPart + "}"
    }.mkString("{", ",", "}")
    val okResults = results.collect { case (_, sec, None) => sec }
    val total = okResults.sum
    val nOk = okResults.size
    val n = results.size
    println(
      s"""{"metric":"total_ok","value":$total,"unit":"sec","ok_queries":$nOk,"n_queries":$n,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (nOk < n) sys.exit(1)
  }
}
