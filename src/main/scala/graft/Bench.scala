package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Failure-honest: a query
  * that throws is recorded with ok=false and its error, and the headline
  * total only sums successful queries, so a half-broken build can never
  * report plausible-looking numbers. One untimed warmup pass (flagship
  * entry at sf0.001) absorbs JVM/codegen startup cost.
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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { materialize(fn(spark, sfDir)); None }
        catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, sec, err)
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
