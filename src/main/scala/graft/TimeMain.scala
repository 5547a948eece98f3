import org.apache.spark.sql.SparkSession

/** Dev tool: run named SparkEntry queries N times in one session to
  * separate steady-state cost from first-run planning/codegen cost.
  * Usage: runMain TimeMain <sfDir> <reps> <query...> */
object TimeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(2)) {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // same full-materialization action as graft.Bench — count() would
        // let ColumnPruning delete pure-projection work
        graft.Bench.materialize(graft.SparkEntry.queries(q)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $q: ${times.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
