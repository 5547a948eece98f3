import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugPh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_soak_x10"
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val twins = base.where(col("doc_id") % 101 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"),
        overlay(col("payload"), lit(Array[Byte](0x00)), lit(11)).as("payload"))
    val df = base.unionByName(twins)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sigs = graft.operators.Multimodal.pHashSignatures(df, "doc_id", "payload")
      .repartition(col("doc_id"))
    t("signatures")(sigs.queryExecution.toRdd.count())
    val prim = graft.operators.NearDup.bandedHammingPairs(
      sigs.select(col("doc_id"), col("__sig0")), "doc_id",
      widthBits = 64, bands = 8, hammingMax = 6)
    t("cand+hamming")(prim.queryExecution.toRdd.count())
    t("cand distinct")(prim.distinct().queryExecution.toRdd.count())
    t("full pHashPairs")(graft.operators.Multimodal.pHashPairs(df).queryExecution.toRdd.count())
    // candidate volume before hamming filter
    val sig1 = sigs.select(col("doc_id"), col("__sig0"))
    val banded = sig1.select(col("doc_id"),
      posexplode(array((0 until 8).map { b =>
        col("__sig0").bitwiseAND(lit(255L << (8*b))).as(s"b$b")
      }: _*)).as(Seq("__bi", "__bv")))
    val nc = t("raw candidate volume")(
      banded.alias("a").join(banded.alias("b"), Seq("__bi", "__bv"))
        .filter(col("a.doc_id") < col("b.doc_id")).count())
    println("raw candidates: " + nc)
    spark.stop()
  }
}
