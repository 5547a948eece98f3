package graft

import org.apache.spark.sql.functions._

import graft.sinks.JdbcSink

/** End-to-end execution of the JDBC sink against embedded Derby (the
  * only database in the sandbox — its driver ships with Spark's jars).
  * This exercises the MySQL_DBLoader parity path
  * (tiny_etl/loaders/mysql.py:10-135) for real: table auto-creation,
  * append mode, `batchsize` batching and `numPartitions` as the
  * LoadBalanceLoader-style concurrent-connection fan-out.
  */
class JdbcDerbySpec extends SparkSpecBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  // keep Derby's log out of the repo root
  System.setProperty("derby.stream.error.file",
    java.nio.file.Files.createTempDirectory("graft_derby").resolve("derby.log").toString)

  private def readBack(table: String) =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()

  test("JdbcSink writes through Derby and reads back identically") {
    import spark.implicits._
    val df = (0 until 500)
      .map(i => (i.toLong, s"word_$i", (i % 37).toLong))
      .toDF("doc_id", "word", "words_count")

    // batchSize 64 forces multiple JDBC batches per partition;
    // numPartitions 3 is the reference's N-concurrent-connections dial.
    JdbcSink(url, "wordstats_out", "app", "app",
      batchSize = 64, numPartitions = 3).write(df)

    val back = readBack("wordstats_out")
    assert(back.count() === 500)
    val got = back.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("JdbcSink append mode accumulates across writes (reference append parity)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"w$i")).toDF("id", "w")
    val sink = JdbcSink(url, "append_out", "app", "app", batchSize = 32, numPartitions = 2)
    sink.write(df)
    sink.write(df)
    val back = readBack("append_out")
    assert(back.count() === 200)
    // every key appears exactly twice — append, not overwrite/dedup
    val counts = back.groupBy(col("id")).count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).toSet === Set(2L))
  }
}
