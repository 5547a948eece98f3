package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

import graft.sources.FixtureSchema

/** The fixture-schema guard: fails loudly, naming the drifted column,
  * before a driver-side fixture regen can surface as generic analysis
  * errors deep inside the query battery (the round-8 events.ts lesson). */
class FixtureSchemaSpec extends SparkSpecBase {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  for (dir <- sfDirs)
    test(s"fixtures at $dir are within the tolerated encodings") {
      val violations = FixtureSchema.check(spark, dir)
      assert(violations.isEmpty, violations.mkString("\n  ", "\n  ", ""))
    }

  test("normalizeEventTs lands every tolerated ts encoding on TimestampType micros") {
    import spark.implicits._
    // one µs-aligned instant in all four physical encodings — a bare
    // int64 carries no unit, so nanos vs micros dispatches on per-row
    // magnitude (≥ 10¹⁷ ⇒ nanos: post-1973 as nanos, pre-5138 as micros)
    val micros = 1_767_225_600_123_456L // 2026-01-01T00:00:00.123456Z
    val asNanos = Seq((1L, micros * 1000)).toDF("event_id", "ts")
    val asMicros = Seq((1L, micros)).toDF("event_id", "ts")
    val asNtz = Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    val asLtz = Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    for (df <- Seq(asNanos, asMicros, asNtz, asLtz)) {
      val out = SparkEntry.normalizeEventTs(df)
      assert(out.schema("ts").dataType === TimestampType)
      assert(out.select(unix_micros(col("ts"))).head().getLong(0) === micros)
    }
  }

  test("normalizeEventTs rejects an unknown ts encoding with a named diagnosis") {
    import spark.implicits._
    val bad = Seq((1L, "2026-01-01")).toDF("event_id", "ts")
    assert(bad.schema("ts").dataType === StringType)
    val e = intercept[IllegalArgumentException](SparkEntry.normalizeEventTs(bad))
    assert(e.getMessage.contains("'ts'"))
  }

  test("the live events fixture normalizes to the schema the battery expects") {
    val ev = SparkEntry.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("event_id").dataType === LongType)
    assert(ev.limit(1).count() === 1L)
  }
}
