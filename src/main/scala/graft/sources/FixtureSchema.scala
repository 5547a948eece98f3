package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Guard for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Round 8 lost 18 queries to a silent driver-side regen that changed
  * `events.ts` from parquet TIMESTAMP(NANOS) (int64 via nanosAsLong) to
  * naive timestamp[us] (TIMESTAMP_NTZ): every failure surfaced as a
  * generic analysis error 18 queries deep. This guard exists so the NEXT
  * physical-encoding drift fails loudly, first, and names the column.
  *
  * Expectations are deliberately tolerant of known-equivalent physical
  * encodings (the read seams normalize them — see
  * [[graft.SparkEntry.normalizeEventTs]]): integer key columns may widen
  * int32↔int64, timestamp columns may arrive as TIMESTAMP, TIMESTAMP_NTZ,
  * or int64 epoch-nanos. Column NAMES and value families must not drift.
  */
object FixtureSchema {

  /** Acceptable type families, keyed by intent. */
  private val Int: DataType => Boolean = {
    case IntegerType | LongType => true; case _ => false
  }
  private val Str: DataType => Boolean = _ == StringType
  private val Dbl: DataType => Boolean = _ == DoubleType
  private val Ts: DataType => Boolean = {
    // TIMESTAMP, TIMESTAMP_NTZ, or int64 epoch-nanos (nanosAsLong)
    case TimestampType | TimestampNTZType | LongType => true
    case _ => false
  }
  private val FloatVec: DataType => Boolean = {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  /** table -> ordered (column, family-name, acceptable types). */
  val Expected: Map[String, Seq[(String, String, DataType => Boolean)]] = Map(
    "region" -> Seq(
      ("r_regionkey", "int", Int), ("r_name", "string", Str)),
    "nation" -> Seq(
      ("n_nationkey", "int", Int), ("n_name", "string", Str),
      ("n_regionkey", "int", Int)),
    "customer" -> Seq(
      ("c_custkey", "int", Int), ("c_name", "string", Str),
      ("c_nationkey", "int", Int), ("c_acctbal", "double", Dbl),
      ("c_mktsegment", "string", Str)),
    "supplier" -> Seq(
      ("s_suppkey", "int", Int), ("s_name", "string", Str),
      ("s_nationkey", "int", Int), ("s_acctbal", "double", Dbl)),
    "part" -> Seq(
      ("p_partkey", "int", Int), ("p_name", "string", Str),
      ("p_brand", "string", Str), ("p_type", "string", Str),
      ("p_size", "int", Int), ("p_retailprice", "double", Dbl)),
    "orders" -> Seq(
      ("o_orderkey", "int", Int), ("o_custkey", "int", Int),
      ("o_orderstatus", "string", Str), ("o_totalprice", "double", Dbl),
      ("o_orderdate", "timestamp", Ts), ("o_orderpriority", "string", Str)),
    "lineitem" -> Seq(
      ("l_orderkey", "int", Int), ("l_partkey", "int", Int),
      ("l_suppkey", "int", Int), ("l_linenumber", "int", Int),
      ("l_quantity", "double", Dbl), ("l_extendedprice", "double", Dbl),
      ("l_discount", "double", Dbl), ("l_tax", "double", Dbl),
      ("l_returnflag", "string", Str), ("l_linestatus", "string", Str),
      ("l_shipdate", "timestamp", Ts)),
    "events" -> Seq(
      ("event_id", "int", Int), ("ts", "timestamp", Ts),
      ("user_id", "int", Int), ("event_type", "string", Str),
      ("value", "double", Dbl), ("props", "string", Str)),
    "documents" -> Seq(
      ("doc_id", "int", Int), ("text", "string", Str),
      ("lang", "string", Str), ("source", "string", Str),
      ("n_chars", "int", Int)),
    "embeddings" -> Seq(
      ("vec_id", "int", Int), ("embedding", "array<float>", FloatVec),
      ("label", "int", Int)))

  /** One human-readable violation line per drifted/missing/extra column;
    * empty = fixtures are within the tolerated encodings. */
  def check(spark: SparkSession, sfDir: String): Seq[String] =
    Expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      val observed =
        try Right(spark.read.parquet(path).schema)
        catch { case e: Exception => Left(s"$table: unreadable: ${e.getMessage}") }
      observed match {
        case Left(err) => Seq(err)
        case Right(schema) =>
          val byName = schema.fields.map(f => f.name -> f.dataType).toMap
          val missing = cols.collect {
            case (c, fam, _) if !byName.contains(c) =>
              s"$table.$c: MISSING (expected $fam); observed columns " +
                schema.fieldNames.mkString("[", ", ", "]")
          }
          val drifted = cols.collect {
            case (c, fam, ok) if byName.contains(c) && !ok(byName(c)) =>
              s"$table.$c: DRIFTED to ${byName(c).sql} (expected family " +
                s"$fam) — update the read seam (SparkEntry/normalizeEventTs) " +
                "for this encoding"
          }
          val extra = schema.fieldNames.filterNot(cols.map(_._1).contains)
            .map(c => s"$table.$c: UNEXPECTED extra column (${byName(c).sql})")
          missing ++ drifted ++ extra
      }
    }
}
