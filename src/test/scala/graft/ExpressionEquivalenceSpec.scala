package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.{DistinctShingles, DotProductLong}
import org.apache.spark.sql.graft.ColumnAdapter

/** Randomized (fixed-seed) equivalence harness for the custom codegen
  * expressions: each must be indistinguishable from the composable HOF
  * form it replaced, on arbitrary inputs — the property that justifies
  * calling them an optimization rather than a semantic change. Inputs
  * run through actual Spark plans (codegen path), not expression eval.
  */
class ExpressionEquivalenceSpec extends SparkSpecBase {

  private def dotNative(a: Column, b: Column): Column =
    ColumnAdapter.column(DotProductLong(
      ColumnAdapter.expression(a), ColumnAdapter.expression(b)))

  private def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private def shinglesNative(toks: Column, n: Int): Column =
    ColumnAdapter.column(DistinctShingles(ColumnAdapter.expression(toks), n))

  private def shinglesHof(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  test("DotProductLong equals the HOF dot on random equal-length vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val rows = (0 until 500).map { _ =>
      val d = 1 + rnd.nextInt(48)
      def vec() = Array.fill(d)(rnd.nextLong() % 10000000L)
      (vec(), vec())
    }
    val df = rows.toDF("a", "b")
      .select(dotNative(col("a"), col("b")).as("n"),
        dotHof(col("a"), col("b")).as("h"))
    assert(df.filter(col("n") =!= col("h")).count() === 0)
  }

  test("DistinctShingles equals the HOF chain on random token arrays") {
    import spark.implicits._
    // small vocab on purpose: forces duplicate tokens AND duplicate
    // shingles, so the first-occurrence dedup order is actually
    // exercised; includes multi-byte UTF-8 tokens
    val vocab = Vector("a", "b", "c", "ab", "xyz", "Ω≠", "7")
    val rnd = new scala.util.Random(4242L)
    val docs = (0 until 400).map { _ =>
      Array.fill(rnd.nextInt(31))(vocab(rnd.nextInt(vocab.size)))
    }
    for (n <- Seq(1, 2, 3, 5)) {
      val df = docs.toDF("toks")
        .select(shinglesNative(col("toks"), n).as("nat"),
          shinglesHof(col("toks"), n).as("hof"))
      assert(df.filter(col("nat") =!= col("hof")).count() === 0,
        s"mismatch at n=$n")
    }
  }

  test("null elements: DotProductLong skips the term, DistinctShingles ignores the token") {
    // null-element arrays are SQL-reachable through the registered
    // functions; the operators themselves never produce them. The
    // declared output contract must hold anyway: dot treats a null
    // component pair as 0, shingles grams over non-null tokens only
    // (so the declared containsNull=false is actually true).
    val df = spark.sql(
      """SELECT array(1L, NULL, 3L) AS a, array(4L, 5L, NULL) AS b,
        |       array('a', NULL, 'b', 'c') AS t""".stripMargin)
    val got = df.select(
      dotNative(col("a"), col("b")).as("d"),
      shinglesNative(col("t"), 2).as("s")).head
    assert(got.getLong(0) === 4L) // 1·4 + skip + skip
    assert(got.getSeq[String](1) === Seq("a b", "b c"))
    assert(!got.getSeq[String](1).contains(null))
  }
}
