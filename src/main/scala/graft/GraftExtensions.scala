package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{DistinctShingles, DotProductLong}

/** SparkSessionExtensions entry point — the deployment hook that makes
  * the library's custom Catalyst expressions first-class SQL functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * after which `SELECT dot_product_long(qa, qb)` works in plain SQL —
  * the Scala DataFrame API reaches the same expression through
  * [[graft.operators.Embeddings.dotQ]] without any registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product_long"),
      new ExpressionInfo(
        classOf[DotProductLong].getName,
        null,
        "dot_product_long",
        "dot_product_long(a, b) - exact int64 dot product of two array<bigint> columns",
        ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_product_long takes exactly 2 arguments, got ${exprs.length}")
        DotProductLong(exprs.head, exprs(1))
      }))

    ext.injectFunction((
      FunctionIdentifier("distinct_shingles"),
      new ExpressionInfo(
        classOf[DistinctShingles].getName,
        null,
        "distinct_shingles",
        "distinct_shingles(tokens, n) - distinct word n-grams of an array<string>, first-occurrence order",
        ""),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"distinct_shingles takes exactly 2 arguments, got ${exprs.length}")
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"distinct_shingles: n must be an integer literal, got $other")
        }
        DistinctShingles(exprs.head, n)
      }))
  }
}
