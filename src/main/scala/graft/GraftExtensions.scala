package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

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

  /** AnalysisException (not a raw runtime error) carrying the failing
    * expression's parse position — what a SQL user expects from a bad
    * function argument. USER_RAISED_EXCEPTION renders the message
    * verbatim. */
  private def analysisError(msg: String, at: Expression): Nothing =
    throw new AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg), at.origin)

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
        if (exprs.length != 2) analysisError(
          s"dot_product_long takes exactly 2 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(null)))
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
        if (exprs.length != 2) analysisError(
          s"distinct_shingles takes exactly 2 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(null)))
        // n: any FOLDABLE integral expression — a bare literal, but also
        // CAST(2 AS INT), 1+1, a smallint/bigint literal, … — folded at
        // registration time; non-foldable / non-integral / out-of-range
        // shapes fail analysis with the expression's position attached.
        val nExpr = exprs(1)
        // dataType on an unresolved expression throws UnresolvedException;
        // gate on resolved first so a column-reference argument gets the
        // clean position-carrying analysis message below instead.
        val n = (if (nExpr.resolved) nExpr.dataType else org.apache.spark.sql.types.NullType) match {
          case ByteType | ShortType | IntegerType | LongType if nExpr.foldable =>
            nExpr.eval() match {
              case null => analysisError("distinct_shingles: n must not be NULL", nExpr)
              case v: Byte => v.toInt
              case v: Short => v.toInt
              case v: Int => v
              case v: Long if v >= 1 && v <= Int.MaxValue => v.toInt
              case v => analysisError(s"distinct_shingles: n out of range: $v", nExpr)
            }
          case _ => analysisError(
            s"distinct_shingles: n must be a foldable integer expression, got ${nExpr.sql}",
            nExpr)
        }
        if (n < 1) analysisError(s"distinct_shingles: n must be >= 1, got $n", nExpr)
        DistinctShingles(exprs.head, n)
      }))
  }
}
