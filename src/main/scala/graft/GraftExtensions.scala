package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import org.apache.spark.sql.catalyst.expressions.{Add, BitwiseAnd, BitwiseOr, CaseWhen, Cast, Floor, GreaterThan, Least, LessThanOrEqual, Literal, Multiply, Remainder, ShiftLeft, ShiftRight, Sqrt, Subtract}
import org.apache.spark.sql.types.DoubleType

import graft.expressions.{DistinctShingles, DotProductLong, UnicodeNormalize}

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
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
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
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
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

    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(
        classOf[UnicodeNormalize].getName,
        null,
        "unicode_normalize",
        "unicode_normalize(str, form) - Unicode-normalize a string; form is a " +
          "foldable string in ('NFC','NFD','NFKC','NFKD')",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) analysisError(
          s"unicode_normalize takes exactly 2 arguments, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        val formExpr = exprs(1)
        val form = (if (formExpr.resolved) formExpr.dataType
          else org.apache.spark.sql.types.NullType) match {
          case org.apache.spark.sql.types.StringType if formExpr.foldable =>
            formExpr.eval() match {
              case null => analysisError(
                "unicode_normalize: form must not be NULL", formExpr)
              case v => UnicodeNormalize.formOf(v.toString).getOrElse(
                analysisError(
                  s"unicode_normalize: unknown normalization form '$v' " +
                    "(expected NFC, NFD, NFKC or NFKD)", formExpr))
            }
          case _ => analysisError(
            s"unicode_normalize: form must be a foldable string literal, got ${formExpr.sql}",
            formExpr)
        }
        UnicodeNormalize(exprs.head, form)
      }))

    // The determinism primitives, composed from built-in CATALYST
    // arithmetic (a Column-bridge composition would hand the registry
    // unresolved ColumnNodes — registry builders must return plain
    // expression trees, which the analyzer then type-coerces). The
    // constants come from the same single sources the Scala operators
    // use, so the SQL surface can never drift.
    ext.injectFunction((
      FunctionIdentifier("hash_order"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "hash_order",
        "hash_order(id) - the deterministic multiplicative-hash shuffle order of an int64 id",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) analysisError(
          s"hash_order takes exactly 1 argument, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        new Remainder(
          new Multiply(
            new Remainder(exprs.head, Literal(2147483647L)),
            Literal(graft.operators.Curation.HashMul)),
          Literal(4294967296L))
      }))

    ext.injectFunction((
      FunctionIdentifier("z_value"),
      new ExpressionInfo(
        graft.operators.Layout.getClass.getName,
        null,
        "z_value",
        "z_value(bits, d1, d2, ...) - Morton bit-interleave of dimensions already in [0, 2^bits)",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length < 2) analysisError(
          s"z_value takes a bits literal plus at least 1 dimension, got ${exprs.length} arguments",
          exprs.headOption.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(null)))
        val bitsExpr = exprs.head
        val bits = (if (bitsExpr.resolved) bitsExpr.dataType
          else org.apache.spark.sql.types.NullType) match {
          case ByteType | ShortType | IntegerType | LongType if bitsExpr.foldable =>
            bitsExpr.eval() match {
              case null => analysisError("z_value: bits must not be NULL", bitsExpr)
              case v: Byte => v.toInt
              case v: Short => v.toInt
              case v: Int => v
              case v: Long if v >= 1 && v <= 62 => v.toInt
              case v => analysisError(s"z_value: bits out of range: $v", bitsExpr)
            }
          case _ => analysisError(
            s"z_value: bits must be a foldable integer expression, got ${bitsExpr.sql}",
            bitsExpr)
        }
        val dims = exprs.tail
        if (bits * dims.size > 62) analysisError(
          s"z_value: bits * dims = ${bits * dims.size} exceeds int64", bitsExpr)
        val d = dims.size
        val terms = for {
          j <- 0 until bits
          (c, i) <- dims.zipWithIndex
        } yield ShiftLeft(
          BitwiseAnd(ShiftRight(c, Literal(j)), Literal(1L)),
          Literal(j * d + i))
        terms.reduce[Expression]((a, b) => BitwiseOr(a, b))
      }))

    ext.injectFunction((
      FunctionIdentifier("isqrt"),
      new ExpressionInfo(
        graft.operators.Curation.getClass.getName,
        null,
        "isqrt",
        "isqrt(n) - exact integer square root of a non-negative int64 " +
          "(float estimate + overflow-safe correction; engine-exact)",
        "", "", "", "misc_funcs", "1.0.0", "", "built-in"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) analysisError(
          s"isqrt takes exactly 1 argument, got ${exprs.length}",
          exprs.headOption.getOrElse(Literal(null)))
        // the same capped-correction tree as Curation.isqrt — candidates
        // clamp at floor(sqrt(Long.MaxValue)) so the squared probes
        // cannot overflow under ANSI mode
        val n = exprs.head
        val cap = Literal(3037000499L)
        val s0 = Least(Seq(Floor(Sqrt(Cast(n, DoubleType))), cap))
        val m = Least(Seq(Add(s0, Literal(1L)), cap))
        val s1 = CaseWhen(Seq((LessThanOrEqual(Multiply(m, m), n), m)), Some(s0))
        CaseWhen(
          Seq((GreaterThan(Multiply(s1, s1), n), Subtract(s1, Literal(1L)))),
          Some(s1))
      }))
  }
}
