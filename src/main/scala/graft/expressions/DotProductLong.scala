package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `array<bigint>` columns as a
  * native codegen'd Catalyst expression.
  *
  * Why this exists: the composable form
  * `aggregate(zip_with(a, b, _ * _), 0L, _ + _)` is correct but built
  * from higher-order functions, which (a) allocate an intermediate
  * zipped array per row and (b) are CodegenFallback — they evaluate
  * interpreted and break the surrounding WholeStageCodegen span. In
  * the similarity operators the dot product runs once per CANDIDATE
  * PAIR (≫ corpus size), so it is the single hottest scalar in the
  * library; this expression compiles to a bare fused multiply-add
  * loop over the two ArrayData, no allocation, inside whole-stage
  * codegen. Values are bit-identical to the HOF form on the operator
  * contract's inputs (non-null elements, equal lengths — quantized
  * vectors): the same left-to-right exact int64 summation.
  *
  * Null contract: a null ARRAY on either side yields null (standard
  * BinaryExpression null-intolerance); a null ELEMENT contributes 0 to
  * the sum (its product term is skipped). The null-element check is
  * emitted only when an input's array type declares containsNull —
  * quantized vectors never do, so the hot path keeps the bare FMA
  * loop. Unequal lengths dot the common prefix.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  /** Whether any input may hold null elements (SQL-reachable via the
    * GraftExtensions registration); decides interpreted and codegen
    * loop shape at plan time. A plan-time constant, so a lazy val —
    * the interpreted path calls it once per ROW otherwise. */
  private lazy val nullableElems: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DotProductLong expects two array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!nullableElems || (!x.isNullAt(i) && !y.isNullAt(i))) {
        acc += x.getLong(i) * y.getLong(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("dotN")
      val i = ctx.freshName("dotI")
      val acc = ctx.freshName("dotAcc")
      val term = s"$acc += $x.getLong($i) * $y.getLong($i);"
      val body =
        if (nullableElems) s"if (!$x.isNullAt($i) && !$y.isNullAt($i)) { $term }"
        else term
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $body
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product_long"
}
