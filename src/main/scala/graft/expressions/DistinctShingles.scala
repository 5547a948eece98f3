package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingles of a token array as one native
  * expression: `["a","b","c","b","c"]`, n=2 → `["a b","b c","c b"]`
  * (first-occurrence order, i.e. exactly `array_distinct`'s order).
  *
  * Replaces the HOF chain
  * `array_distinct(transform(sequence(0, size−n), i → concat_ws(" ",
  * element_at…×n)))`, which evaluates interpreted (HOFs are
  * CodegenFallback), allocates the index sequence and the undeduped
  * gram array per row, and forces the token array to be materialized
  * as its own projection to dodge the lambda-recompute trap. This
  * expression reads the token array ONCE in a single compiled pass
  * (LinkedHashSet dedup), and its codegen is a plain static call, so
  * the surrounding WholeStageCodegen span stays intact.
  *
  * Contract: tokens contain no nulls (they come from a blank-dropping
  * split); fewer than n tokens → empty array — both per the operator
  * semantics in [[graft.operators.NearDup.shingles]].
  */
case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"shingle width must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"DistinctShingles expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    DistinctShingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DistinctShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)

  override def prettyName: String = "distinct_shingles"
}

object DistinctShingles {

  private val Space = UTF8String.fromString(" ")

  /** One compiled pass: n-gram join + first-occurrence dedup. Public
    * and static-shaped because generated code calls it directly. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](2 * n - 1)
    var k = 1
    while (k < parts.length) { parts(k) = Space; k += 2 } // sep slots
    var i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(2 * j) = tokens.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
