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
  * Null contract: the declared output type is containsNull=false and
  * compute() upholds it — null ELEMENTS (unreachable from
  * [[graft.operators.NearDup.shingles]]' blank-dropping split, but
  * legal input via the GraftExtensions SQL registration) are ignored,
  * i.e. grams are formed over the non-null tokens only. The null scan
  * is emitted only when the child's array type declares containsNull,
  * so the operator hot path is unchanged. Fewer than n (non-null)
  * tokens → empty array.
  */
case class DistinctShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // plan-time constant; lazy val so the interpreted path doesn't
  // re-derive it per row
  private lazy val nullableElems: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"shingle width must be >= 1, got $n")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"DistinctShingles expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    DistinctShingles.compute(input.asInstanceOf[ArrayData], n, nullableElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DistinctShingles.compute($c, $n, $nullableElems)")

  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)

  override def prettyName: String = "distinct_shingles"
}

object DistinctShingles {

  private val Space = UTF8String.fromString(" ")

  /** One compiled pass: n-gram join + first-occurrence dedup. Public
    * and static-shaped because generated code calls it directly.
    * `nullableElems` (a plan-time constant in the generated call) adds
    * a null-compaction prepass so the output NEVER contains null —
    * matching the declared containsNull=false. */
  def compute(tokens: ArrayData, n: Int, nullableElems: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](2 * n - 1)
    var k = 1
    while (k < parts.length) { parts(k) = Space; k += 2 } // sep slots
    if (nullableElems) {
      // grams over the non-null tokens only (null = absent)
      val compact = new Array[UTF8String](len)
      var m = 0
      var t = 0
      while (t < len) {
        if (!tokens.isNullAt(t)) { compact(m) = tokens.getUTF8String(t); m += 1 }
        t += 1
      }
      if (m < n) return new GenericArrayData(Array.empty[Any])
      var i = 0
      while (i <= m - n) {
        var j = 0
        while (j < n) { parts(2 * j) = compact(i + j); j += 1 }
        seen.add(UTF8String.concat(parts: _*))
        i += 1
      }
    } else {
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { parts(2 * j) = tokens.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concat(parts: _*))
        i += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}
