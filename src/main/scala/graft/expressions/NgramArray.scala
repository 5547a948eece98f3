package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ALL word-n-gram shingles of a token array, in document order and
  * WITH multiplicity: `["a","b","c","b","c"]`, n=2 →
  * `["a b","b c","c b","b c"]`. The positional sibling of
  * [[DistinctShingles]]: `posexplode` over this array recovers each
  * gram's 0-based start offset, which is what span-level operators
  * (duplicated-substring detection, winnowing windows) need and the
  * deduped set cannot provide.
  *
  * Same rationale as [[DistinctShingles]]: the equivalent HOF chain
  * (`transform(sequence…)` + `element_at`×n) is CodegenFallback and
  * re-evaluates the token-array child per lambda element unless it is
  * first materialized as its own projection; this expression reads the
  * array once in a compiled pass and keeps the surrounding
  * WholeStageCodegen span intact.
  *
  * Null contract: identical to [[DistinctShingles]] — output declares
  * containsNull=false, null ELEMENTS are compacted away before gram
  * formation (positions are over the non-null tokens), and the null
  * scan is only emitted when the child type declares containsNull.
  * Fewer than n usable tokens → empty array.
  */
case class NgramArray(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

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
        s"NgramArray expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramArray.compute(input.asInstanceOf[ArrayData], n, nullableElems)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NgramArray.compute($c, $n, $nullableElems)")

  override protected def withNewChildInternal(newChild: Expression): NgramArray =
    copy(child = newChild)

  override def prettyName: String = "ngram_array"
}

object NgramArray {

  private val Space = UTF8String.fromString(" ")

  /** One compiled pass, order- and multiplicity-preserving. Public and
    * static-shaped because generated code calls it directly. */
  def compute(tokens: ArrayData, n: Int, nullableElems: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](2 * n - 1)
    var k = 1
    while (k < parts.length) { parts(k) = Space; k += 2 } // sep slots
    val toks: Array[UTF8String] =
      if (nullableElems) {
        val compact = new Array[UTF8String](len)
        var m = 0
        var t = 0
        while (t < len) {
          if (!tokens.isNullAt(t)) { compact(m) = tokens.getUTF8String(t); m += 1 }
          t += 1
        }
        java.util.Arrays.copyOf(compact, m)
      } else {
        val all = new Array[UTF8String](len)
        var t = 0
        while (t < len) { all(t) = tokens.getUTF8String(t); t += 1 }
        all
      }
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      var j = 0
      while (j < n) { parts(2 * j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}
