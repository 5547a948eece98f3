package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen
  * expression — the canonicalization pass a text-dedup pipeline runs
  * BEFORE hashing, shingling, or exact-match dedup, so that
  * canonically-equivalent byte sequences ("é" composed vs
  * "e"+U+0301 decomposed) collapse to one key. Spark has no built-in
  * for this; a Scala UDF would work but drops out of whole-stage
  * codegen and pays SerDe per row — this expression stays a plain
  * static call inside the generated loop, like the rest of
  * [[graft.expressions]].
  *
  * The hot path is allocation-conscious: pure-ASCII input (the
  * overwhelming majority of web text after markup cleaning; detected
  * with `numBytes == numChars`, an O(n) scan with no allocation) is
  * returned UNCHANGED — ASCII is invariant under all four forms. Non-
  * ASCII input pays one `toString`, an `isNormalized` check (returns
  * the original when already normalized — the common case for NFC),
  * and only actually re-encodes when normalization changes something.
  *
  * `form` is a plan-time constant (foldable string in SQL via the
  * `unicode_normalize` registration in [[graft.GraftExtensions]]), so
  * the generated call embeds the Form enum ordinal directly.
  *
  * Cross-engine note: DuckDB's `nfc_normalize` (utf8proc) and the
  * JDK's `java.text.Normalizer` both implement the Unicode canonical
  * (de)composition algorithms, so NFC output hash-matches across the
  * engines — the `text_nfc` battery entry locks this.
  */
case class UnicodeNormalize(child: Expression, form: Normalizer.Form)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String], form.ordinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.UnicodeNormalize.compute($c, ${form.ordinal})")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String =
    s"unicode_normalize_${form.name.toLowerCase(java.util.Locale.ROOT)}"
}

object UnicodeNormalize {

  private val Forms: Array[Normalizer.Form] = Normalizer.Form.values()

  /** One compiled call per row; public and static-shaped because
    * generated code calls it directly. ASCII fast path returns the
    * input object itself (zero copies); already-normalized non-ASCII
    * returns the input after the check. */
  def compute(s: UTF8String, formOrdinal: Int): UTF8String = {
    // ASCII iff every char is one byte: numChars is a scan, no alloc
    if (s.numBytes == s.numChars) return s
    val form = Forms(formOrdinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Parse a user-facing form name ("NFC", "nfkd", …); None when the
    * name is not a Unicode normalization form. */
  def formOf(name: String): Option[Normalizer.Form] =
    Forms.find(_.name.equalsIgnoreCase(name))
}
