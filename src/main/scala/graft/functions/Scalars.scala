package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library — Spark-native forms of the reference's mapper
  * functions (tiny_etl/commons.py:138-173, example/arabic_transformers.py:24-30).
  *
  * Everything here is a composition of built-in, codegen'd
  * `org.apache.spark.sql.functions` — no UDFs, so each stays inside
  * whole-stage codegen and remains pushdown/prune friendly.
  */
object Scalars {

  /** Truncate to 254 chars — reproducing the reference's off-by-one:
    * `truncate_str_255` keeps 254 (tiny_etl/commons.py:163-164
    * `txt[0:min(254, len(txt))]`). Oracle parity requires 254, not 255.
    */
  def truncate254(c: Column): Column = substring(c, 1, 254)

  /** Truncate to 269 chars — `truncate_str_270` keeps 269
    * (tiny_etl/commons.py:166-167). */
  def truncate269(c: Column): Column = substring(c, 1, 269)

  /** Pre-truncation length flag — `len_str_gt_255` (tiny_etl/commons.py:169-170). */
  def lenGt255(c: Column): Column = length(c) > 255

  /** `len_str_gt_270` (tiny_etl/commons.py:172-173). */
  def lenGt270(c: Column): Column = length(c) > 270

  /** Keep only the last `n` path components, '/'-joined — the reference's
    * `basename_backwards` family (tiny_etl/commons.py:138-161; the example
    * pipeline uses x4 ⇒ 5 components, example/main.py:127).
    *
    * `slice` with a negative start counts from the end; when the path has
    * fewer than `n` components slice(-n) would misbehave, so clamp via
    * greatest(1, size-n+1) on a positive start index.
    */
  def lastPathComponents(c: Column, n: Int): Column = {
    val parts = split(c, "/")
    val start = greatest(lit(1), size(parts) - lit(n - 1))
    concat_ws("/", slice(parts, start, lit(n)))
  }

  /** The 8 Arabic diacritic marks the reference strips
    * (example/arabic_transformers.py:24-30 `remove_diac`):
    * fathatan, dammatan, kasratan, fatha, damma, kasra, shadda, sukun.
    */
  val ArabicDiacritics: String =
    "ًٌٍَُِّْ"

  /** Strip Arabic diacritics — built-in `translate`, no UDF
    * (maps example/arabic_transformers.py:24-30). */
  def removeDiac(c: Column): Column = translate(c, ArabicDiacritics, "")

  /** Case/whitespace normalization used as the dedup key in the canonical
    * pipeline (example/main.py:98: str.lower + str.strip as
    * unique_value_normalizers). */
  def wordNorm(c: Column): Column = lower(trim(c))

  /** Whitespace-or-empty predicate — the reference's ignore_word_fn
    * (`str.isspace` plus empty-string drop, example/main.py:111-112). */
  def isBlank(c: Column): Column = (c === "") || c.rlike("^\\s+$")

  /** Unicode-normalize a string column ([[graft.expressions.UnicodeNormalize]]
    * — codegen'd, ASCII fast path): the canonicalization every hash/
    * shingle/exact-dedup key should pass through so canonically-
    * equivalent byte sequences collapse. `form` ∈ NFC/NFD/NFKC/NFKD. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.ColumnAdapter.column(
      graft.expressions.UnicodeNormalize(
        org.apache.spark.sql.graft.ColumnAdapter.expression(c),
        graft.expressions.UnicodeNormalize.formOf(form).getOrElse(
          throw new IllegalArgumentException(
            s"unknown Unicode normalization form '$form'"))))
}
