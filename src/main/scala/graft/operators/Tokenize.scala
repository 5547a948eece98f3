package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.api.Transform

/** Tokenizers — Spark forms of AbstractTextWordTokenizerTransformer /
  * TextWordTokenizerTransformer (tiny_etl/transformers/text.py:8-71) and
  * ArabicTextWordsTokenizerTransformer (example/arabic_transformers.py:6-22).
  *
  * The reference's per-token pipeline is: split → strip remove_chars →
  * mapper fn-chain → drop tokens failing ignore_word_fn. All of it maps
  * to posexplode + translate + expression chain + filter — one narrow,
  * fully codegen'd stage, no UDFs, no shuffle.
  *
  * We keep the token POSITION (`pos`) from posexplode: the reference's
  * first-seen dedup semantics (SURVEY §7.4) need a deterministic in-file
  * order, and generators give the reference that order for free; in Spark
  * it must be an explicit column.
  */
object Tokenize {

  /** Regex-split tokenizer. `pattern` is the split regex (the canonical
    * pipeline uses "\\s+", example/main.py:82-86). Emits
    * (inputCols..., pos, outputCol) one row per kept token.
    *
    * Note the Python `re.split` edge (SURVEY §7.4): leading whitespace
    * yields a leading "" token — Spark's `split` does the same; both are
    * dropped by the blank filter, keeping parity.
    */
  def splitTokens(
      inputCol: String,
      outputCol: String = "word",
      pattern: String = "\\s+",
      removeChars: String = "",
      mappers: Seq[Column => Column] = Nil,
      keep: Column => Column = c => !graft.functions.Scalars.isBlank(c)): Transform = { df =>
    val carried = df.columns.filterNot(_ == inputCol).map(col).toSeq
    val stripped =
      if (removeChars.isEmpty) col("tok")
      else translate(col("tok"), removeChars, "")
    val mapped = mappers.foldLeft(stripped)((c, f) => f(c))
    df.select(carried :+ posexplode(split(col(inputCol), pattern)).as(Seq("pos", "tok")): _*)
      .withColumn(outputCol, mapped)
      .filter(keep(col(outputCol)))
      .drop("tok")
  }

  /** Arabic-script tokenizer — regexp_extract_all over the Arabic block
    * then an inner whitespace split/drop-blank, matching
    * example/arabic_transformers.py:10-22 (`re.findall('[ء-ي…]+')` plus
    * inner split). The findall form never yields empties, so only the
    * whitespace re-split needs the blank filter.
    */
  def arabicTokens(
      inputCol: String,
      outputCol: String = "word",
      stripDiacritics: Boolean = true): Transform = { df =>
    val carried = df.columns.filterNot(_ == inputCol).map(col).toSeq
    val arabicRun = "[\\u0621-\\u064A\\u064B-\\u0652\\u0660-\\u0669\\u0670-\\u06D3]+"
    val word =
      if (stripDiacritics) graft.functions.Scalars.removeDiac(col("tok"))
      else col("tok")
    df.select(
        carried :+ posexplode(regexp_extract_all(col(inputCol), lit(arabicRun), lit(0)))
          .as(Seq("pos", "tok")): _*)
      .withColumn(outputCol, word)
      .filter(length(col(outputCol)) > 0)
      .drop("tok")
  }
}
