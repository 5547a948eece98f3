package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Scalars

/** The reference's canonical query (SURVEY §3.4, example/main.py:59-137):
  * for each document, one row per FIRST occurrence of each distinct
  * (case/whitespace-normalized) word, carrying:
  *
  *   word           first-seen original form, truncated to 254 chars
  *   word_len       length after diacritic strip, BEFORE truncation
  *   word_truncated pre-truncation length > 255
  *   words_count    total (non-blank) tokens in the document
  *
  * Composition: Tokenize.splitTokens → Dedup.keepFirst → AttrsTransform-
  * style derivations, with words_count computed as a SHUFFLE-FREE scalar
  * expression on the un-exploded row (FoldGroup.tokenCountExpr) instead of
  * the window-count the naive translation would use. The reference reads
  * and tokenizes every file TWICE (once to count, once to dedup —
  * SURVEY §3.3); this plan scans once and shuffles once (the dedup
  * hash-aggregation), which is the 100 TB-shaped version: one wide
  * exchange keyed by (doc, word_norm), partial min_by map-side.
  */
object WordStats {

  /** `carryCols`: additional PER-DOCUMENT columns of `docs` to carry
    * through to the output unchanged (they ride the dedup shuffle as
    * extra bag keys — functionally dependent on the doc id, so the
    * grouping is unaffected). The reference's canonical sink rows carry
    * the source `file` this way (example/main.py:127,158-162). */
  def apply(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      carryCols: Seq[String] = Nil): DataFrame = {
    val base = docs
      .select((idCol +: textCol +: carryCols).map(col): _*)
      .withColumn("words_count", FoldGroup.tokenCountExpr(col(textCol)))

    val tokens = Tokenize.splitTokens(inputCol = textCol)(base)

    val firsts = Dedup.keepFirst(
      bagKeys = idCol +: "words_count" +: carryCols,
      valueCol = "word",
      orderCol = "pos")(tokens)

    firsts.select(
      col(idCol) +:
      // Pre-image semantics (SURVEY §7.4): word_len and word_truncated
      // are computed on the UN-truncated word, in the same projection
      // that truncates it.
      Scalars.truncate254(col("word")).as("word") +:
      length(Scalars.removeDiac(col("word"))).cast("long").as("word_len") +:
      Scalars.lenGt255(col("word")).as("word_truncated") +:
      col("words_count") +:
      carryCols.map(col): _*)
  }
}
