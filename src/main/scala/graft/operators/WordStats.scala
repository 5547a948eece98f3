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

  /** The same per-file word stats computed DIRECTLY from splittable
    * line rows — the 100 TB form of [[apply]] for huge files: input is
    * `(idCol, orderCol, lineCol)` (e.g.
    * [[graft.sources.ChunkedTextSource]]'s `(file_path, byte_offset,
    * line)`), and no task ever materializes a whole file. Whitespace
    * tokenization cannot span a line boundary, so tokenizing each line
    * and ordering tokens by `(orderCol, position-in-line)` reproduces
    * the whole-text token stream exactly: first-occurrence dedup and
    * the total token count — hence every output row — equal
    * [[apply]]'s over the reassembled content (GoldenCorpusSpec pins
    * the equality on the books corpus; the wordstats_chunked battery
    * entry pins it against the unchanged DuckDB wordstats oracle).
    *
    * Plan shape: one narrow tokenize stage, then TWO aggregations
    * instead of [[apply]]'s one — the per-file token total can no
    * longer be a shuffle-free scalar on the un-exploded row (the row
    * is a line, not the document), so it is its own `groupBy(id)`
    * count joined back onto the dedup output (one row per file — the
    * small side of that join). `orderCol` must totally order a file's
    * lines (byte offsets do); ties across lines would make
    * first-occurrence nondeterministic. */
  def fromLines(
      lines: DataFrame,
      idCol: String = "file_path",
      orderCol: String = "byte_offset",
      lineCol: String = "line"): DataFrame = {
    val ordC = graft.core.Cols.fresh("__ord", lines.columns.toSeq ++ Seq("pos", "word"))
    val tokens = Tokenize.splitTokens(inputCol = lineCol)(
      lines.select(idCol, orderCol, lineCol))
      .withColumn(ordC, struct(col(orderCol), col("pos")))
      .drop(orderCol, "pos")

    val counts = tokens.groupBy(col(idCol))
      .agg(count(lit(1)).as("words_count"))

    val firsts = Dedup.keepFirst(
      bagKeys = Seq(idCol), valueCol = "word", orderCol = ordC)(tokens)

    firsts.join(counts, Seq(idCol)).select(
      col(idCol),
      Scalars.truncate254(col("word")).as("word"),
      length(Scalars.removeDiac(col("word"))).cast("long").as("word_len"),
      Scalars.lenGt255(col("word")).as("word_truncated"),
      col("words_count"))
  }
}
