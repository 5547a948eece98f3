package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relevance scoring — BM25 and a linear-idf TF-IDF — for the
  * "most distinctive terms per document" ask of a training-data
  * pipeline (keyword extraction, topic tagging, per-doc summaries).
  * Extends the reference's per-group fold surface
  * (tiny_etl/transformers/aggregators.py:17-68) with corpus-GLOBAL
  * statistics the per-process reference cannot compute: document
  * frequency and average document length need the whole corpus, which
  * is exactly what a shuffle is for.
  *
  * All scores are integer fixed-point so the DuckDB oracle matches
  * bit-for-bit (no transcendental idf: `ln` is not replicable across
  * engines at the last ulp; the linear variants rank near-identically
  * for retrieval and are EXACT cross-engine):
  *
  *   bm25(t, d) = tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
  *
  * with k1 = 1.2, b = 0.75, avgdl = SDL/N. Multiplying numerator and
  * denominator by 10⁴·SDL clears every fraction:
  *
  *   bm25_x1000 = (22000·tf·SDL·1000) div
  *                (10000·tf·SDL + 3000·SDL + 9000·dl·N)
  *
  *   tfidf_x1000 = (tf·1000·N) div df          (linear idf N/df)
  *
  * Magnitudes: the dominant product is 2.2·10⁷·tf·SDL — int64-safe to
  * ~40 G total tokens with tf ≤ 10³. Beyond that (a true 100 TB
  * corpus) switch the three products to decimal(38,0); the plan shape
  * is unchanged.
  *
  * Scale shape: one hash-agg per statistic — tf on (doc, word), df on
  * word, dl/N/SDL as an aggregate-to-scalar branch broadcast back via
  * crossJoin — then a single exchange on doc_id serves BOTH windows
  * (the dl sum and the top-k rank), and the rank filter compiles to
  * WindowGroupLimit so each partition keeps only k rows before the
  * final sort. Nothing corpus-sized is ever collected or broadcast.
  */
object Relevance {

  /** BM25 k1 × 100 (k1 = 1.2). */
  val K1x100 = 120

  /** BM25 b × 100 (b = 0.75). */
  val Bx100 = 75

  /** Per-(doc, word) term frequencies from a token stream. */
  def termFrequencies(
      toks: DataFrame,
      idCol: String = "doc_id",
      wordCol: String = "word"): DataFrame =
    toks.groupBy(col(idCol), col(wordCol)).agg(count(lit(1)).as("tf"))

  /** Top-`k` terms per doc by fixed-point BM25 over a (doc_id, word)
    * token stream (e.g. [[Tokenize.splitTokens]] output). Emits
    * doc_id, word, tf, df, bm25_x1000, tfidf_x1000, rnk. */
  def bm25TopTerms(
      toks: DataFrame,
      k: Int = 3,
      idCol: String = "doc_id",
      wordCol: String = "word"): DataFrame = {
    val tf = termFrequencies(toks, idCol, wordCol)
    // corpus scalars: N docs, total token mass SDL (tiny branch off tf)
    val stats = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("__dl"))
      .agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sdl"))
    val dfreq = tf.groupBy(col(wordCol)).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col(idCol))
    val scored = tf
      .join(dfreq, wordCol)
      .crossJoin(broadcast(stats))
      .withColumn("__dl", sum(col("tf")).over(byDoc))
      // `div` (IntegralDivide) keeps the arithmetic in exact int64 —
      // `/` would detour through double and lose low bits cross-engine
      .withColumn("bm25_x1000", expr(
        """(22000L * tf * __sdl * 1000L) div
          |(10000L * tf * __sdl + 3000L * __sdl + 9000L * __dl * __n)""".stripMargin))
      .withColumn("tfidf_x1000", expr("(tf * 1000L * __n) div df"))
      .withColumn("rnk", row_number().over(
        byDoc.orderBy(col("bm25_x1000").desc, col(wordCol))))
    scored
      .where(col("rnk") <= k)
      .select(col(idCol), col(wordCol), col("tf"), col("df"),
        col("bm25_x1000"), col("tfidf_x1000"), col("rnk"))
  }
}
