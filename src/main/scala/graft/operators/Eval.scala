package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality evaluation of candidate-generating operators — the
  * measurement discipline a training-data pipeline needs around its
  * dedup/ANN paths: every banded/bucketed candidate stage trades
  * recall for scale, and that trade must be MEASURED against labeled
  * ground truth, not asserted. The reference has no analogue (its
  * exact keyed dedup has recall 1 by construction); this closes the
  * loop for the approximate families (LSH cosine, MinHash banding,
  * SimHash, pHash), whose planted-twin fixtures make the truth
  * relation deterministic.
  *
  * 100 TB shape: TRUTH is never all-pairs — it is a planted or
  * human-labeled relation, O(n) rows — so both the hit semi-join and
  * the extra anti-join are linear equijoins on the normalized pair
  * key, and the report is four scalar aggregates broadcast-crossed
  * into one row.
  */
object Eval {

  /** One-row recall/precision report of `found` pairs against `truth`
    * pairs. Both inputs are pair relations in any orientation and with
    * possible duplicates; pairs are normalized to (min, max) and
    * de-duplicated before counting. Output: n_truth, n_found, n_hit,
    * n_extra, recall_permille, precision_permille (rounded; an empty
    * denominator reports 1000 — vacuous success, not failure), and
    * `vacuous` — true iff EITHER denominator was empty. A gate keyed on
    * the permille alone would read a silently-broken (empty) truth feed
    * as perfect recall; the boolean forces automated consumers to
    * handle the empty-denominator case explicitly (gate on
    * `recall_permille >= X AND NOT vacuous`). */
  def pairRecall(
      found: DataFrame,
      truth: DataFrame,
      aCol: String = "vec_a",
      bCol: String = "vec_b"): DataFrame = {
    def norm(df: DataFrame) = df.select(
      least(col(aCol), col(bCol)).as("pa"),
      greatest(col(aCol), col(bCol)).as("pb")).distinct()
    // ONE pass per input pipeline: both sides are distinct on the pair
    // key, so a full-outer equijoin is exactly f ∪ t with match
    // markers, and every count falls out of a single aggregation —
    // count(marker) skips the other side's nulls. The previous shape
    // (three count aggregates crossJoined) consumed f twice and t
    // twice, re-running the ENTIRE found/truth candidate pipelines per
    // consumer (measured: the text recall reports carried ~20 doc-key
    // exchanges each; exchange reuse across the duplicated subtrees is
    // AQE-dependent and did not engage). n_extra stays derived:
    // hit ⊆ f by construction, extra = found − hit.
    val f = norm(found).withColumn("__f", lit(1))
    val t = norm(truth).withColumn("__t", lit(1))
    def permille(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0, round(num * lit(1000.0) / den).cast("long")).otherwise(lit(1000L))
    f.join(t, Seq("pa", "pb"), "full_outer")
      .agg(
        count(col("__t")).as("n_truth"),
        count(col("__f")).as("n_found"),
        count(when(col("__f").isNotNull && col("__t").isNotNull, lit(1)))
          .as("n_hit"))
      .withColumn("n_extra", col("n_found") - col("n_hit"))
      .select(col("n_truth"), col("n_found"), col("n_hit"), col("n_extra"),
        permille(col("n_hit"), col("n_truth")).as("recall_permille"),
        permille(col("n_hit"), col("n_found")).as("precision_permille"),
        (col("n_truth") === 0 || col("n_found") === 0).as("vacuous"))
  }

  /** One-row recall@k report of an approximate top-k result against
    * the exact top-k ground truth — the standard ANN index quality
    * metric (FAISS-style recall@k): of the true k nearest neighbors
    * per query, what fraction did the index return? Both inputs are
    * (queryCol, idCol) relations — one row per returned neighbor, any
    * extra columns ignored, duplicates tolerated; a hit is an exact
    * (query, neighbor) match. Output: n_queries (distinct truth
    * queries), n_truth, n_found, n_hit, recall_permille
    * (hit/truth, rounded; empty truth reports 1000 — vacuous), and
    * `vacuous` — true iff the truth side was empty, so a gate keyed on
    * the permille must acknowledge the broken-truth-feed case
    * explicitly rather than read it as perfect recall.
    *
    * 100 TB shape: truth is the per-query exact top-k (k·|queries|
    * rows — queries are a batch, never the corpus), so the full-outer
    * match join and the single aggregation are bounded by the REPORT
    * inputs, not the corpus, and each input pipeline is consumed
    * exactly once; the expensive side (computing truth once per index
    * build, e.g. [[Embeddings.l2TopK]]) amortizes across every recall
    * evaluation of that index. */
  def topKRecall(
      found: DataFrame,
      truth: DataFrame,
      queryCol: String = "query_id",
      idCol: String = "neighbor_id"): DataFrame = {
    // single-pass full-outer shape — same rationale as [[pairRecall]]:
    // each input pipeline (an 8-cell frontier runs this per cell, each
    // cell a full ANN search) is consumed exactly once; n_queries
    // counts distinct queryCol over truth-side rows only (the marker
    // `when` nulls out found-only rows, and count-distinct skips
    // nulls).
    val f = found.select(col(queryCol), col(idCol)).distinct()
      .withColumn("__f", lit(1))
    val t = truth.select(col(queryCol), col(idCol)).distinct()
      .withColumn("__t", lit(1))
    def permille(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      when(den > 0, round(num * lit(1000.0) / den).cast("long")).otherwise(lit(1000L))
    f.join(t, Seq(queryCol, idCol), "full_outer")
      .agg(
        countDistinct(when(col("__t").isNotNull, col(queryCol)))
          .as("n_queries"),
        count(col("__t")).as("n_truth"),
        count(col("__f")).as("n_found"),
        count(when(col("__f").isNotNull && col("__t").isNotNull, lit(1)))
          .as("n_hit"))
      .select(col("n_queries"), col("n_truth"), col("n_found"), col("n_hit"),
        permille(col("n_hit"), col("n_truth")).as("recall_permille"),
        (col("n_truth") === 0).as("vacuous"))
  }

  /** Class-confusion counts of a prediction relation against labeled
    * ground truth — the classifier-quality loop (language-ID, quality
    * gates, NB topic labels): one row per (label, pred) cell with its
    * record count. Accuracy, per-class precision/recall, and every
    * other summary derive from the matrix; the matrix is the artifact
    * worth hashing. Records present on only one side are dropped (an
    * inner id-equijoin): unlabeled predictions have no truth to score
    * against, unpredicted labels no prediction to judge.
    *
    * 100 TB shape: one id-equijoin (linear) into a hash-agg whose
    * cardinality is |classes|² — map-side partials collapse the corpus
    * before the shuffle. */
  def confusion(
      pred: DataFrame,
      truth: DataFrame,
      idCol: String = "doc_id",
      predCol: String = "pred",
      labelCol: String = "label"): DataFrame =
    truth.select(col(idCol), col(labelCol))
      .join(pred.select(col(idCol), col(predCol)), idCol)
      .groupBy(col(labelCol), col(predCol))
      .agg(count(lit(1)).as("n"))
}
