package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate document detection — the dedup ask beyond the
  * reference's exact UniqueFilterTransformer parity
  * (tiny_etl/transformers/aggregators.py:71-132): word n-gram shingles,
  * exact n-gram Jaccard, MinHash LSH, and SimHash, each ending in the
  * same exact-Jaccard confirmation so all three paths emit the same
  * confirmed pairs (doc_a < doc_b, jaccard_x1000 ≥ threshold).
  *
  * Scale shapes:
  *   - [[ngramJaccardPairs]] (exact): candidates = docs sharing ≥1
  *     shingle, via a shuffle equijoin on the shingle string. Complete
  *     (J ≥ t ⇒ ≥1 shared shingle) but hot shingles make it quadratic —
  *     the correctness baseline, not the 100 TB path.
  *   - [[minHashPairs]]: k independent min-hashes per doc; candidates =
  *     pairs agreeing on ANY (i, h_i) — an equijoin on (hash index,
  *     hash value), i.e. k·|docs| rows, never all-pairs. One-row bands
  *     (r=1, b=k) make the false-negative rate (1−J)^k — ≤ 1e-16 at
  *     J ≥ 0.9, k = 16 — so confirmed output matches exact ground truth.
  *   - [[simHashPairs]]: 64-bit sign fingerprint of the shingle-hash
  *     set; candidates = pairs sharing a 4-bit band (16 bands) AND
  *     within Hamming ≤ 8, then exact-confirm. Cheapest signature
  *     (8 bytes/doc), the usual web-dedup trade.
  *
  * Every ratio is integer fixed-point (jaccard_x1000 = 1000·|∩| div
  * |∪|; the threshold test is cross-multiplied) — no float division, so
  * the DuckDB oracle matches bit-for-bit.
  */
object NearDup {

  /** Shingle width (word n-grams). */
  val ShingleN = 3

  /** Confirmation threshold: keep pairs with Jaccard ≥ 0.8. */
  val ThresholdMilli = 800

  /** MinHash signature length (= band count at r=1). */
  val NumMinHashes = 16

  /** SimHash banding: 16 bands × 4 bits with a Hamming ≤ 15 cutoff.
    * This pairing is EXACT, not probabilistic: by pigeonhole, h bit
    * flips can touch at most h of the 16 bands, so any pair within
    * Hamming 15 is guaranteed to agree on ≥ 1 band — the candidate
    * stage finds exactly the Hamming-≤15 ball (wider bands would break
    * the guarantee: 8×8 bands structurally miss h ≥ 8 pairs, and
    * measured planted near-dups sit at h up to 10). Near-dup pairs at
    * J ≈ 0.9 land around h ≈ 6.5 on this corpus; unrelated pairs at
    * ≈ 32 ± 4, far outside the ball, and exact confirmation removes
    * any false positive inside it. The 100 TB dial is signature WIDTH
    * (128-bit simhash ⇒ 16 bands × 8 bits keeps the same guarantee
    * with 256-value bands), not band count. */
  val SimHashBands = 16
  val SimHashBandBits = 4
  val HammingMax = 15

  /** (idCol, shingle) — DISTINCT word-n-gram shingles per doc, built
    * narrowly: token array → sequence-indexed concat → array_distinct →
    * explode. Docs with fewer than n tokens yield no rows.
    */
  def shingles(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      n: Int = ShingleN): DataFrame = {
    // Materialize the token array in its own projection FIRST: the gram
    // lambda references it ~3n times per row, and inlining the
    // split+filter there would re-run the regex split once per
    // element_at (measured 15-25× slowdown). A multiply-referenced
    // non-cheap alias survives CollapseProject, so the split runs once
    // per row and the lambda indexes a concrete array.
    val toksC = graft.core.Cols.fresh("__toks", Seq(idCol))
    val tokArr = filter(split(col(textCol), "\\s+"),
      t => !(t === "" || t.rlike("^\\s+$")))
    val toks = col(toksC)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))
    val arr = when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol), tokArr.as(toksC))
      .select(col(idCol), explode(arr).as("s"))
  }

  /** doc → distinct-shingle count. */
  private def sizesOf(sh: DataFrame, idCol: String): DataFrame =
    sh.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))

  /** Exact-Jaccard confirmation of candidate pairs: joins the (small)
    * candidate set back to the shingle table on (doc, shingle) to count
    * intersections — never an all-pairs product — and keeps pairs with
    * 1000·|∩| ≥ threshold·|∪|. Output: (doc_a, doc_b, jaccard_x1000).
    */
  def confirm(
      cand: DataFrame, // columns: doc_a, doc_b
      sh: DataFrame,
      idCol: String = "doc_id",
      thresholdMilli: Int = ThresholdMilli): DataFrame = {
    val a = sh.select(col(idCol).as("doc_a"), col("s"))
    val b = sh.select(col(idCol).as("doc_b"), col("s"))
    val sizes = sizesOf(sh, idCol)
    val inter = cand.distinct()
      .join(a, Seq("doc_a"))
      .join(b, Seq("doc_b", "s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("__i"))
    emit(inter, sizes, idCol, thresholdMilli)
  }

  /** Shared tail: attach sizes, cross-multiplied threshold test, fixed-
    * point Jaccard. `inter` columns: doc_a, doc_b, __i. */
  private def emit(
      inter: DataFrame,
      sizes: DataFrame,
      idCol: String,
      thresholdMilli: Int): DataFrame = {
    val union = col("__na") + col("__nb") - col("__i")
    inter
      .join(sizes.select(col(idCol).as("doc_a"), col("__n").as("__na")), Seq("doc_a"))
      .join(sizes.select(col(idCol).as("doc_b"), col("__n").as("__nb")), Seq("doc_b"))
      .filter(col("__i") * 1000 >= union * thresholdMilli)
      .select(
        col("doc_a"), col("doc_b"),
        floor((col("__i") * 1000) / union).cast("long").as("jaccard_x1000"))
  }

  /** Exact path: candidates = docs sharing ≥ 1 shingle (equijoin on the
    * shingle), intersection counted directly by the join. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdMilli: Int = ThresholdMilli): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
    val a = sh.select(col(idCol).as("doc_a"), col("s"))
    val b = sh.select(col(idCol).as("doc_b"), col("s"))
    val inter = a.join(b, Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("__i"))
    emit(inter, sizesOf(sh, idCol), idCol, thresholdMilli)
  }

  /** MinHash signatures: (doc, hash index i, min over shingles of
    * xxhash64(i, shingle)) — one hash-agg, k longs per doc. */
  def minHashSignatures(
      sh: DataFrame,
      idCol: String = "doc_id",
      k: Int = NumMinHashes): DataFrame =
    sh.groupBy(col(idCol))
      .agg(
        min(xxhash64(lit(0), col("s"))).as("h0"),
        (1 until k).map(i => min(xxhash64(lit(i), col("s"))).as(s"h$i")): _*)

  /** MinHash LSH (r=1, b=k): candidates agree on any (i, h_i). */
  def minHashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = NumMinHashes,
      thresholdMilli: Int = ThresholdMilli): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
    val sig = minHashSignatures(sh, idCol, k)
      .select(col(idCol),
        posexplode(array((0 until k).map(i => col(s"h$i")): _*)).as(Seq("__hi", "__hv")))
    val cand = sig.select(col(idCol).as("doc_a"), col("__hi"), col("__hv"))
      .join(sig.select(col(idCol).as("doc_b"), col("__hi"), col("__hv")),
        Seq("__hi", "__hv"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    confirm(cand, sh, idCol, thresholdMilli)
  }

  /** 64-bit SimHash of the doc's shingle-hash set: bit j is the sign of
    * Σ over shingles of ±1 by bit j of xxhash64(shingle). */
  def simHashSignatures(sh: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val h = xxhash64(col("s"))
    val sums = (0 until 64).map { j =>
      sum(when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    sh.groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol),
        (0 until 64).map { j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _).as("__sig"))
  }

  /** SimHash LSH: candidates share a [[SimHashBandBits]]-bit band and
    * pass the Hamming cutoff, then exact-confirm. */
  def simHashPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      thresholdMilli: Int = ThresholdMilli): DataFrame = {
    val sh = shingles(docs, idCol, textCol)
    val mask = (1L << SimHashBandBits) - 1
    val sig = simHashSignatures(sh, idCol)
      .select(col(idCol), col("__sig"),
        posexplode(array((0 until SimHashBands).map { b =>
          shiftright(col("__sig"), b * SimHashBandBits).bitwiseAND(mask)
        }: _*)).as(Seq("__bi", "__bv")))
    val cand = sig.select(col(idCol).as("doc_a"), col("__sig").as("__siga"), col("__bi"), col("__bv"))
      .join(sig.select(col(idCol).as("doc_b"), col("__sig").as("__sigb"), col("__bi"), col("__bv")),
        Seq("__bi", "__bv"))
      .filter(col("doc_a") < col("doc_b") &&
        bit_count(col("__siga").bitwiseXOR(col("__sigb"))) <= HammingMax)
      .select("doc_a", "doc_b")
    confirm(cand, sh, idCol, thresholdMilli)
  }
}
