package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction — tokenizer TRAINING as a
  * distributed operator, the step a training-data pipeline runs before
  * it can count a single token. Greedy BPE in the classic form: start
  * from characters, repeatedly merge the most frequent adjacent symbol
  * pair, k rounds.
  *
  * Spark-first shape: BPE trains on the WORD-FREQUENCY DICTIONARY, not
  * the corpus — [[wordDict]] is one corpus-wide hash-agg (map-side
  * partials) and everything after runs on the dict, which is smaller
  * than the corpus by the type/token ratio (millions of rows at 100 TB,
  * not billions). Each ROUND is two dict-sized jobs — a pair-count
  * hash-agg whose top (maxBatch + 1) rows come to the driver
  * (model-sized, the same discipline as encode's merge-literal load),
  * and one narrow merge projection — but a round now applies a BATCH
  * of merges, not one: the longest top-of-ranking prefix that is
  * provably equivalent to exact sequential greedy ([[safeBatch]]'s
  * three conditions). That cuts the scheduled-round count from k to
  * ~k/batch — the difference between 32k driver-loop rounds and ~2k
  * for a real vocabulary, where the driver loop (not the data) is the
  * wall. A `localCheckpoint` per round keeps the plan O(1) deep
  * instead of k aggregations tall.
  *
  * Determinism (cross-run AND cross-engine): counts are exact int64
  * sums; argmax ties break by (count DESC, left, right) with plain
  * binary string order; and the merge application is engine-neutral by
  * construction — the symbol sequence lives as a DOUBLE-space-joined
  * string `"  s1  s2  …  sk  "` (tokens are whitespace-split so they
  * contain no spaces), and merging pair (l, r) is
  * `replace(s, " l  r ", " lr ")`: the pattern claims only the inner
  * space of each double delimiter, so every engine's left-to-right
  * non-overlapping `replace` IS the greedy BPE scan — including
  * adjacent disjoint sites (`a a a a` → `[aa, aa]`) and overlaps
  * (`a a a` → `[aa, a]`), the reference behavior for both.
  *
  * Caveat: symbols are regex codepoints (`.`), so the starting
  * alphabet is per-character for BMP text (the fixture corpora are
  * ASCII); astral-plane input would need a byte-level seeding instead.
  */
object Bpe {

  /** Word-frequency dictionary of a document corpus: lowercased
    * whitespace tokens → (word, n). One corpus scan, one hash-agg. */
  def wordDict(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  /** `k` greedy merge rounds over a (word, n) dictionary. Returns one
    * row per round: `(rank, lhs, rhs, pair_count)` — the ordered merge
    * list that IS a BPE tokenizer's model artifact. Adjacent pairs are
    * counted at every position (overlaps included), weighted by word
    * frequency — the reference BPE statistic. */
  /** "␣␣c1␣␣c2␣␣…␣␣" — DOUBLE-space-joined symbol sequence. The merge
    * pattern `" l  r "` claims only the INNER space of each double
    * delimiter, so two adjacent merge sites ("a a a a" with merge
    * (a,a)) never share a consumed character and plain left-to-right
    * `replace` is EXACTLY the greedy BPE scan — a single-space join
    * makes the pattern eat the shared middle space and the second site
    * can't fire ("aaaa" → [aa,a,a] instead of [aa,aa]). The
    * replacement `" lr "` restores the double-space invariant. */
  private def charSeq(word: org.apache.spark.sql.Column) =
    concat(lit("  "),
      concat_ws("  ", regexp_extract_all(word, lit("."), lit(0))),
      lit("  "))

  private def applyMerge(
      s: org.apache.spark.sql.Column,
      l: org.apache.spark.sql.Column,
      r: org.apache.spark.sql.Column) =
    replace(s,
      concat(lit(" "), l, lit("  "), r, lit(" ")),
      concat(lit(" "), l, r, lit(" ")))

  /** The provably-safe batch: the longest prefix of the rank-ordered
    * pair list (count DESC, l, r — already sorted by the caller) that
    * exact sequential greedy is GUARANTEED to select in that exact
    * order, so one application pass per batch replaces one per merge
    * without changing a single output row. A prefix m1..mp qualifies
    * when three conditions hold, each closing a distinct divergence:
    *
    *  1. PAIRWISE SYMBOL-DISJOINT — no symbol appears in two batch
    *     pairs. Merging (a,b) only perturbs counts of pairs touching
    *     a or b, so disjoint later members' counts are untouched.
    *  2. NO CONCAT COLLISION — a later member's symbols must not equal
    *     any earlier member's merged string lhs+rhs. If m1 = (a,b) and
    *     m2 = ("ab", c), m1 MINTS new "ab" tokens whose c-adjacencies
    *     sequential greedy would recount into m2 (and merge), while a
    *     fixed-count batch would not — both the recorded pair_count
    *     and the resulting segmentation would diverge.
    *  3. STRICTLY ABOVE THE CUT — last kept count > first excluded
    *     count (when anything is excluded). Every non-batch pair's
    *     post-merge count is bounded by the cut count (old pairs only
    *     decrease; a pair minted by merging (a,b) is bounded by the
    *     OLD count of an a- or b-touching pair, which prefix-
    *     disjointness forces below the cut) — strictness means no
    *     minted or surviving pair can TIE a batch member and steal
    *     its turn through the (l, r) tie-break.
    *  4. SELF-PAIR TERMINATES — a member with l == r ends the batch
    *     (kept only if it is the FIRST member, i.e. the plain argmax).
    *     Merging (b, b) mints the pair (bb, bb) from its OWN
    *     occurrences ("b b b b" → "bb bb"), so the minted count is
    *     bounded by the self-pair's own count — NOT by any
    *     below-the-cut pair — and can outrank every later batch
    *     member (dict {bbbb:9, caa:4, cacba:3}: sequential rank 2 is
    *     (bb,bb) count 9, but a 2-batch would record (c,a) count 7).
    *     Conditions 1-3's minted-count bound only holds for l != r,
    *     where the minted pair's flank is a DIFFERENT old pair that
    *     disjointness forces outside the batch (hence ≤ the cut; and
    *     in the list-exhausted case, nonexistent).
    *
    * A batch of size 1 is the plain argmax — always safe, no
    * strictness needed — so progress is guaranteed. BpeSpec pins
    * batched == sequential == the in-memory model on corpora crafted
    * to trip each condition, plus a randomized differential search. */
  private[graft] def safeBatch(
      top: Seq[(String, String, Long)], maxBatch: Int): Seq[(String, String, Long)] = {
    val used = scala.collection.mutable.Set.empty[String] // symbols + concats
    var n = 0
    var stop = false
    while (!stop && n < math.min(maxBatch, top.size)) {
      val (l, r, _) = top(n)
      if (l == r) { // condition 4: keep only as the sole leading member
        if (n == 0) n = 1
        stop = true
      } else if (used(l) || used(r)) stop = true
      else { used += l; used += r; used += (l + r); n += 1 }
    }
    // strictness at the cut (condition 3); n == top.size means the
    // collected list was exhausted — the caller collects maxBatch + 1,
    // so that only happens when these are ALL remaining OLD pairs (and
    // with self-pairs excluded by condition 4, every minted pair's
    // flank would be an old pair sharing a batch symbol, which
    // disjointness makes impossible — no outside pair exists to tie)
    while (n > 1 && n < top.size && top(n - 1)._3 == top(n)._3) n -= 1
    top.take(math.max(n, 1))
  }

  /** Overlap-counted adjacent-pair frequencies of a symbol-sequence
    * frame: (l, r, c) with c = Σ n over every adjacency. One explode +
    * one hash-agg (map-side partials). */
  private def pairCounts(seqDf: DataFrame): DataFrame =
    seqDf
      .select(col("n"), split(trim(col("s")), " +").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS l, ts[i + 1] AS r))"))
        .as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("n")).as("c"))

  /** `incremental = true` (the 100 TB dial; default off): maintain the
    * pair-count table ACROSS rounds instead of re-counting the whole
    * dictionary per batch. Exactness rests on two facts BPE's
    * batching already guarantees:
    *
    *  1. AFFECTED = pattern match on the ORIGINAL string. Batch members
    *     are pairwise symbol-disjoint, so merging member i never
    *     creates or destroys a site of member j (pairs not touching
    *     i's symbols are preserved verbatim; pairs minted by i involve
    *     i's concat symbol, which disjointness bars from the batch) —
    *     the OR of `contains(" l  r ")` over the batch, evaluated on
    *     the pre-merge string, finds exactly the words whose pair
    *     multiset can change.
    *  2. DELTA = (new pairs of affected words) − (old pairs of affected
    *     words), merged by one union + hash-agg, zero rows dropped
    *     (a zero-count pair is a non-adjacency; keeping it would let
    *     the tie-break surface phantom merges near exhaustion).
    *
    * Unaffected words contribute nothing — their counts ride the
    * maintained table untouched. Per round the dictionary is SCANNED
    * (two narrow codegen'd projections: the contains filter and the
    * conditional replace) but only the affected subset pays the
    * explode + aggregate, which is the round's real data cost. On a
    * Zipf dictionary the affected fraction collapses once the head
    * merges are done.
    *
    * DEFAULT OFF because the trade is measured, not assumed (dev probe
    * `bpe_k1024`, numbers in SCALE.md): at fixture dict sizes the
    * per-round wall is DRIVER/job overhead, and incremental adds one
    * scheduled job per round (the maintained-table checkpoint) — the
    * battery's k=8 vocab query ran 2× slower under incremental. The
    * dial pays off when the dictionary is large enough that the full
    * explode+aggregate dominates a round AND the affected fraction is
    * small — the regime a 100 TB corpus's multi-GB dictionary lives
    * in. BpeSpec pins incremental == full-recount == the in-memory
    * model either way. */
  def trainMerges(
      dict: DataFrame, k: Int, maxBatch: Int = 16,
      incremental: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxBatch >= 1, s"maxBatch must be >= 1, got $maxBatch")
    val session = dict.sparkSession
    var seq = dict.select(col("word"), col("n"), charSeq(col("word")).as("s"))
      .localCheckpoint()
    var counts: DataFrame =
      if (incremental) pairCounts(seq).localCheckpoint() else null

    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var rank = 1
    var dry = false
    while (rank <= k && !dry) {
      // one recount (or maintained-table read) per BATCH, not per
      // merge: the top (maxBatch + 1) pairs come to the driver —
      // model-sized (≤ 17 narrow rows at the default), the same
      // discipline as encode's merge-literal load — and the longest
      // provably-sequential-equivalent prefix is applied in ONE
      // projection pass. A 32k-merge vocabulary is then ~32k/batch
      // scheduled rounds instead of 32k (the driver loop, not the
      // data, is the wall at real vocabulary sizes).
      val top = (if (incremental) counts else pairCounts(seq))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(math.min(maxBatch, k - rank + 1) + 1)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq

      // vocabulary exhausted before k merges (every word one symbol):
      // stop cleanly with the merges found
      dry = top.isEmpty
      if (!dry) {
        val batch = safeBatch(top, math.min(maxBatch, k - rank + 1))
        batch.foreach { case (l, r, c) =>
          merges += ((rank.toLong, l, r, c)); rank += 1
        }
        if (rank <= k) {
          val prev = seq
          val applied = batch.foldLeft(col("s")) { case (s, (l, r, _)) =>
            applyMerge(s, lit(l), lit(r))
          }
          if (incremental) {
            // affected = any member's site present pre-merge (exact by
            // symbol-disjointness — see the contract note above)
            val hit = batch.map { case (l, r, _) =>
              col("s").contains(s" $l  $r ")
            }.reduce(_ || _)
            val affectedOld = prev.where(hit)
            val affectedNew = affectedOld.withColumn("s", applied)
            val prevCounts = counts
            counts = counts
              .unionByName(pairCounts(affectedNew))
              .unionByName(pairCounts(affectedOld)
                .withColumn("c", -col("c")))
              .groupBy(col("l"), col("r"))
              .agg(sum(col("c")).as("c"))
              .where(col("c") > 0)
              .localCheckpoint()
            graft.core.IterCheckpoint.release(prevCounts)
            seq = prev
              .withColumn("s", when(hit, applied).otherwise(col("s")))
              .localCheckpoint()
          } else {
            seq = prev.withColumn("s", applied).localCheckpoint()
          }
          // prev's word-dict-sized blocks are dead once the new round
          // has materialized from them
          graft.core.IterCheckpoint.release(prev)
        }
      }
    }
    // the merge list is fully collected — the final round's seq (and,
    // in incremental mode, the final maintained counts) blocks are
    // dead; release them like every per-round predecessor so repeated
    // trainings don't accumulate blocks for the session lifetime
    graft.core.IterCheckpoint.release(seq)
    if (counts != null) graft.core.IterCheckpoint.release(counts)
    import session.implicits._
    val out =
      if (merges.isEmpty)
        Seq.empty[(Long, String, String, Long)]
      else merges.toSeq
    out.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** [[wordDict]] ∘ [[trainMerges]]. */
  def train(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    trainMerges(wordDict(docs, textCol), k)

  /** ENCODE with a trained merge list: per document, the BPE token
    * count under the vocabulary (plus word and character counts for
    * the compression-ratio denominator). `merges` is the ordered
    * (lhs, rhs) list from [[trainMerges]] — a tokenizer MODEL, a few
    * hundred KB even for a 50k-merge vocabulary, entering the plan as
    * literals (the load-the-artifact step of every tokenizer; here the
    * caller usually passes a freshly collected [[trainMerges]]
    * result). The whole encode is one narrow projection per word —
    * each merge is one `replace` on the space-joined symbol string,
    * applied in rank order, per WORD so merges never cross word
    * boundaries — followed by one hash-agg back to doc granularity.
    * Corpus never shuffles except that final doc_id agg.
    */
  def encode(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = docs
      .select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val encoded = merges.foldLeft(charSeq(col("word"))) { case (s, (l, r)) =>
      applyMerge(s, lit(l), lit(r))
    }
    words
      .select(col(idCol),
        length(col("word")).cast("long").as("__chars"),
        size(split(trim(encoded), " +")).cast("long").as("__pieces"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("__chars")).as("n_chars"),
        sum(col("__pieces")).as("n_bpe_tokens"))
  }
}
