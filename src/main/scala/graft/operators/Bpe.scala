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
  * not billions). Each round is two dict-sized jobs: a pair-count
  * hash-agg + 1-row argmax, and a narrow merge projection. The winning
  * pair re-enters the next round's plan via a broadcast crossJoin of
  * the 1-row argmax — fully declarative, NO driver collect in the
  * loop; the driver only drives round COUNT, exactly like
  * [[DedupClusters]]' round structure. A `localCheckpoint` per round
  * keeps the plan O(1) deep instead of k aggregations tall.
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

  def trainMerges(dict: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var seq = dict.select(col("word"), col("n"), charSeq(col("word")).as("s"))
      .localCheckpoint()

    var merges: DataFrame = null
    var round = 1
    var dry = false
    while (round <= k && !dry) {
      val pairs = seq
        .select(col("n"), split(trim(col("s")), " +").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS l, ts[i + 1] AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("c"))
      val best = pairs
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint()

      // vocabulary exhausted before k merges (every word one symbol):
      // stop cleanly with the merges found — a 0-row argmax would
      // otherwise annihilate the sequence via the crossJoin and
      // silently empty every later round
      dry = best.isEmpty
      if (!dry) {
        val ranked = best.withColumn("merge_rank", lit(round.toLong))
        merges = if (merges == null) ranked else merges.unionByName(ranked)
        if (round < k) {
          val prev = seq
          seq = seq
            .crossJoin(broadcast(
              best.select(col("l").as("__ml"), col("r").as("__mr"))))
            .withColumn("s", applyMerge(col("s"), col("__ml"), col("__mr")))
            .drop("__ml", "__mr")
            .localCheckpoint()
          // prev's word-dict-sized blocks are dead once the new round
          // has materialized from them (the 1-row `best` checkpoints,
          // which `merges` keeps referencing, are untouched)
          graft.core.IterCheckpoint.release(prev)
        }
      }
      round += 1
    }
    val out = if (merges == null) {
      // no mergeable pair at all — empty result, correct schema
      dict.sparkSession.emptyDataFrame
        .withColumn("merge_rank", lit(0L)).withColumn("l", lit(""))
        .withColumn("r", lit("")).withColumn("c", lit(0L))
    } else merges
    out.select(
      col("merge_rank"), col("l").as("lhs"), col("r").as("rhs"),
      col("c").as("pair_count"))
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
