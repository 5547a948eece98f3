package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Soak-mode fixture replication — the repeatable form of the SCALE.md
  * hand-run experiments: build an N× corpus from the sf fixtures and
  * measure whether the candidate-generating operators stay linear.
  *
  * Replica construction is the one validated by those experiments:
  *
  *  - `documents`: every whitespace token gets a per-replica marker
  *    suffix, so replicas share NO token/shingle/fingerprint — a
  *    linear operator then does exactly N× the work of one replica,
  *    and any cross-replica candidate a query emits is pure banding
  *    noise. Within a replica the token bijection preserves Jaccard,
  *    tf/df shape, and winnow selection, so per-replica results mirror
  *    the original corpus.
  *  - `embeddings`: deterministic per-replica hash-noise perturbation
  *    (±0.1 per dimension), keeping the vector distribution realistic
  *    (clustered, not iid) while replica twins stay near their
  *    originals.
  *
  * Ids offset by `IdOffset`·replica (even offset: doc-parity-based
  * queries keep their split). The other eight fixture tables are
  * file-copied unchanged so every battery query still resolves.
  */
object Soak {

  val IdOffset = 10_000_000L

  /** Battery queries the soak runs: the candidate-generating family
    * whose 100 TB story is "candidates grow ≤ c·n", plus the
    * events/time-series family (replicated user key-space over the
    * SAME time range — sessionization, as-of/range joins, windows must
    * stay per-key-linear when only the key population grows). */
  def soakQueries(all: Set[String]): Set[String] = all.filter { q =>
    (q.startsWith("neardup_") || q.startsWith("emb_ann_") ||
      q.startsWith("events_") || q.startsWith("graph_") ||
      q == "text_winnow_pairs" || q == "text_tfidf_sim" ||
      q == "docs_split_leakage" ||
      // iterative/graph + banded-Hamming families: per-node outputs
      // (pagerank/communities = one row per vector, bfs ≤ reach) are
      // linear by construction, so the row gate checks the CANDIDATE
      // paths feeding them (knn buckets, wedge equijoin, banding,
      // star-contraction) didn't go quadratic — and that round counts
      // and executor memory survive 10×.
      q == "multimodal_phash" || q == "dedup_clusters") &&
      // the exact 64-bit pigeonhole mode is DOCUMENTED quadratic
      // (16 values per 4-bit band ⇒ ~64 % of all pairs collide) — it
      // exists as the small-corpus correctness oracle, and at 10× the
      // fixture its ~8·10⁸ candidate rows are the explosion the scaled
      // sibling (neardup_simhash_scaled, corpus-sized bands) avoids.
      q != "neardup_simhash"
  }

  def replicatedDocs(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // The replica bijection appends `xq{i}z` to every \S+ token, so
    // replicas are token-disjoint ONLY IF no base token already ends
    // with the marker pattern (base "fooxq1z" would equal replica-1
    // "foo"+marker). The fixture generator never emits such tokens
    // today; assert it, so a regenerated fixture that does breaks the
    // soak loudly here instead of silently voiding the linear-growth
    // gate's premise.
    val clash = base.where(col("text").rlike("xq\\d+z(\\s|$)")).count()
    require(clash == 0L,
      s"soak marker collision: $clash document(s) contain a token ending " +
        "in the per-replica marker pattern xq<digits>z — replica token-" +
        "disjointness (the linear-growth gate's premise) does not hold")
    (0 until n).map { i =>
      if (i == 0) base
      else base.select(
        (col("doc_id") + lit(i * IdOffset)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1xq${i}z").as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select(base.columns.map(col): _*)
    }.reduce(_ unionByName _)
  }

  def replicatedEmbeddings(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until n).map { i =>
      if (i == 0) base
      else base.select(
        (col("vec_id") + lit(i * IdOffset)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          (x + (pmod(xxhash64(col("vec_id"), lit(i), j), lit(1001)) - 500)
            .cast("double") / 5000.0).cast("float")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

  /** N× events: replica users/event-ids offset into disjoint ranges,
    * timestamps/types/values UNCHANGED — the realistic event-stream
    * scale-up is more concurrent keys over the same time window, so
    * per-key operators (sessionize, as-of, rolling, transitions) must
    * grow exactly linearly and time-keyed joins (range_join's bin
    * equijoin) face N× the population per time bin. */
  def replicatedEvents(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/events.parquet")
    (0 until n).map { i =>
      if (i == 0) base
      else base
        .withColumn("event_id", col("event_id") + lit(i * IdOffset))
        .withColumn("user_id", col("user_id") + lit(i * IdOffset))
    }.reduce(_ unionByName _)
  }

  /** Materialize the N× fixture dir (idempotent overwrite; generation
    * is deterministic and takes seconds). Returns the dir to bench. */
  def materializeDir(spark: SparkSession, sfDir: String, n: Int): String = {
    val out = s"${sys.props("java.io.tmpdir")}/graft_soak_x$n"
    Files.createDirectories(Paths.get(out))
    replicatedDocs(spark, sfDir, n)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    replicatedEmbeddings(spark, sfDir, n)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    replicatedEvents(spark, sfDir, n)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    val others = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem")
    others.foreach { t =>
      Files.copy(Paths.get(s"$sfDir/$t.parquet"),
        Paths.get(s"$out/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    out
  }
}
