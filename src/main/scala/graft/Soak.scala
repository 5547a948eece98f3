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
  *    tf/df shape, and winnow selection (modulo the first-token
  *    byte-pad below), so per-replica results mirror the original
  *    corpus. A replica-length byte PAD glued to the first token
  *    additionally pushes replicas apart in the BYTE domain: the
  *    token-level premise says nothing about byte-stream similarity,
  *    and the perceptual-hash family is by design invariant to the
  *    uniform marker insertion (it merely rescales the stream) — the
  *    pad's block-dependent sample-window slide is what makes
  *    cross-replica pHash pairs noise rather than truth.
  *  - `embeddings`: deterministic per-replica signed permutation (an
  *    orthogonal transform — see [[replicatedEmbeddings]]): each
  *    replica is the original clustered point cloud with relabeled
  *    axes, so intra-replica geometry is exactly the original's while
  *    replicas occupy decorrelated directions and share no
  *    neighborhood — the vector-space analogue of the documents'
  *    token disjointness.
  *
  * Ids offset by `IdOffset`·replica (even offset: doc-parity-based
  * queries keep their split). Orders and lineitem replicate in key
  * lockstep (`replicatedOrders`/`replicatedLineitem` — the q18 gate);
  * the four remaining fixture tables (region, nation, supplier, part)
  * are file-copied unchanged so every battery query still resolves.
  */
object Soak {

  val IdOffset = 10_000_000L

  /** Largest `numOutputRows` over every JOIN node of `df`'s EXECUTED
    * plan — the soak gate's view of the biggest intermediate frame a
    * query built. Output-row gating alone has a blind spot the r10
    * pHash quadratic exploited: a confirm stage can crush a 10⁸-row
    * candidate join down to a tiny, bound-respecting output while the
    * join itself is the thing that dies at 100 TB. Reading the join
    * metrics off the executed plan gates that intermediate directly,
    * for EVERY soak query, with no per-operator plumbing — whichever
    * join is largest is by definition the scale risk. Call only after
    * an action has run the plan (metrics are execution-populated);
    * traverses adaptive stages, reused exchanges/subqueries included
    * (a reused stage's rows count once, matching what was executed).
    */
  def maxJoinOutputRows(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def walk(p: SparkPlan): Long = {
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      val name = p.nodeName.toLowerCase
      val self =
        if (name.contains("join") || name.contains("cartesian"))
          p.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
        else 0L
      (self +: (kids ++ p.subqueries).map(walk)).max
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Length (chars) of the per-replica byte-offset pad per replica
    * index — sized so adjacent replicas' pads differ by ≥ 4× the
    * 4-byte pHash sample window across most of the 64 blocks (the
    * sampled window of block k slides by Δpad·(1 − k/64) bytes, so a
    * 24-char step decorrelates blocks k ≤ 53 — expected cross-replica
    * Hamming ≈ 26 ≫ the 6 cutoff). */
  val PadUnit = 24

  /** The soak-EXCLUDED battery queries: ONE definition serving both
    * the gate predicate ([[soakQueries]]) and the committed artifact's
    * "excluded" note ([[graft.Bench]] embeds [[ExcludedNote]]), so the
    * record can never misreport what the gate actually skipped
    * (DocSyncSpec pins the membership both ways).
    *
    *  - `neardup_simhash`: the exact 64-bit pigeonhole mode is
    *    DOCUMENTED quadratic (16 values per 4-bit band ⇒ ~64 % of all
    *    pairs collide) — it exists as the small-corpus correctness
    *    oracle; at 10× its ~8·10⁸ candidate rows are the explosion the
    *    scaled sibling (corpus-sized bands) avoids.
    *  - `multimodal_phash`: same rationale for the 64-bit pHash mode —
    *    band-PAIR keys span only 16 bits, so unrelated-pair collisions
    *    grow n²·C(8,2)/2¹⁶ regardless of hash quality (the r11 100×
    *    spot measured 576× the linear envelope). MultimodalSpec + its
    *    CORRECTNESS entry remain its home; a growing corpus runs the
    *    256-bit scaled mode (32-bit pair keys, measured linear at the
    *    same spot), which stays gated via the prefix match.
    *  - `emb_ann_recall*` / `emb_ann_frontier`: the TRUTH side is the
    *    exact brute-force baseline (n·|queries| at the battery's
    *    corpus-fraction query batch) — quadratic BY DEFINITION, the
    *    same reason emb_topk itself is not gated. A deployment
    *    evaluates recall on a FIXED sampled query batch; the battery
    *    keeps the corpus-fraction batch for oracle determinism. The
    *    production paths the reports measure gate separately
    *    (emb_ann_ivfpq_probed, emb_ann_ivfpq, emb_neardup — whose
    *    planted-truth report IS gated, its truth O(n) by
    *    construction). The TEXT recall reports (neardup_*_recall) stay
    *    gated: their truth is the shared-shingle exact-Jaccard
    *    relation, linear on token-disjoint replicas. */
  val ExcludedExact: Set[String] =
    Set("neardup_simhash", "multimodal_phash", "emb_ann_frontier")
  val ExcludedPrefixes: Seq[String] = Seq("emb_ann_recall")
  def isExcluded(q: String): Boolean =
    ExcludedExact(q) || ExcludedPrefixes.exists(q.startsWith)

  /** The artifact-note form of the exclusion set (rationale attached) —
    * embedded verbatim in every soak JSON line by [[graft.Bench]]. */
  val ExcludedNote: Seq[String] = Seq(
    "neardup_simhash (documented-quadratic exact mode)",
    "multimodal_phash (documented-quadratic 64-bit small-corpus mode; " +
      "multimodal_phash_scaled is the gated growing-corpus path)",
    "emb_ann_recall*/emb_ann_frontier (exact brute-force truth side; " +
      "deployment samples the query batch)")

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
      // substring-granular dedup: the duplicated-gram detection is a
      // positional-gram self-join (60-bit sha keys) — a candidate-
      // generating shape whose quadratic failure mode is exactly what
      // the gate exists to catch; replicas are token-disjoint so
      // duplicated grams stay within-replica and the join is linear
      q == "docs_dup_ngrams" ||
      // the embedding bucket-join family: LSH/IVF-cell candidate
      // stages whose dials (batteryKnnPlanes, centroidStepFor) must
      // TURN with the corpus — gate them so a frozen dial's quadratic
      // shows up here, not at a customer's 100× corpus (emb_contrastive
      // shipped one round on the frozen 4-plane dial exactly because
      // this family wasn't gated)
      q == "emb_knn_graph" || q == "emb_neardup" || q == "emb_semdedup" ||
      // the recall report runs the same bucketed candidate machinery
      // as emb_neardup (1-row output — the gate's value here is the
      // candidate-frame measurement)
      q == "emb_neardup_recall" ||
      q == "emb_dedup_clusters" || q == "emb_contrastive" ||
      // entity resolution: deletion-key buckets must stay
      // replica-disjoint (replicatedCustomers' tag premise) — the
      // candidate gate measures the key-bucket join directly
      q.startsWith("er_") ||
      // coverage sampling: output = cells × perCell and cell count
      // grows ∝ n at fixed step — linear only while the quality join
      // and the rank window stay per-cell-bounded
      q == "docs_coverage_sample" ||
      // fuzzy decontamination: cross-corpus banded-candidate member
      // (minHashPairsBetween under an anti-join) — same gate rationale
      // as neardup_incremental
      q == "docs_decontam_fuzzy" ||
      // iterative/graph + banded-Hamming families: per-node outputs
      // (pagerank/communities = one row per vector, bfs ≤ reach) are
      // linear by construction, so the row gate checks the CANDIDATE
      // paths feeding them (knn buckets, wedge equijoin, banding,
      // star-contraction) didn't go quadratic — and that round counts
      // and executor memory survive 10×.
      q.startsWith("multimodal_phash") || q == "dedup_clusters" ||
      // incremental cluster maintenance: same star-contraction core
      // PLUS the touched/untouched split — the gate checks the
      // semi/anti-join scoping keeps the contraction input bounded by
      // the increment, not the corpus
      q == "dedup_clusters_merge" ||
      // the composed-DAG capstones: the engine's most complex plans
      // (curate = quality × langid × exact dedup × near-dup canonical;
      // training_set adds mix → pack's distributed prefix scan;
      // survivorship adds the content-aware max_by over resolved
      // clusters). Each STAGE is gated elsewhere, but composition is
      // its own risk — a multi-consumer seam that stops reusing, a
      // stage whose intermediate blows up only when fed by another —
      // so the capstones gate as wholes: replicas are token-disjoint,
      // every stage is per-doc or banded, output must stay ~N×.
      q == "docs_curated" || q == "docs_training_set" ||
      q == "docs_survivorship" ||
      // the agg-feeds-join TPC-H shape: the fact-derived big-orders
      // side must stay a SHUFFLE join as it grows (its size is ∝ the
      // fact table — a silent broadcast of it is the 100× trap the
      // plan comment names); orders/lineitem/customer replicate in
      // key-lockstep so the whole three-way join does true N× work
      // while output stays the fixed top-100 (rows gate trivially
      // linear; the JOIN-FRAME gate is the measurement here)
      q == "q18_big_orders") &&
      // documented-quadratic small-corpus modes and exact-truth recall
      // reports — rationale and membership at ONE definition above
      !isExcluded(q)
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
      else {
        // Byte-domain disruptor, GLUED to the first token (no new
        // token, so per-doc token counts stay invariant): a pad of
        // i·PadUnit chars slides every pHash sample window by a
        // block-dependent offset, pushing replicas out of the
        // Hamming-≤6 ball of their origin AND of other replicas. The
        // uniform per-token marker alone is INSIDE blockhash's
        // invariance class (it rescales the byte stream, so sampled
        // windows re-align with the same content — the r10 soak
        // measured cross-replica pairs at 3134× baseline without the
        // pad). The pad carries the doc id so its shingles stay
        // doc-unique (no corpus-wide hot shingle); cost: the ~2
        // first-token shingles per doc leave the token bijection —
        // a bounded Jaccard epsilon (≈ 3/shingle-count), while the
        // gate's real premises (replica token-disjointness, linear
        // per-replica work) hold exactly.
        // Pad CONTENT must be pseudo-random per (doc, replica) AND
        // byte-statistically text-like. A constant filler ("aaa…")
        // makes every pad-sampled window sum identical, so short docs
        // whose replicas are majority-pad collapse to the ~zero
        // signature and pair with each other (the r10 rerun measured
        // 760× growth from exactly that; the fixture's median doc is
        // 295 chars, so pads ARE a large stream fraction). Raw sha hex
        // is pseudo-random but BIMODAL ('0'-'9' ≈ 52 vs 'a'-'f' ≈ 99
        // mean byte, text ≈ 108): the block-sum median then splits
        // pad blocks from text blocks and the signature degenerates
        // to a pad/text step function — near-identical for adjacent
        // replicas. Translating the digest into 16 spread lowercase
        // letters keeps the randomness and moves pad windows into the
        // text byte range, so every pad-sampled bit is a fair coin
        // against the median.
        val pad = concat(lit("p"),
          translate(
            substring(
              repeat(sha2(concat(col("doc_id").cast("string"), lit(s":$i")), 256),
                PadUnit * i / 64 + 1),
              1, PadUnit * i),
            "0123456789abcdef", "azbycxdwevfugths"))
        val padded = when(length(trim(col("text"))) > 0,
          concat(pad, ltrim(col("text")))).otherwise(col("text"))
        base.select(
          (col("doc_id") + lit(i * IdOffset)).as("doc_id"),
          regexp_replace(padded, "(\\S+)", s"$$1xq${i}z").as("text"),
          col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .select(base.columns.toIndexedSeq.map(col): _*)
      }
    }.reduce(_ unionByName _)
  }

  /** N× embeddings where replica i applies a deterministic SIGNED
    * PERMUTATION (rotate dims by an i-dependent odd offset, flip signs
    * by an (i, dim) hash) — an orthogonal transform, so each replica
    * is the original point cloud with relabeled axes: every norm and
    * every intra-replica angle is EXACTLY the original's (the per-
    * replica work of a linear operator is exactly one replica's), while
    * cross-replica directions decorrelate (cosine ≈ 0 in 64 dims), so
    * replicas share no neighborhood, bucket, or cell.
    *
    * This replaces the r10 ±0.1 "twin" perturbation, which planted
    * each original's N replicas INSIDE each other's neighborhoods —
    * under twins the corpus's true near-pair count itself grows ~N²,
    * so no correct similarity search can keep candidates linear and
    * the soak gate's premise is void (the 3× candidate gate measured
    * LSH buckets at 7× for exactly this reason). Neighborhood-disjoint
    * replicas are the vector-space form of the documents' token-
    * disjoint markers: scale-up = more content, not N copies of the
    * same content. */
  def replicatedEmbeddings(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (0 until n).map { i =>
      if (i == 0) base
      else {
        val d = size(col("embedding"))
        val rot = pmod(lit(29L * i), d.cast("long")).cast("int")
        base.select(
          (col("vec_id") + lit(i * IdOffset)).as("vec_id"),
          transform(sequence(lit(0), d - 1), j =>
            (when(pmod(xxhash64(lit(i.toLong), j), lit(2L)) === 0L, lit(1.0f))
              .otherwise(lit(-1.0f))) *
              element_at(col("embedding"), pmod(j + rot, d) + 1))
            .as("embedding"),
          col("label"))
      }
    }.reduce(_ unionByName _)
  }

  /** N× customers for the entity-resolution family: replica i appends a
    * per-REPLICA constant tag `x<ii><6 sha chars>` to every name.
    * Constant-per-replica keeps every intra-replica edit distance
    * exactly the original's (a common suffix never changes the DP), so
    * per-replica ER work mirrors one replica — while any two replicas'
    * tags differ in the index digits plus ~5.6 of 6 digest chars,
    * putting cross-replica names ≥ several edits apart: no shared
    * deletion key (single deletions cannot reconcile multi-char tag
    * differences), no confirmed pair, the edit-domain form of the
    * documents' token-disjoint markers. (A plain per-replica DIGIT
    * suffix would put the same custkey's replicas at edit 1 from each
    * other — N² true pairs, the twin mistake the embeddings soak
    * already made once; SoakSpec pins the tag-distance premise.) */
  def replicatedCustomers(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/customer.parquet")
    (0 until n).map { i =>
      if (i == 0) base
      else base
        .withColumn("c_custkey", col("c_custkey") + lit(i * IdOffset))
        .withColumn("c_name",
          concat(col("c_name"), lit(f"x$i%02d"),
            substring(sha2(lit(s"cust-tag:$i"), 256), 1, 6)))
    }.reduce(_ unionByName _)
  }

  /** N× orders for the TPC-H agg-feeds-join family (q18): replica i's
    * o_orderkey AND o_custkey offset by the same `IdOffset` multiple,
    * so within a replica orders↔lineitem↔customer joins are exactly the
    * original's (per-replica work = one replica; no cross-replica key
    * ever matches). Dates/prices unchanged — the scale-up is "more
    * orders over the same calendar", which is what a growing fact
    * table looks like. */
  def replicatedOrders(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
    requireKeyHeadroom(base, "o_orderkey")
    (0 until n).map { i =>
      if (i == 0) base
      else base
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * IdOffset))
        .withColumn("o_custkey", col("o_custkey") + lit(i * IdOffset))
    }.reduce(_ unionByName _)
  }

  /** N× lineitem: l_orderkey offset in lockstep with
    * [[replicatedOrders]] — the one foreign key the gated shapes join
    * on. Quantities/prices unchanged, so every per-order aggregate
    * (q18's sum_qty) is bit-identical per replica. */
  def replicatedLineitem(spark: SparkSession, sfDir: String, n: Int): DataFrame = {
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
    requireKeyHeadroom(base, "l_orderkey")
    (0 until n).map { i =>
      if (i == 0) base
      else base.withColumn("l_orderkey", col("l_orderkey") + lit(i * IdOffset))
    }.reduce(_ unionByName _)
  }

  /** The replication premise the q18 gate rests on, asserted loudly
    * (mirroring replicatedDocs' marker-clash require): every replica's
    * key range must be disjoint, i.e. max(base key) < IdOffset. TPC-H
    * orderkeys reach ~6M at sf1 and cross 10M around sf2 — past that,
    * replica ranges overlap, cross-replica joins silently match, and
    * the key-lockstep/disjointness gate measures a fiction. One cheap
    * agg on the base table (metadata-adjacent scan of one column). */
  private def requireKeyHeadroom(base: DataFrame, keyCol: String): Unit = {
    val mx = base.agg(max(col(keyCol)).cast("long")).head().getLong(0)
    require(mx < IdOffset,
      s"soak replication premise broken: max($keyCol) = $mx >= IdOffset " +
        s"($IdOffset) — replica key ranges would overlap and the q18 " +
        "lockstep/disjointness gate would be silently voided; raise " +
        "IdOffset (keeping it even) for this corpus")
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
    replicatedCustomers(spark, sfDir, n)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    replicatedOrders(spark, sfDir, n)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    replicatedLineitem(spark, sfDir, n)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    val others = Seq("region", "nation", "supplier", "part")
    others.foreach { t =>
      Files.copy(Paths.get(s"$sfDir/$t.parquet"),
        Paths.get(s"$out/$t.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    out
  }
}
