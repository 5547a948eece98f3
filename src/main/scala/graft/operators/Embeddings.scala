package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ArrayType(FloatType)) —
  * the north-star extension beyond the reference's surface (the
  * reference has no vector ops at all; BASELINE.json names similarity
  * search as a target capability).
  *
  * Two paths:
  *   - [[cosineTopK]] — exact brute-force top-k for a (small) query
  *     set: broadcast the queries, stream the candidate corpus through
  *     a BroadcastNestedLoopJoin. This is the correctness baseline and
  *     the right physical shape when |queries| ≪ |corpus| (the corpus
  *     side never shuffles, never collects).
  *   - [[annLsh]] — sign-random-hyperplane LSH: every vector gets a
  *     small bucket id from deterministic integer hyperplanes, then
  *     candidates come from a bucket-equijoin (shuffle hash join on the
  *     bucket key) — NO all-pairs product anywhere, so the plan
  *     survives corpus² growth at 100 TB.
  *
  * Determinism contract (shared with the DuckDB oracle): float
  * components are quantized to int64 fixed-point (×1e7) so every dot
  * product and norm is an EXACT integer sum (order-independent, no
  * float summation drift); the cosine is then derived in double from
  * those exact integers — bit-identical in any engine that follows the
  * same formula. Quantization error (~1e-7 relative) is irrelevant for
  * similarity ranking and bounded, unlike cross-engine float-sum drift
  * which is unbounded in ulps.
  */
object Embeddings {

  /** Fixed-point scale: |component| ≤ ~0.6 in the fixtures; 0.6e7
    * squared × 64 dims ≈ 2.3e15 < 2^53, so norms and dots stay exactly
    * representable both as int64 and as double. */
  val Scale: Double = 1e7

  /** int64 fixed-point quantization of a float/double array column. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * lit(Scale)).cast("long"))

  /** Exact integer dot product of two quantized (long) array columns —
    * a native codegen'd expression ([[graft.expressions.DotProductLong]]).
    * Same exact int64 sum as the HOF form
    * `aggregate(zip_with(a, b, _*_), 0L, _+_)` it replaced, but with no
    * per-row array allocation and no WholeStageCodegen break: this runs
    * once per candidate PAIR in every similarity operator, and the HOF
    * form (CodegenFallback) was the hottest interpreted code in the
    * library. */
  def dotQ(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnAdapter.column(
      graft.expressions.DotProductLong(
        org.apache.spark.sql.graft.ColumnAdapter.expression(a),
        org.apache.spark.sql.graft.ColumnAdapter.expression(b)))

  /** Cosine from exact integer dot + squared norms (double division —
    * deterministic given identical integer inputs). */
  def cosine(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** Per-vector 8-bit scalar quantization — the embedding STORAGE op
    * (4-byte float component → 1-byte code, the standard first rung of
    * vector compression before IVF/PQ): each component is mapped to
    * `((x − mn) · 255) div (mx − mn)` over the vector's own [mn, mx]
    * range. Runs entirely on the int64 fixed-point representation, so
    * codes and reconstruction errors are exact integers — the DuckDB
    * oracle replays the identical arithmetic bit-for-bit.
    *
    * Scale shape: one narrow projection — no shuffle, no agg, no join;
    * at 100 TB this is a pure map over the corpus, bounded by scan +
    * write bandwidth. Output per vector: the range (mn, mx), an
    * order-weighted checksum of the code array (Σ codeᵢ·(i+1) mod
    * 1e9+7 — position-sensitive, so any code or permutation change
    * breaks parity), and the max absolute reconstruction error in
    * fixed-point units (the quantization-quality audit a pipeline
    * would alert on). A constant vector (mx = mn) degenerates to
    * all-zero codes with zero error.
    */
  def scalarQuantize(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), quantize(col(vecCol)).as("__qv"))
      .select(col(idCol), col("__qv"),
        array_min(col("__qv")).as("mn"), array_max(col("__qv")).as("mx"))
      .withColumn("__codes", expr(
        """CASE WHEN mx > mn
          |     THEN transform(__qv, x -> ((x - mn) * 255) div (mx - mn))
          |     ELSE transform(__qv, x -> CAST(0 AS BIGINT)) END""".stripMargin))
      .select(col(idCol), col("mn"), col("mx"),
        expr("""aggregate(
            |  zip_with(__codes, sequence(1L, size(__codes)), (c, i) -> c * i),
            |  0L, (a, b) -> a + b) % 1000000007""".stripMargin)
          .as("code_sig"),
        expr("""array_max(zip_with(__qv, __codes,
            |  (x, c) -> abs(x - (mn + (c * (mx - mn)) div 255))))""".stripMargin)
          .as("err_max"))

  /** vec_id, quantized vector, exact squared norm — the shared prep
    * projection (narrow, codegen'd, computed once before any join).
    * Drops zero-norm vectors: every consumer here scores by COSINE,
    * which a zero vector does not have. `private[graft]` so the
    * battery's oracle-truth frames reuse the exact same quantization
    * instead of re-implementing it. */
  private[graft] def prepped(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    preppedAll(emb, idCol, vecCol).filter(col("__nsq") > 0)

  /** [[prepped]] WITHOUT the zero-norm filter — for L2-domain
    * consumers ([[l2TopK]]), where a zero vector is a legitimate point
    * (sqdist to it is just |q|²). */
  private[graft] def preppedAll(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val qv = quantize(col(vecCol))
    emb.select(col(idCol), qv.as("__qv"))
      .withColumn("__nsq", dotQ(col("__qv"), col("__qv")))
  }

  /** Exact brute-force cosine top-k: for each query vector (rows
    * matching `queryPred`), the k nearest corpus vectors (self
    * excluded). Output: (query_id, neighbor_id, rank, cos_x1e6).
    *
    * Physical shape: queries are broadcast (they are the small side by
    * construction); the corpus side is a single narrow scan. The only
    * wide operation is the per-query top-k window, keyed by query — at
    * 1000 executors that is |queries| independent sorts of corpus
    * partitions, which AQE splits fine. For huge k·|queries| use
    * [[annLsh]] instead.
    */
  def cosineTopK(
      emb: DataFrame,
      queryPred: Column,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpus = prepped(emb, idCol, vecCol)
    val queries = prepped(emb.filter(queryPred), idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__qv").as("__qqv"), col("__nsq").as("__qnsq"))

    val pairs = corpus
      .join(broadcast(queries), col(idCol) =!= col("query_id"))
      .withColumn("__cos", cosine(dotQ(col("__qqv"), col("__qv")), col("__qnsq"), col("__nsq")))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col(idCol))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col(idCol).as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        round(col("__cos") * 1e6).cast("long").as("cos_x1e6"))
  }

  /** Exact brute-force squared-L2 top-k — the companion of
    * [[cosineTopK]] in the metric the PQ/IVF index family actually
    * ranks by (ADC approximates exact squared L2, so THIS is the
    * ground truth an index recall measurement must compare against —
    * see [[graft.operators.Eval.topKRecall]]). Distances are exact
    * int64 over the quantized vectors: sqdist = |q|² + |c|² − 2·q·c,
    * no floats, so ranking (ties → smaller neighbor id) is
    * bit-reproducible in any engine. Unlike the cosine family, ZERO
    * vectors are legitimate L2 points (sqdist to one is |q|²) and are
    * NOT dropped — exact truth must be complete; index paths that
    * cannot hold them (cosine cells) simply score misses against it.
    * Same physical shape as [[cosineTopK]]: broadcast query batch, one
    * narrow corpus scan, per-query WindowGroupLimit top-k. Output:
    * (query_id, neighbor_id, rank, sqdist). */
  def l2TopK(
      emb: DataFrame,
      queryPred: Column,
      k: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val corpus = preppedAll(emb, idCol, vecCol)
    val queries = preppedAll(emb.filter(queryPred), idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__qv").as("__qqv"),
        col("__nsq").as("__qnsq"))
    val pairs = corpus
      .join(broadcast(queries), col(idCol) =!= col("query_id"))
      .withColumn("__sqd",
        col("__qnsq") + col("__nsq") - lit(2L) * dotQ(col("__qqv"), col("__qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sqd"), col(idCol))
    pairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(
        col("query_id"),
        col(idCol).as("neighbor_id"),
        col("rank").cast("long").as("rank"),
        col("__sqd").as("sqdist"))
  }

  /** Default number of sign-hyperplanes (buckets = 2^planes). 4 ⇒ 16
    * buckets — sized for the fixture corpus; a real deployment derives
    * it from corpus size via [[planesFor]] (buckets ≈ corpus / desired
    * candidate-set size). With a FIXED plane count the bucket equijoin
    * is n²/2^planes — still quadratic — so the dial must actually be
    * turned at scale; [[annLsh]] takes it as a parameter. */
  val Planes: Int = 4

  /** Planes sized so the expected bucket population ≈ targetBucketSize:
    * ceil(log₂(corpusSize / targetBucketSize)), clamped to [1, 62].
    * Expected candidate rows ≈ n · targetBucketSize — linear in n. */
  def planesFor(corpusSize: Long, targetBucketSize: Long = 1024L): Int = {
    val buckets = math.max(1L, corpusSize / math.max(1L, targetBucketSize))
    val ceilLog2 =
      if (buckets <= 1L) 1
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)
    math.min(62, math.max(1, ceilLog2))
  }

  /** Deterministic integer hyperplane weights w(p, j) for plane p,
    * 0-based dimension j: a splitmix64 avalanche of (p, j) folded to
    * [−(M−1)/2, (M−1)/2], materialized as per-plane LITERAL arrays.
    * No RNG state, so every engine derives identical planes — the
    * DuckDB oracle interpolates the SAME values as list literals
    * (this function is the single source for both sides).
    *
    * Why not a closed-form arithmetic weight the SQL could compute
    * inline? The previous linear-congruential form
    * w = (p·A + j·B) % M − c made successive PLANES nearly parallel:
    * w(p+1, ·) − w(p, ·) is a constant shift in the mod-M lattice, so
    * adding planes barely re-partitioned the corpus (measured on the
    * sf0.001 embeddings: plane 5 and 6 together cut bucket-mate pairs
    * only 32668 → 25582, and at 10 planes just 64 of 1024 sign
    * patterns were occupied — bucket refinement stalled exactly when
    * the 3× soak needed it to keep LSH candidates linear). Avalanche
    * mixing makes planes statistically independent; the weight TABLE
    * (≤ planes·[[WeightDims]] longs) rides in the plan as literals,
    * the per-row cost is one array lookup per element — cheaper than
    * the three modular ops it replaces. */
  val WeightMod = 2001L

  /** Weight-table width: dimensions ≥ WeightDims reuse weights mod
    * WeightDims (a documented mild plane correlation for very wide
    * vectors; the alternative — unbounded literal tables — bloats
    * every plan). */
  val WeightDims = 1024

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The single cross-engine weight definition: plane `globalPlane`
    * (= table·planes + p), dimension `dim`. */
  def planeWeight(globalPlane: Int, dim: Int): Long =
    Math.floorMod(mix64(globalPlane.toLong * WeightDims + dim), WeightMod) -
      (WeightMod - 1) / 2

  private def weightRow(globalPlane: Int): Seq[Long] =
    (0 until WeightDims).map(j => planeWeight(globalPlane, j))

  /** Bucket id from sign bits of the quantized vector against `planes`
    * hyperplanes — pure integer arithmetic, exact. `table` selects an
    * independent hyperplane family (global plane index = table·planes
    * + p), so k tables give k independent bucketings for multi-probe
    * recall; table 0 reproduces the original single-family buckets. */
  def bucketOf(qv: Column, planes: Int = Planes, table: Int = 0): Column =
    (0 until planes).map { p =>
      val w = typedlit(weightRow(table * planes + p))
      val dot = aggregate(
        transform(qv, (x, j) => x * element_at(w, (j % WeightDims) + 1)),
        lit(0L), (acc, v) => acc + v)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: every vector is assigned a sign-LSH bucket; its
    * candidate set is its bucket-mates (shuffle hash equijoin on the
    * bucket — no cross product). Emits each vector's best bucket-mate
    * by exact cosine: (vec_id, bucket, neighbor_id, cos_x1e6), with
    * neighbor_id = -1 / cos_x1e6 = 0 when the vector is alone in its
    * bucket (the honest ANN answer — recall < 1 is the price of never
    * doing all-pairs; a sentinel, not NULL, so output dtypes stay
    * stable for the differential harness).
    *
    * Scale dials: `planes` (bucket granularity — wire it from corpus
    * size via [[planesFor]] so candidates stay ≈ n · targetBucketSize)
    * and `tables` (recall — k independent hyperplane families; a true
    * near-neighbor split by one family's planes is recovered when ANY
    * family buckets the pair together, miss rate ≈ (1−(1−θ/π)^planes)^k
    * at angle θ). Defaults keep the fixture-sized single-family form.
    */
  /** Shared LSH candidate machinery: (base with its table-0 `__bucket`,
    * scored bucket-mate pairs). One bucket per table; candidates =
    * bucket-mates in ANY table, so a pair sharing a bucket in several
    * tables appears once PER table — callers absorb the duplicates
    * (max_by for top-1, a (id, nid) re-agg for top-k). */
  private def lshScoredCandidates(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      tables: Int): (DataFrame, DataFrame) = {
    require(planes >= 1 && planes <= 62, s"planes must be in [1, 62], got $planes")
    require(tables >= 1, s"tables must be >= 1, got $tables")
    val base = prepped(emb, idCol, vecCol)
      .withColumn("__tb",
        array((0 until tables).map(t => bucketOf(col("__qv"), planes, t)): _*))
      .withColumn("__bucket", col("__tb")(0))

    // Materialized-once seam (the winnowPairs structure): both join
    // sides below re-run the quantize + plane-hash generate without an
    // exchange of their own — the bucketOf lambdas defeat canonical
    // plan equality, so AQE never reuses the sides' exchanges (measured
    // at sf0.1: two identical ~1.3 s single-task bucket stages in
    // emb_ann_lsh_scaled, and the same pair inside every knnGraph
    // consumer). One repartition on the bucket key is the shared
    // canonical shuffle; the self-join then needs no further exchange.
    val exploded = base.select(
      col(idCol), col("__qv"), col("__nsq"),
      posexplode(col("__tb")).as(Seq("__ti", "__b")))
      .repartition(col("__ti"), col("__b"))
    val a = exploded.select(
      col(idCol), col("__ti"), col("__b"), col("__qv"), col("__nsq"))
    val b = exploded.select(
      col(idCol).as("__nid"), col("__ti").as("__nti"), col("__b").as("__nb"),
      col("__qv").as("__nqv"), col("__nsq").as("__nnsq"))

    val scored = a
      .join(b, col("__ti") === col("__nti") && col("__b") === col("__nb") &&
        col(idCol) =!= col("__nid"))
      .withColumn("__cos",
        cosine(dotQ(col("__qv"), col("__nqv")), col("__nsq"), col("__nnsq")))
    (base, scored)
  }

  def annLsh(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      planes: Int = Planes,
      tables: Int = 1): DataFrame = {
    val (base, scored) = lshScoredCandidates(emb, idCol, vecCol, planes, tables)
    // top-1 as a max_by hash aggregation (cos desc, neighbor id asc on
    // ties) — no per-partition sort, partial agg map-side, unlike the
    // window row_number formulation.
    val best = scored
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("__nid"), col("__cos")),
        struct(col("__cos"), -col("__nid"))).as("__top"))
      .select(col(idCol),
        col("__top.__nid").as("__nid"), col("__top.__cos").as("__cos"))

    base.select(col(idCol), col("__bucket"))
      .join(best, Seq(idCol), "left")
      .select(
        col(idCol),
        col("__bucket").as("bucket"),
        coalesce(col("__nid"), lit(-1L)).as("neighbor_id"),
        coalesce(round(col("__cos") * 1e6).cast("long"), lit(0L)).as("cos_x1e6"))
  }

  /** Approximate k-NN GRAPH: top-`k` bucket-mate neighbors per vector —
    * the all-docs generalization of [[annLsh]]'s top-1 and the input
    * every semantic-dedup / graph-clustering stage consumes. Multi-
    * table candidate duplicates are re-agged to one row per (id,
    * neighbor) BEFORE ranking (a row_number over duplicated pairs
    * would let one neighbor occupy several of the k slots); the rank
    * filter compiles to WindowGroupLimit, so map tasks forward ≤ k
    * candidates per vector. Vectors alone in their buckets emit no
    * edges (a graph, not a sentinel table). Ordering: cosine
    * descending on the exact-int-derived double, neighbor id
    * ascending on ties — deterministic cross-engine.
    */
  def knnGraph(
      emb: DataFrame,
      k: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      planes: Int = Planes,
      tables: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val (_, scored) = lshScoredCandidates(emb, idCol, vecCol, planes, tables)
    scored
      .groupBy(col(idCol), col("__nid"))
      .agg(max(col("__cos")).as("__cos"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("__cos").desc, col("__nid"))).cast("long"))
      .where(col("rnk") <= k)
      .select(col(idCol), col("__nid").as("neighbor_id"),
        round(col("__cos") * 1e6).cast("long").as("cos_x1e6"), col("rnk"))
  }

  /** Per-group embedding centroids as exact integer element-wise means
    * of the quantized vectors — the vector-AGGREGATION shape (cluster
    * profiles, per-source embedding drift, IVF retraining seeds):
    * posexplode to (group, dim, component) and ONE hash-agg with
    * map-side partials — no per-group collect, no array re-assembly
    * in a reduce task; output rows = groups × dims. Emitted long-form
    * (group, dim, n_vecs, mean_q) — integer `div` mean, engine-exact.
    */
  def groupCentroids(
      emb: DataFrame,
      groupExpr: Column,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    prepped(emb, idCol, vecCol)
      .select(groupExpr.as("grp"), posexplode(col("__qv")).as(Seq("dim", "q")))
      .groupBy(col("grp"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"), expr("sum(q) div count(1)").as("mean_q"))

  /** Embedding-cosine near-duplicate detection — the vector-space member
    * of the dedup family (exact / n-gram / MinHash / SimHash live in
    * [[NearDup]]): emit pairs whose cosine is ≥ thresholdMicro/1e6,
    * candidates drawn from the sign-LSH buckets. Output:
    * (vec_a < vec_b, cos_x1e6), one row per qualifying pair.
    *
    * Contract (and what the differential oracle replicates): candidates
    * are BUCKET-MATES in any of the `tables` hyperplane families — the
    * deliberate LSH recall trade, not all-pairs. A pair split by every
    * family is not emitted even if its true cosine passes the
    * threshold; raise `tables` (or `planes` via [[planesFor]]) to push
    * the miss rate down. The threshold compare is on the rounded
    * fixed-point cos_x1e6, so both engines threshold identical
    * integers. */
  def cosineNearDupPairs(
      emb: DataFrame,
      thresholdMicro: Long = 950000L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      planes: Int = Planes,
      tables: Int = 1): DataFrame = {
    require(planes >= 1 && planes <= 62, s"planes must be in [1, 62], got $planes")
    require(tables >= 1, s"tables must be >= 1, got $tables")
    val base = prepped(emb, idCol, vecCol)
      .withColumn("__tb",
        array((0 until tables).map(t => bucketOf(col("__qv"), planes, t)): _*))
    // same materialized-once bucket seam as lshScoredCandidates
    val exploded = base.select(
      col(idCol), col("__qv"), col("__nsq"),
      posexplode(col("__tb")).as(Seq("__ti", "__b")))
      .repartition(col("__ti"), col("__b"))
    val a = exploded.select(
      col(idCol).as("vec_a"), col("__ti"), col("__b"),
      col("__qv"), col("__nsq"))
    val b = exploded.select(
      col(idCol).as("vec_b"), col("__ti").as("__nti"), col("__b").as("__nb"),
      col("__qv").as("__nqv"), col("__nsq").as("__nnsq"))
    a.join(b, col("__ti") === col("__nti") && col("__b") === col("__nb") &&
        col("vec_a") < col("vec_b"))
      .withColumn("cos_x1e6",
        round(cosine(dotQ(col("__qv"), col("__nqv")), col("__nsq"), col("__nnsq")) * 1e6)
          .cast("long"))
      .filter(col("cos_x1e6") >= thresholdMicro)
      .select(col("vec_a"), col("vec_b"), col("cos_x1e6"))
      .distinct() // a pair bucketed together by several tables emits once
  }

  /** SemDeDup — semantic deduplication in embedding space (Abbas et
    * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): cluster the corpus with the IVF coarse
    * quantizer, compare pairs only WITHIN a cell, and drop every
    * vector with a ≥-threshold twin of smaller id (keep-first — the
    * same survivor rule as the exact-dedup family, so downstream
    * semi/anti joins compose unchanged).
    *
    * vs [[cosineNearDupPairs]]: LSH buckets are data-OBLIVIOUS (fixed
    * hyperplanes, recall depends on luck near bucket boundaries);
    * SemDeDup's cells are data-DEPENDENT (rate-sampled seeds,
    * optionally Lloyd-refined), which is the published formulation —
    * semantic twins land in the same cell because the cell follows
    * the density, and the intra-cell comparison is exhaustive (no
    * banding miss INSIDE a cell).
    *
    * Scale shape: one n·K broadcast assignment pass (K bounded via
    * [[centroidStepFor]]) + ONE cell equijoin — pair cost Σ|cell|² ≈
    * n·(n/K), the paper's bound; with K ∝ n (fixed step) candidates
    * stay linear in n. No all-pairs product anywhere; the keep/drop
    * verdict is one `min` hash-agg + a left join, both on the id key.
    *
    * Output: (vec_id, cell, dup_of, kept) — `dup_of` = the smallest
    * smaller-id cellmate at cosine ≥ threshold (−1 when none), `kept`
    * = no such twin exists. Thresholding compares the ROUNDED
    * fixed-point cos_x1e6, so both engines threshold identical
    * integers.
    */
  def semDedup(
      emb: DataFrame,
      centroidStep: Long = CentroidStep,
      thresholdMicro: Long = 950000L,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seedByHash: Boolean = false,
      kmeansIter: Int = 0): DataFrame = {
    require(centroidStep >= 1, s"centroidStep must be >= 1, got $centroidStep")
    val base = prepped(emb, idCol, vecCol)
    val cents = ivfCentroids(emb, centroidStep, idCol, vecCol, seedByHash, kmeansIter)
    // argmax-cos cell per vector (ties → smaller cell id) — identical
    // ordering contract to ivfAssign, and the same PACKED in-row
    // argmax ([[graft.expressions.IvfArgmaxCell]]) as annIvf: with a
    // fixed step K grows ∝ n, so the max_by grid this replaced was an
    // n·K row surface (the 10× soak's candidate gate measured it at
    // exactly 100× — both factors grew 10×); the packed loop assigns
    // in one codegen'd pass over the broadcast array. qv/nsq ride
    // along so the pair stage needs no re-join against the corpus.
    val assigned = base.crossJoin(broadcast(packedCentroids(cents)))
      .where(size(col("__cb")) > 0) // empty seed set assigns nothing
      .select(col(idCol), col("__qv"), col("__nsq"),
        argmaxCell(col("__cb"), col("__qv"), col("__nsq")).as("__cell"))
    val a = assigned.select(col(idCol).as("__ua"), col("__cell").as("__acell"),
      col("__qv").as("__aqv"), col("__nsq").as("__ansq"))
    val b = assigned.select(col(idCol).as("__ub"), col("__cell").as("__bcell"),
      col("__qv").as("__bqv"), col("__nsq").as("__bnsq"))
    val dups = a
      .join(b, col("__acell") === col("__bcell") && col("__ua") < col("__ub"))
      .withColumn("__cos",
        round(cosine(dotQ(col("__aqv"), col("__bqv")),
          col("__ansq"), col("__bnsq")) * 1e6).cast("long"))
      .filter(col("__cos") >= thresholdMicro)
      .groupBy(col("__ub")).agg(min(col("__ua")).as("__dupof"))
    assigned.select(col(idCol), col("__cell"))
      .join(dups, col(idCol) === col("__ub"), "left")
      .select(col(idCol), col("__cell").as("cell"),
        coalesce(col("__dupof"), lit(-1L)).as("dup_of"),
        col("__dupof").isNull.as("kept"))
  }

  /** Default IVF centroid sampling step: every `CentroidStep`-th vec_id
    * seeds a cell, so |centroids| ≈ n / step and cells hold ≈ step
    * vectors — candidates ≈ n · step, linear in n at fixed step.
    *
    * A FIXED step couples K = n/step to the corpus: the centroid
    * broadcast grows linearly with n and the n·K assignment pass goes
    * quadratic. A fixed step is therefore only a small-corpus/oracle
    * convenience — at scale, derive the step from the corpus size via
    * [[centroidStepFor]] so K stays bounded. */
  val CentroidStep: Long = 32L

  /** Step sized for a target centroid COUNT: step = n / K, so
    * |centroids| ≈ targetCentroids regardless of corpus size — the
    * centroid broadcast is bounded by construction and the assignment
    * pass stays n·K with K fixed (linear in n). Total per-vector work
    * is K assignment scores + ~n/K cell-mate scores, minimized at
    * K ≈ √n — pick targetCentroids near √(expected corpus size)
    * (e.g. 4096 for a ~16M-vector corpus). `corpusSize` is an
    * ESTIMATE (row-count statistics, not an extra job); K tracks it
    * only through this helper, mirroring [[planesFor]]. */
  def centroidStepFor(corpusSize: Long, targetCentroids: Long = 4096L): Long =
    math.max(1L, corpusSize / math.max(1L, targetCentroids))

  /** Power-of-two sampling step for a BOUNDED codebook: the smallest
    * 2^j ≥ corpusSize/targetK, so K = n/step stays in
    * (targetK/2, targetK] no matter how the corpus grows. This is the
    * PQ-codebook sizing contract ([[pqCentroids]]): unlike the coarse
    * IVF cells — where a FIXED step keeps cell size constant and the
    * candidate equijoin linear — the per-query ADC distance table is
    * q·m·K rows, so K must be corpus-INDEPENDENT or all-corpus query
    * batches go quadratic (the 3× soak measured exactly that: a fixed
    * step grew K 16→48 and the distance-table join 9×). Power-of-two
    * stepping (vs the exact n/targetK) makes the derived step stable
    * across small corpus-estimate drift — the dial moves only when
    * the corpus doubles. `corpusSize` is an estimate (row-count
    * statistics), same contract as [[planesFor]]/[[centroidStepFor]].
    */
  def stepForBoundedK(corpusSize: Long, targetK: Long = 16L): Long = {
    val raw = math.max(1L, corpusSize / math.max(1L, targetK))
    val floor = java.lang.Long.highestOneBit(raw)
    if (floor == raw) floor else floor << 1
  }

  /** Centroid-seed predicate. Dense ids (the fixtures): rate-sample by
    * `id % step == 0`. Arbitrary/sparse ids: `seedByHash` rate-samples
    * on `xxhash64(id) % step == 0` instead — same expected K = n/step
    * without any density assumption (and still deterministic: same
    * ids, same seeds, no RNG state). */
  def centroidSeedPred(id: Column, step: Long, seedByHash: Boolean = false): Column =
    if (seedByHash) pmod(xxhash64(id), lit(step)) === 0 else id % step === 0

  /** IVF-style ANN: a deterministic coarse quantizer instead of random
    * hyperplanes. Every vector whose id divides `centroidStep` seeds a
    * cell; each vector is assigned to its maximum-cosine centroid, and
    * its candidate set is the members of its top-`nprobe` cells (the
    * inverted-file probe dial: nprobe=1 searches only the home cell;
    * higher values recover true neighbors that sit just across a cell
    * boundary, at candidate cost ∝ nprobe). Output: (vec_id, cell =
    * home centroid id, neighbor_id, cos_x1e6), sentinel −1/0 for a
    * vector with no candidates.
    *
    * vs [[annLsh]]: data-dependent cells adapt to clustered corpora
    * (hyperplane buckets are data-oblivious), at the cost of the
    * assignment pass. `kmeansIter` Lloyd iterations ([[lloydRefine]])
    * turn the rate-sampled seeds into genuinely data-dependent
    * centroids — in exact integer arithmetic, so the refinement (and
    * the DuckDB oracle) stays bit-identical with no RNG state.
    * The plan shape — broadcast K centroids, n·K assignment scores,
    * cell equijoin — scales iff K is BOUNDED: size `centroidStep` from
    * the corpus via [[centroidStepFor]] (step = n/K, K fixed or ≈ √n)
    * rather than freezing it, or the broadcast grows linearly with n
    * and the assignment goes quadratic.
    *
    * The assignment is an explicit crossJoin against the BROADCAST
    * centroid table: K = n/step rows on the build side, so this is the
    * canonical n·K nested-loop scoring pass of IVF assignment, not an
    * n² Cartesian. */
  /** One Lloyd refinement of a centroid table against the corpus:
    * assign every vector to its argmax-cosine centroid, then replace
    * each centroid's vector with the elementwise FLOOR-division mean
    * of its members' quantized vectors — exact integer arithmetic
    * (floorDiv, not truncation: pmod first, so negative sums round the
    * same way DuckDB's `//`-after-pmod does), so every engine derives
    * bit-identical refined centroids. Cells that capture no members, or
    * whose mean is the zero vector, drop out — standard Lloyd dropout,
    * deterministic. Cost per iteration: one n·K broadcast scoring pass
    * + an n·d dimension shuffle (d = vector width) — the canonical
    * distributed k-means step. */
  private def lloydRefine(base: DataFrame, cents: DataFrame, idCol: String): DataFrame = {
    // assignment via the same packed-array codegen loop as ivfAssign —
    // each Lloyd iteration scores n·K combinations with O(row) memory
    // (the row-grid + max_by form was the soak's OOM-cliff shape)
    val assigned = base.crossJoin(broadcast(packedCentroids(cents)))
      .where(size(col("__cb")) > 0)
      .select(col(idCol), col("__qv"),
        argmaxCell(col("__cb"), col("__qv"), col("__nsq")).as("__cell"))
    val means = assigned
      .select(col("__cell"), posexplode(col("__qv")).as(Seq("__j", "__x")))
      .groupBy(col("__cell"), col("__j"))
      .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__c"))
      .withColumn("__m", expr("(__s - pmod(__s, __c)) div __c"))
    means.groupBy(col("__cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("__j"), col("__m")))),
        x => x.getField("__m")).as("__cqv"))
      .select(col("__cell").as("__cid"), col("__cqv"))
      .withColumn("__cnsq", dotQ(col("__cqv"), col("__cqv")))
      .filter(col("__cnsq") > 0)
  }

  /** The coarse-quantizer table annIvf builds internally — (`__cid`,
    * quantized centroid vector `__cqv`, norm² `__cnsq`) — exposed as
    * the INDEX-MAINTENANCE seam: a deployment computes this once
    * (optionally Lloyd-refined), persists it as parquet, and assigns
    * daily increments against the frozen table with [[ivfAssign]] —
    * cell identities stay stable across runs, so inverted lists only
    * ever append. Rate-sampled seeds, optionally refined into
    * data-dependent means; ids (hence cell identities) persist from
    * the seeds. */
  def ivfCentroids(
      emb: DataFrame,
      centroidStep: Long = CentroidStep,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seedByHash: Boolean = false,
      kmeansIter: Int = 0): DataFrame = {
    require(centroidStep >= 1, s"centroidStep must be >= 1, got $centroidStep")
    require(kmeansIter >= 0, s"kmeansIter must be >= 0, got $kmeansIter")
    val base = prepped(emb, idCol, vecCol)
    val seeds = base.filter(centroidSeedPred(col(idCol), centroidStep, seedByHash))
      .select(col(idCol).as("__cid"), col("__qv").as("__cqv"), col("__nsq").as("__cnsq"))
    (1 to kmeansIter).foldLeft(seeds)((c, _) => lloydRefine(base, c, idCol))
  }

  /** The whole centroid table packed into ONE cid-ordered array row —
    * the broadcast side of the fold-based assignment (the IVF sibling
    * of [[pqEncode]]'s packed codebook). */
  private def packedCentroids(centroids: DataFrame): DataFrame =
    centroids.groupBy()
      .agg(sort_array(collect_list(
        struct(col("__cid"), col("__cqv"), col("__cnsq")))).as("__cb"))

  /** Argmax-cosine cell id from an in-row loop over the packed
    * centroid array: max cosine, exact double compare, ties → smaller
    * cid (strict `>` over the cid-ascending array keeps the first
    * maximum — the same ordering contract as the max_by grid-agg it
    * replaces). One accumulator per row, no n·K row grid, no
    * SortAggregate — the round-9 soak's OOM-cliff lesson applied to
    * the assignment pass — and the loop is a native codegen'd
    * expression ([[graft.expressions.IvfArgmaxCell]]), so it runs
    * inside whole-stage codegen at grid-agg speed. */
  private def argmaxCell(cb: Column, qv: Column, nsq: Column): Column =
    org.apache.spark.sql.graft.ColumnAdapter.column(
      graft.expressions.IvfArgmaxCell(
        org.apache.spark.sql.graft.ColumnAdapter.expression(cb),
        org.apache.spark.sql.graft.ColumnAdapter.expression(qv),
        org.apache.spark.sql.graft.ColumnAdapter.expression(nsq)))

  /** Top-`nprobe` cosine cells from the same packed array — element 1
    * is [[argmaxCell]]'s home cell (identical ordering contract), so
    * multi-probe assignment and probe lists come from ONE evaluation
    * (see [[graft.expressions.IvfTopCells]]). */
  private def topCells(cb: Column, qv: Column, nsq: Column, nprobe: Int): Column =
    org.apache.spark.sql.graft.ColumnAdapter.column(
      graft.expressions.IvfTopCells(
        org.apache.spark.sql.graft.ColumnAdapter.expression(cb),
        org.apache.spark.sql.graft.ColumnAdapter.expression(qv),
        org.apache.spark.sql.graft.ColumnAdapter.expression(nsq), nprobe))

  /** Assign vectors to their argmax-cosine cell of an EXISTING
    * centroid table (same ordering contract as the inline assignment:
    * max cosine, ties → smaller cell id) — the incremental half of the
    * IVF index: one broadcast of K packed centroids over the increment
    * only, the accumulated corpus untouched. Output: (id, cell).
    *
    * `idCol` must be unique per vector (the fixture contract, and the
    * contract of every index here — centroid identities ARE ids). The
    * fold emits one row per INPUT row, so a duplicate id would yield
    * duplicate (id, cell) rows and silently corrupt the id-keyed
    * stores downstream — by default the contract is ENFORCED in-plan
    * ([[graft.core.Guards.requireUniqueIds]]): execution fails naming
    * the offending id. The guard costs one hash shuffle of the input
    * on `idCol`, right for the increment/query frames this seam
    * serves; a corpus-sized caller that already validated ids at
    * ingest passes `assertUniqueIds = false` and keeps the narrow
    * scan→broadcast-join→project plan (then: one output row per input
    * row, duplicates and all — pinned by NearDupEmbeddingsSpec). */
  def ivfAssign(
      emb: DataFrame,
      centroids: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      assertUniqueIds: Boolean = true): DataFrame = {
    val in =
      if (assertUniqueIds) graft.core.Guards.requireUniqueIds(emb, idCol)
      else emb
    prepped(in, idCol, vecCol).crossJoin(broadcast(packedCentroids(centroids)))
      .where(size(col("__cb")) > 0) // empty index assigns nothing
      .select(col(idCol),
        argmaxCell(col("__cb"), col("__qv"), col("__nsq")).as("cell"))
  }

  def annIvf(
      emb: DataFrame,
      centroidStep: Long = CentroidStep,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1,
      seedByHash: Boolean = false,
      kmeansIter: Int = 0): DataFrame = {
    require(centroidStep >= 1, s"centroidStep must be >= 1, got $centroidStep")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    require(kmeansIter >= 0, s"kmeansIter must be >= 0, got $kmeansIter")
    val base = prepped(emb, idCol, vecCol)
    val cents = ivfCentroids(emb, centroidStep, idCol, vecCol, seedByHash, kmeansIter)

    // Cell assignment: an in-row fold over the packed centroid array
    // (argmax cosine, ties → smaller id) — one row per vector, no n·K
    // row grid, no aggregate at all (see [[argmaxCell]]). nprobe > 1
    // (the recall dial — a true neighbor sitting just across a cell
    // boundary is recovered by probing the query's top-nprobe cells)
    // ranks cells through the SAME fold ([[topCells]]: top-nprobe
    // slots maintained in-row, element 1 = the home cell), so the
    // corpus is scanned once per consumer and the K-rows-per-vector
    // grid + window sort the ranking used to need never exist.
    val packedCb = broadcast(packedCentroids(cents))
    val scanned = base.crossJoin(packedCb).where(size(col("__cb")) > 0)
    // nprobe=1 keeps the scalar argmax fold (no per-row array); the
    // multi-probe fold's element 1 is the identical home cell.
    val assigned =
      if (nprobe == 1)
        scanned.select(col(idCol), col("__qv"), col("__nsq"),
          argmaxCell(col("__cb"), col("__qv"), col("__nsq")).as("__cell"))
      else
        scanned.select(col(idCol), col("__qv"), col("__nsq"),
          topCells(col("__cb"), col("__qv"), col("__nsq"), nprobe).as("__cells"))
          .select(col(idCol), col("__qv"), col("__nsq"),
            element_at(col("__cells"), 1).as("__cell"), col("__cells"))

    // probe-side cells: home cell at nprobe=1 (same frame, no explode)
    val probes =
      if (nprobe == 1) assigned.select(col(idCol), col("__cell").as("__probe"),
        col("__qv"), col("__nsq"))
      else assigned.select(col(idCol),
        explode(col("__cells")).as("__probe"), col("__qv"), col("__nsq"))

    val b = assigned.select(
      col(idCol).as("__nid"), col("__cell").as("__ncell"),
      col("__qv").as("__nqv"), col("__nsq").as("__nnsq"))
    val best = probes
      .join(b, col("__probe") === col("__ncell") && col(idCol) =!= col("__nid"))
      .withColumn("__cos", cosine(dotQ(col("__qv"), col("__nqv")), col("__nsq"), col("__nnsq")))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("__nid"), col("__cos")),
        struct(col("__cos"), -col("__nid"))).as("__top"))
      .select(col(idCol),
        col("__top.__nid").as("__nid"), col("__top.__cos").as("__cos"))

    assigned.select(col(idCol), col("__cell"))
      .join(best, Seq(idCol), "left")
      .select(
        col(idCol),
        col("__cell").as("cell"),
        coalesce(col("__nid"), lit(-1L)).as("neighbor_id"),
        coalesce(round(col("__cos") * 1e6).cast("long"), lit(0L)).as("cos_x1e6"))
  }

  /** Contrastive-pair mining over the approximate k-NN graph — for
    * each labeled anchor, its best same-label neighbor (`pos`, the
    * easy positive) and its best different-label neighbor (`neg`, the
    * HARD negative: closest in embedding space yet labeled apart).
    * This is the standard mining step for contrastive/triplet
    * training and for label-noise audits (a `neg` at cosine ≈ 1 is a
    * probable mislabel).
    *
    * Shape: [[knnGraph]]'s bucketed candidates (never all-pairs) →
    * two equijoins on the tiny (id, label) projection to tag each
    * edge's endpoints → one `max_by` hash-agg per (anchor, kind). No
    * window sort: top-1 per group is an ordered-struct max with
    * map-side partials, the same trick as [[annLsh]]. Ranking
    * compares the INTEGER `cos_x1e6` (ties → smaller neighbor id),
    * so the pick is engine-exact given the already-oracle-checked
    * graph. Anchors whose k-NN list has no same-label (or no
    * cross-label) neighbor emit no row of that kind.
    */
  def contrastivePairs(
      emb: DataFrame,
      k: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label",
      planes: Int = Planes,
      tables: Int = 1): DataFrame = {
    val edges = knnGraph(emb, k, idCol, vecCol, planes, tables)
    val labels = emb.select(col(idCol), col(labelCol))
    val nLab = labels.select(col(idCol).as("neighbor_id"), col(labelCol).as("__nlabel"))
    edges
      .join(labels, idCol)
      .join(nLab, "neighbor_id")
      .withColumn("kind",
        when(col(labelCol) === col("__nlabel"), lit("pos")).otherwise(lit("neg")))
      .groupBy(col(idCol), col(labelCol), col("kind"))
      .agg(max_by(
          struct(col("neighbor_id"), col("cos_x1e6")),
          struct(col("cos_x1e6"), -col("neighbor_id"))).as("__top"))
      .select(col(idCol), col(labelCol), col("kind"),
        col("__top.neighbor_id").as("pair_id"),
        col("__top.cos_x1e6").as("cos_x1e6"))
  }

  // ------------------------------------------------- product quantization

  /** Subspace count for PQ: 64-dim fixtures → 8 subvectors of 8 dims.
    * The vector width must be divisible by it. */
  val PqSubspaces = 8

  /** (id, sub, __sqv, __snsq) — every vector split into
    * [[PqSubspaces]] quantized subvectors with exact squared norms.
    * One narrow codegen pass (slice + posexplode), no shuffle. */
  private def subvectors(
      emb: DataFrame, m: Int, idCol: String, vecCol: String): DataFrame = {
    val qv = quantize(col(vecCol))
    emb.select(col(idCol), qv.as("__qv"))
      .where(size(col("__qv")) % m === 0)
      .withColumn("__d", (size(col("__qv")) / m).cast("int"))
      .select(col(idCol), posexplode(
        expr(s"transform(sequence(0, ${m - 1}), j -> slice(__qv, j * __d + 1, __d))"))
        .as(Seq("sub", "__sqv")))
      .withColumn("__snsq", dotQ(col("__sqv"), col("__sqv")))
  }

  /** Per-subspace PQ codebooks — (sub, __cid, __cqv, __cnsq): the
    * subvectors of every rate-sampled seed vector (`id % centroidStep
    * == 0`, or hash-sampled via `seedByHash` — [[centroidSeedPred]],
    * the same deterministic seeding contract as [[ivfCentroids]])
    * become that subspace's centroids. K per subspace = n/step — size
    * `centroidStep` from the corpus via [[centroidStepFor]] so the
    * codebook broadcast stays bounded as the corpus grows. Like the
    * IVF table, this is the PERSISTABLE index artifact: freeze it and
    * encode daily increments against it — codes stay comparable
    * across runs because centroid identities are seed-vector ids. */
  def pqCentroids(
      emb: DataFrame,
      centroidStep: Long = CentroidStep,
      m: Int = PqSubspaces,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seedByHash: Boolean = false): DataFrame = {
    require(centroidStep >= 1, s"centroidStep must be >= 1, got $centroidStep")
    require(m >= 1, s"m must be >= 1, got $m")
    subvectors(emb.filter(centroidSeedPred(col(idCol), centroidStep, seedByHash)),
        m, idCol, vecCol)
      .select(col("sub"), col(idCol).as("__cid"),
        col("__sqv").as("__cqv"), col("__snsq").as("__cnsq"))
  }

  /** PQ encoding: per (vector, subspace), the id of the nearest
    * codebook centroid by exact int64 squared L2 (‖x‖² + ‖c‖² −
    * 2·x·c — [[dotQ]] keeps every term exact, so code assignment is
    * bit-identical on any engine; ties → smaller centroid id). A
    * 64-dim float vector (256 bytes) compresses to m codes (m bytes
    * at K ≤ 256) — the memory-resident representation that makes
    * billion-vector ANN fit a cluster, one rung past
    * [[scalarQuantize]]'s 8-bit codes.
    *
    * Shape: the subvector split is narrow; each subspace's codebook is
    * ONE broadcast array row (m rows total), and the argmin is an
    * in-row fold over its K entries — no (subvector × centroid) row
    * grid exists at any point, so encode memory is O(row), independent
    * of K (see the round-9 SCALE.md note: the grid's SortAggregate was
    * an executor-OOM cliff at 10×). Long-form output (id, sub, code,
    * qdist) — qdist is the exact squared quantization error, the
    * per-subspace distortion audit. */
  def pqEncode(
      emb: DataFrame,
      centroids: DataFrame,
      m: Int = PqSubspaces,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Each subspace's whole codebook packs into ONE array row (cid
    // ascending), broadcast m rows total, and the argmin runs as an
    // in-row fold over the K entries — the FAISS encode shape. The
    // previous plan materialized the n·m·K (subvector × centroid) row
    // grid through a struct-buffered SortAggregate; with a frozen
    // centroid step K grows with n, and at the 10× soak that sort's
    // memory (~4·10⁸ rows) OOM'd under 32-way task concurrency. The
    // fold touches the same n·m·K (subvector, centroid) combinations
    // but holds only one accumulator per row — nothing to sort, spill,
    // or grow. Strict `<` over the cid-ascending array keeps the first
    // minimum: min distance, ties → min cid, the exact contract of the
    // max_by it replaces (oracles unchanged).
    val packed = centroids
      .groupBy(col("sub"))
      .agg(sort_array(collect_list(
        struct(col("__cid"), col("__cqv"), col("__cnsq")))).as("__cb"))
    val best = org.apache.spark.sql.graft.ColumnAdapter.column(
      graft.expressions.PqArgminCode(
        org.apache.spark.sql.graft.ColumnAdapter.expression(col("__cb")),
        org.apache.spark.sql.graft.ColumnAdapter.expression(col("__sqv")),
        org.apache.spark.sql.graft.ColumnAdapter.expression(col("__snsq"))))
    subvectors(emb, m, idCol, vecCol)
      .join(broadcast(packed), Seq("sub"))
      .withColumn("__best", best)
      .select(col(idCol), col("sub").cast("long").as("sub"),
        col("__best.code").as("code"),
        col("__best.qdist").as("qdist"))
  }

  /** Asymmetric-distance (ADC) PQ search: approximate top-k neighbors
    * of each query vector, where dist(q, v) ≈ Σ_sub ‖q_sub −
    * codebook[code_sub(v)]‖² — the query stays EXACT, only the corpus
    * is compressed, the standard ADC trade (tighter than
    * symmetric code-to-code distance at identical storage).
    *
    * Shape — the part that must survive 100 TB: the corpus is touched
    * only through its codes (m small ints per vector, never the
    * original vectors); the per-query distance table (|Q|·m·K exact
    * int64 entries) broadcasts at runtime via AQE while the query
    * batch is small — the deployment shape — and degrades to a
    * shuffled join instead of an executor OOM when |Q| is a corpus
    * fraction; the scan is ONE equijoin of the code stream on
    * (sub, cid) + one
    * (query, vec) hash-agg summing m partial distances + a top-k
    * WindowGroupLimit over |Q| partitions. Self-matches excluded;
    * ties → smaller neighbor id. Output: (query_id, neighbor_id,
    * rank, adist). */
  def pqAdcTopK(
      emb: DataFrame,
      queryPred: Column,
      k: Int = 3,
      centroidStep: Long = CentroidStep,
      m: Int = PqSubspaces,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cents = pqCentroids(emb, centroidStep, m, idCol, vecCol)
    val codes = pqEncode(emb, cents, m, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("sub"), col("code"))
    val qdist = subvectors(emb.filter(queryPred), m, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("sub"), col("__sqv"), col("__snsq"))
      .join(broadcast(cents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("__cid").as("code"),
        (col("__snsq") + col("__cnsq") -
          lit(2L) * dotQ(col("__sqv"), col("__cqv"))).as("__pd"))
    // no broadcast HINT on the distance table: its q·m·K rows are tiny
    // for the deployment shape (a small query batch against a big
    // corpus) and AQE converts the join to broadcast at runtime from
    // TRUE size stats — but a corpus-fraction query set makes the table
    // O(n·K), and a forced hint then builds an unbounded hash table on
    // every executor (the 10× soak's OOM). Let the engine decide.
    val scored = codes
      .join(qdist, Seq("sub", "code"))
      .where(col("query_id") =!= col("neighbor_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__pd")).as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
  }

  /** IVF-PQ: the composed billion-scale ANN index — IVF's coarse
    * quantizer prunes the corpus to the query's home cell, PQ's codes
    * rank the survivors by ADC distance. The two stages are exactly
    * [[ivfCentroids]]/[[ivfAssign]] and [[pqCentroids]]/[[pqEncode]],
    * both persistable index artifacts; this operator is their search
    * composition (the FAISS `IVFx,PQy` layout re-expressed as
    * dataframes).
    *
    * Scale shape: candidates come from the (cell) equijoin of query
    * assignments against corpus assignments — bounded by cell
    * population, never the corpus — and each candidate is scored
    * through its m codes against the broadcast per-query distance
    * table, one hash-agg, one top-k WindowGroupLimit. The original
    * corpus vectors are read only by the (offline-able) assignment
    * and encoding passes, never by the search join itself. Ties →
    * smaller neighbor id. Output: (query_id, neighbor_id, rank,
    * adist).
    *
    * `pqStep` decouples the PQ-codebook sampling rate from the coarse
    * IVF step — the two have OPPOSITE scaling contracts: the IVF step
    * stays fixed so cells (and the candidate equijoin) stay
    * constant-size, while the PQ step must GROW with the corpus
    * ([[stepForBoundedK]]) so the codebook K — and with it the q·m·K
    * ADC distance table — stays bounded. None (the default) keeps the
    * historical single-step form.
    *
    * `nprobe` probes the query's top-n cells instead of just the home
    * cell (the IVF recall dial — same contract as [[annIvf]]'s: a true
    * neighbor just across a cell boundary is recovered, at candidate
    * cost ∝ nprobe). `refine` engages the standard exact-rerank
    * refinement: PQ's top-`refine` shortlist per query is re-scored by
    * EXACT int64 squared L2 against the corpus vectors and the final
    * top-k comes from that exact order (output column `sqdist` instead
    * of `adist`) — the memory/recall trade every production IVF-PQ
    * deployment offers, recovering whatever the code approximation
    * misranked within the shortlist. The rerank is a bounded id-equijoin
    * (refine·|queries| rows against the corpus by id), never a scan;
    * [[annIvfPqServe]] deliberately has no raw-vector access, so refine
    * lives here where the corpus frame is in hand. The battery covers
    * the dials end to end: `emb_ann_ivfpq_probed` (the nprobe=4 search,
    * oracle-replicated) and the recall pair `emb_ann_recall` (home
    * cell, code order) / `emb_ann_recall_probed` (nprobe + refine). */
  def annIvfPq(
      emb: DataFrame,
      queryPred: Column,
      k: Int = 3,
      centroidStep: Long = CentroidStep,
      m: Int = PqSubspaces,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      pqStep: Option[Long] = None,
      nprobe: Int = 1,
      refine: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    annIvfPqWith(emb, queryPred,
      ivfCentroids(emb, centroidStep, idCol, vecCol),
      pqCentroids(emb, pqStep.getOrElse(centroidStep), m, idCol, vecCol),
      k, m, idCol, vecCol, nprobe, refine)
  }

  /** IVF-PQ search against EXISTING index artifacts — the deployment
    * shape of [[annIvfPq]]: the coarse-centroid table and per-subspace
    * PQ codebooks are whatever the caller hands in, typically frozen
    * to parquet by a build job and reloaded by each daily search run
    * (centroid identities are seed-vector ids, so assignments, codes,
    * and therefore search results are bit-stable across the
    * round trip — NearDupEmbeddingsSpec pins both seams). [[annIvfPq]]
    * is exactly this with freshly-built artifacts. */
  def annIvfPqWith(
      emb: DataFrame,
      queryPred: Column,
      icents: DataFrame,
      pcents: DataFrame,
      k: Int = 3,
      m: Int = PqSubspaces,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1,
      refine: Option[Int] = None): DataFrame = {
    // corpus-sized internal pass: skip the id-uniqueness guard (one
    // extra corpus shuffle) — the fixture contract is validated at the
    // public increment seams; this caller documents the requirement
    val cells = ivfAssign(emb, icents, idCol, vecCol, assertUniqueIds = false)
    val codes = pqEncode(emb, pcents, m, idCol, vecCol)
      .select(col(idCol), col("sub"), col("code"))
    annIvfPqFromIndex(emb, queryPred, icents, pcents, cells, codes,
      k, m, idCol, vecCol, nprobe, refine)
  }

  /** [[annIvfPqWith]] against PRE-BUILT assignment/code tables — the
    * shape for evaluating several dial settings over ONE index build:
    * `cells` does not depend on (m, nprobe, refine) at all and `codes`
    * only on m, so a dial sweep (the `emb_ann_frontier` 2×2×2 grid)
    * shares one corpus assignment and one encode per m across all its
    * search cells instead of rebuilding both per cell. Bit-identical
    * to [[annIvfPqWith]] given tables built by the same
    * `ivfAssign`/`pqEncode` calls it would make (it delegates here). */
  def annIvfPqFromIndex(
      emb: DataFrame,
      queryPred: Column,
      icents: DataFrame,
      pcents: DataFrame,
      cells: DataFrame,
      codes: DataFrame,
      k: Int = 3,
      m: Int = PqSubspaces,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1,
      refine: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(refine.forall(_ >= k), s"refine (${refine.get}) must be >= k ($k)")
    refine match {
      case None =>
        annIvfPqServe(emb.filter(queryPred), icents, pcents,
          cells, codes, k, m, idCol, vecCol, nprobe)
      case Some(r) =>
        annIvfPqServeRefined(emb.filter(queryPred), emb, icents, pcents,
          cells, codes, k, m, idCol, vecCol, nprobe, r)
    }
  }

  /** [[annIvfPqServe]] + the exact-rerank refinement, against SEPARATE
    * query and corpus frames — the full deployment serving shape (and
    * the `ann_search` SQL table function's body): the PQ code-ranked
    * top-`refine` shortlist per query is re-scored by EXACT int64
    * squared L2 and the final top-k comes from that exact order
    * (output column `sqdist`). The rerank is two bounded id-equijoins
    * (shortlist × query vectors, shortlist × corpus vectors) — never a
    * corpus scan; only the shortlist's ≤ refine·|queries| rows ever
    * touch raw vectors. [[annIvfPqFromIndex]] with `refine = Some(r)`
    * is exactly this with queries = corpus.filter(pred). */
  def annIvfPqServeRefined(
      queries: DataFrame,
      corpus: DataFrame,
      icents: DataFrame,
      pcents: DataFrame,
      cells: DataFrame,
      codes: DataFrame,
      k: Int = 3,
      m: Int = PqSubspaces,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1,
      refine: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(refine >= k, s"refine ($refine) must be >= k ($k)")
    val byCode = annIvfPqServe(queries, icents, pcents,
      cells, codes, refine, m, idCol, vecCol, nprobe)
    // exact rerank: the shortlist (already ≤ refine rows per query,
    // ranked by code distance) re-scored by exact int64 squared L2
    // — two id-equijoins against the prepped projections, sized by
    // the shortlist, then the final top-k window.
    val q = prepped(queries, idCol, vecCol).select(col(idCol).as("query_id"),
      col("__qv").as("__qqv"), col("__nsq").as("__qnsq"))
    val c = prepped(corpus, idCol, vecCol).select(col(idCol).as("neighbor_id"),
      col("__qv").as("__nqv"), col("__nsq").as("__nnsq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sqd"), col("neighbor_id"))
    byCode.select(col("query_id"), col("neighbor_id"))
      .join(q, "query_id")
      .join(c, "neighbor_id")
      .withColumn("__sqd",
        col("__qnsq") + col("__nnsq") -
          lit(2L) * dotQ(col("__qqv"), col("__nqv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("__sqd").as("sqdist"))
  }

  /** The SERVE half of IVF-PQ, split from index maintenance: search
    * `queries` against an ALREADY-ASSIGNED corpus — `cells` (id, cell)
    * and `codes` (id, sub, code) are whatever assignment/encode pass
    * produced them, typically the incrementally-maintained tables a
    * streaming ingest job appends tranche by tranche against the
    * frozen artifacts ([[graft.streaming.Streams.ingestIndexCodes]]).
    * Only the query batch ever touches raw vectors here: corpus cost
    * is the (cell) candidate equijoin + the m-code ADC scoring join —
    * the true daily-search recurring cost once assignment is amortized
    * into ingest. [[annIvfPqWith]] is exactly this with cells/codes
    * built inline, so served results are bit-identical to the inline
    * (and oracle-checked) search given equal tables. */
  /** Query-side probe cells — (query_id, cell), one row per probed
    * cell per query: top-1 via [[ivfAssign]] (exactly the corpus
    * assignment rule), nprobe > 1 via the same in-row top-cells fold as
    * [[annIvf]] (one explode; the corpus side stays top-1, so probed
    * candidates are disjoint across probes). This is THE
    * candidate-defining frame of [[annIvfPqServe]], exposed so cost
    * measurements (the `emb_ann_frontier` n_candidates column) count
    * the same candidates the search scores — one definition, both
    * consumers. */
  def probedCells(
      queries: DataFrame,
      icents: DataFrame,
      nprobe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    if (nprobe == 1)
      ivfAssign(queries, icents, idCol, vecCol, assertUniqueIds = false)
        .select(col(idCol).as("query_id"), col("cell"))
    else
      prepped(queries, idCol, vecCol)
        .crossJoin(broadcast(packedCentroids(icents)))
        .where(size(col("__cb")) > 0)
        .select(col(idCol).as("query_id"),
          explode(topCells(col("__cb"), col("__qv"), col("__nsq"), nprobe))
            .as("cell"))
  }

  def annIvfPqServe(
      queries: DataFrame,
      icents: DataFrame,
      pcents: DataFrame,
      cells: DataFrame,
      codes: DataFrame,
      k: Int = 3,
      m: Int = PqSubspaces,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      nprobe: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // internal pass over the caller's query frame: skip the uniqueness
    // guard (a duplicate query id here only duplicates that query's
    // result rows — it cannot corrupt id-keyed state), keeping the
    // served-search plan narrow. nprobe > 1 multi-probes the QUERY
    // side only (the corpus assignment stays one cell per vector, so
    // probed candidates are disjoint across probes — no dedup needed):
    // the same in-row top-cells fold as [[annIvf]], one explode,
    // candidate cost ∝ nprobe.
    val qcells = probedCells(queries, icents, nprobe, idCol, vecCol)
    val qdist = subvectors(queries, m, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("sub"), col("__sqv"), col("__snsq"))
      .join(broadcast(pcents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("__cid").as("code"),
        (col("__snsq") + col("__cnsq") -
          lit(2L) * dotQ(col("__sqv"), col("__cqv"))).as("__pd"))
    val cand = qcells
      .join(cells.select(col(idCol).as("neighbor_id"), col("cell")), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
    val scored = cand
      .join(codes.select(col(idCol).as("neighbor_id"), col("sub"), col("code")),
        Seq("neighbor_id"))
      // unhinted for the same reason as pqAdcTopK: q·m·K only stays
      // broadcastable while the query batch is small; AQE re-plans the
      // broadcast at runtime when it truly is.
      .join(qdist, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__pd")).as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("adist"))
  }
}
