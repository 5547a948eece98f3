package graft

import org.apache.spark.sql.functions._

/** The soak gate's premises, asserted — the row-growth bound in Bench's
  * soak mode is only meaningful if the replication really produces
  * token-disjoint document replicas (so linear operators do exactly N×
  * one replica's work) and realistically-perturbed embedding replicas.
  */
class SoakSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("document replicas are token-disjoint and replica 0 is the original") {
    val n = 3
    val rep = Soak.replicatedDocs(spark, sfDir, n).cache()
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(rep.count() === n * base.count())

    // replica 0 byte-identical to the fixture
    val r0 = rep.filter(col("doc_id") < Soak.IdOffset)
    assert(r0.exceptAll(base).count() === 0)
    assert(base.exceptAll(r0).count() === 0)

    // tokens never cross replicas: each distinct token belongs to ONE
    // replica's id range
    val toks = rep.select((col("doc_id") / Soak.IdOffset).cast("int").as("rep"),
        explode(split(col("text"), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val shared = toks.groupBy("tok")
      .agg(countDistinct(col("rep")).as("nrep"))
      .filter(col("nrep") > 1)
    assert(shared.count() === 0, "a token appears in more than one replica")

    // within-replica structure preserved: per-doc token counts match the
    // original doc's (the token bijection keeps Jaccard/tf/df shapes)
    val cnt = rep.select(pmod(col("doc_id"), lit(Soak.IdOffset)).as("doc_id"),
        size(filter(split(col("text"), "\\s+"), t => t =!= "")).as("ntok"))
      .groupBy("doc_id").agg(countDistinct(col("ntok")).as("variants"))
    assert(cnt.filter(col("variants") > 1).count() === 0,
      "a replica changed some doc's token count")
  }

  test("document replicas leave the pHash ball of their origin and of other replicas") {
    // The token-disjointness premise does not cover BYTE-domain
    // similarity: the per-token marker alone is inside blockhash's
    // invariance class (uniform insertion rescales the stream, so the
    // evenly-spaced sample windows re-align with the same content),
    // and the r10 soak measured cross-replica pHash pairs at 3134×
    // baseline because of it. The glued first-token pad must push
    // every replica beyond the banded-Hamming cutoff of its origin
    // and of the other replicas of the same doc.
    import graft.operators.Multimodal
    // n = 10 deliberately: the large-pad replicas are where the first
    // two pad designs failed (constant filler → zero-signature
    // collapse on short docs), so the premise must hold at the soak's
    // real replica count, not a gentle n = 3.
    val n = 10
    val rep = Soak.replicatedDocs(spark, sfDir, n)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .where(length(col("payload")) > 0)
    // pHashSignatures (not pHash64∘pHashFeatures inline — the feature
    // array must materialize once or the 64-conv tree explodes)
    val sigs = Multimodal.pHashSignatures(rep, "doc_id", "payload")
      .select(pmod(col("doc_id"), lit(Soak.IdOffset)).as("origin"),
        (col("doc_id") / Soak.IdOffset).cast("int").as("rep"),
        col("__sig0").as("sig"))
    val close = sigs.as("a").join(sigs.as("b"),
        col("a.origin") === col("b.origin") && col("a.rep") < col("b.rep"))
      .select(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("ham"))
      .where(col("ham") <= Multimodal.PHashMaxHamming)
    assert(close.count() === 0,
      "a replica stayed inside the pHash Hamming cutoff of a same-doc sibling")
  }

  test("event replicas are key-disjoint over the SAME time range") {
    val n = 3
    val rep = Soak.replicatedEvents(spark, sfDir, n).cache()
    val base = spark.read.parquet(s"$sfDir/events.parquet")
    assert(rep.count() === n * base.count())
    // replica 0 identical
    val r0 = rep.filter(col("event_id") < Soak.IdOffset)
    assert(r0.exceptAll(base).count() === 0)
    // user key-spaces are disjoint ranges; the time range is shared
    // (same min/max ts in every replica — the "more concurrent users,
    // same window" scale-up)
    val perRep = rep
      .groupBy((col("event_id") / Soak.IdOffset).cast("int").as("rep"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"),
        min(col("user_id")).as("u0"), max(col("user_id")).as("u1"))
      .collect().sortBy(_.getInt(0))
    assert(perRep.length === n)
    // getAs[Any]: the fixture's ts may surface as TIMESTAMP_NTZ
    // (LocalDateTime) or TIMESTAMP depending on the generator encoding
    assert(perRep.map(r => (r.getAs[Any](1), r.getAs[Any](2))).distinct.length === 1,
      "every replica must cover the same event-time window")
    val ranges = perRep.map(r => (r.getLong(3), r.getLong(4))).sorted
    assert(ranges.sliding(2).forall {
      case Array((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, s"user ranges overlap across replicas: ${ranges.mkString(", ")}")
  }

  test("customer replicas: intra-replica edit structure exact, replicas edit-disjoint") {
    val n = 3
    val rep = Soak.replicatedCustomers(spark, sfDir, n).cache()
    val base = spark.read.parquet(s"$sfDir/customer.parquet")
    assert(rep.count() === n * base.count())
    assert(rep.filter(col("c_custkey") < Soak.IdOffset)
      .exceptAll(base).count() === 0)
    // the ER gate's premise, stated as the operator sees it: confirmed
    // fuzzy pairs per replica == the base corpus's (a constant common
    // suffix never changes an edit DP), and ZERO pairs cross replicas
    // (tags differ in index digits + digest chars — no single deletion
    // reconciles them)
    val basePairs = graft.operators.Er
      .fuzzyPairs(base, "c_custkey", "c_name").count()
    val repPairs = graft.operators.Er
      .fuzzyPairs(rep, "c_custkey", "c_name")
      .withColumn("rep_a", (col("id_a") / Soak.IdOffset).cast("int"))
      .withColumn("rep_b", (col("id_b") / Soak.IdOffset).cast("int"))
      .cache()
    assert(repPairs.filter(col("rep_a") =!= col("rep_b")).count() === 0,
      "cross-replica fuzzy pairs would void the linear-growth premise")
    val perRep = repPairs.groupBy(col("rep_a")).count()
      .collect().map(_.getLong(1)).toSeq
    assert(perRep.length === n && perRep.forall(_ === basePairs),
      s"per-replica pair counts $perRep must all equal base $basePairs")
    repPairs.unpersist(); rep.unpersist()
  }

  test("orders/lineitem replicas: key-lockstep joins, per-replica q18 work exact") {
    val n = 3
    val o = Soak.replicatedOrders(spark, sfDir, n).cache()
    val l = Soak.replicatedLineitem(spark, sfDir, n).cache()
    val baseO = spark.read.parquet(s"$sfDir/orders.parquet")
    val baseL = spark.read.parquet(s"$sfDir/lineitem.parquet")
    assert(o.count() === n * baseO.count())
    assert(l.count() === n * baseL.count())
    // replica 0 is the original, byte-identical
    assert(o.filter(col("o_orderkey") < Soak.IdOffset)
      .exceptAll(baseO).count() === 0)
    // the one foreign key the gated shape joins on stays in lockstep:
    // the N× orders↔lineitem join does exactly N× the base join's work
    // and never crosses replicas
    val joined = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"))
    assert(joined.count() ===
      n * baseO.join(baseL, col("o_orderkey") === col("l_orderkey")).count())
    assert(joined.filter(
      (col("o_orderkey") / Soak.IdOffset).cast("int") =!=
        (col("o_custkey") / Soak.IdOffset).cast("int")).count() === 0,
      "an order's custkey crossed into another replica's key range")
    // per-replica q18 big-order counts all equal the base corpus's
    // (quantities unchanged ⇒ per-order aggregates bit-identical)
    val baseBig = baseL.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q")).filter(col("q") > 250).count()
    val perRep = l.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("q")).filter(col("q") > 250)
      .groupBy((col("l_orderkey") / Soak.IdOffset).cast("int").as("rep"))
      .count().collect().map(_.getLong(1)).toSeq
    assert(perRep.length === n && perRep.forall(_ === baseBig),
      s"per-replica big-order counts $perRep must all equal base $baseBig")
    o.unpersist(); l.unpersist()
  }

  test("embedding replicas: exact intra-replica geometry, no shared neighborhood") {
    val n = 3
    val rep = Soak.replicatedEmbeddings(spark, sfDir, n).cache()
    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assert(rep.count() === n * base.count())
    val r0 = rep.filter(col("vec_id") < Soak.IdOffset)
    assert(r0.exceptAll(base).count() === 0)

    // orthogonality, part 1 — norms preserved exactly: a signed
    // permutation reorders/flips components, so the float multiset
    // {x_j²} is unchanged and so is any order-insensitive reduction
    def normSq = aggregate(col("embedding"),
      lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val joined = rep.filter(col("vec_id") >= Soak.IdOffset)
      .select(pmod(col("vec_id"), lit(Soak.IdOffset)).as("vec_id"),
        (col("vec_id") / Soak.IdOffset).cast("int").as("rep"),
        col("embedding"))
      .join(base.select(col("vec_id"), col("embedding").as("e0")), "vec_id")
      .cache()
    val normDrift = joined.select(
        abs(normSq - aggregate(col("e0"),
          lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
          .as("drift"))
      .agg(max(col("drift"))).head.getDouble(0)
    assert(normDrift < 1e-6, s"norms drifted by $normDrift")

    // orthogonality, part 2 — the transform preserves the component
    // MULTISET up to sign per vector (relabeled axes, nothing else)
    val multisetBad = joined.select(
        sort_array(transform(col("embedding"), x => abs(x))).as("a"),
        sort_array(transform(col("e0"), x => abs(x))).as("b"))
      .where(col("a") =!= col("b")).count()
    assert(multisetBad === 0L, "a replica changed some |component| multiset")

    // no shared neighborhood: a vector and its transformed sibling are
    // decorrelated — |cos| stays far below the battery's bucket-mate
    // similarity range (64-dim random-sign alignment concentrates
    // near 0; bound at 0.6, well under near-dup territory)
    def dotD(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val maxCos = joined
      .select((abs(dotD(col("embedding"), col("e0"))) /
        (sqrt(normSq) * sqrt(dotD(col("e0"), col("e0"))))).as("c"))
      .agg(max(col("c"))).head.getDouble(0)
    assert(maxCos < 0.6, s"a replica stayed aligned with its origin: cos=$maxCos")

    // determinism: regenerating gives the identical frame
    val again = Soak.replicatedEmbeddings(spark, sfDir, n)
    assert(rep.exceptAll(again).count() === 0)
  }

  test("maxJoinOutputRows reads the largest executed join frame") {
    import spark.implicits._
    // 100 rows fan out 5× through the join, then collapse to 10 output
    // rows — the exact shape the candidate gate exists for: the output
    // row count (10) says nothing about the 500-row intermediate.
    val a = (1 to 100).map(i => (i.toLong, (i % 10).toLong)).toDF("id", "k")
    val b = (0L until 10L).flatMap(k => Seq.fill(5)(k -> (k * 2)))
      .toDF("k", "w")
    val agg = a.join(b, "k").groupBy("k").count()
    assert(Bench.materialize(agg) === 10L)
    assert(Soak.maxJoinOutputRows(agg) === 500L)

    // two joins: the MAX is reported, not the last or the sum
    val big = a.join(b, "k")                       // 500 rows
    val small = a.limit(3).join(b.limit(20), "k")  // ≤ 3·5 rows
    val both = big.unionByName(small).groupBy("k").count()
    Bench.materialize(both)
    assert(Soak.maxJoinOutputRows(both) === 500L)

    // join-free plan gates as zero
    val nj = a.groupBy("k").count()
    Bench.materialize(nj)
    assert(Soak.maxJoinOutputRows(nj) === 0L)
  }
}
