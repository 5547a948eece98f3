package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.{DistinctShingles, DotProductLong}
import org.apache.spark.sql.graft.ColumnAdapter

/** Randomized (fixed-seed) equivalence harness for the custom codegen
  * expressions: each must be indistinguishable from the composable HOF
  * form it replaced, on arbitrary inputs — the property that justifies
  * calling them an optimization rather than a semantic change. Inputs
  * run through actual Spark plans (codegen path), not expression eval.
  */
class ExpressionEquivalenceSpec extends SparkSpecBase {

  private def dotNative(a: Column, b: Column): Column =
    ColumnAdapter.column(DotProductLong(
      ColumnAdapter.expression(a), ColumnAdapter.expression(b)))

  private def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  private def shinglesNative(toks: Column, n: Int): Column =
    ColumnAdapter.column(DistinctShingles(ColumnAdapter.expression(toks), n))

  private def shinglesHof(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o + 1)): _*))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  test("DotProductLong equals the HOF dot on random equal-length vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    val rows = (0 until 500).map { _ =>
      val d = 1 + rnd.nextInt(48)
      def vec() = Array.fill(d)(rnd.nextLong() % 10000000L)
      (vec(), vec())
    }
    val df = rows.toDF("a", "b")
      .select(dotNative(col("a"), col("b")).as("n"),
        dotHof(col("a"), col("b")).as("h"))
    assert(df.filter(col("n") =!= col("h")).count() === 0)
  }

  test("DistinctShingles equals the HOF chain on random token arrays") {
    import spark.implicits._
    // small vocab on purpose: forces duplicate tokens AND duplicate
    // shingles, so the first-occurrence dedup order is actually
    // exercised; includes multi-byte UTF-8 tokens
    val vocab = Vector("a", "b", "c", "ab", "xyz", "Ω≠", "7")
    val rnd = new scala.util.Random(4242L)
    val docs = (0 until 400).map { _ =>
      Array.fill(rnd.nextInt(31))(vocab(rnd.nextInt(vocab.size)))
    }
    for (n <- Seq(1, 2, 3, 5)) {
      val df = docs.toDF("toks")
        .select(shinglesNative(col("toks"), n).as("nat"),
          shinglesHof(col("toks"), n).as("hof"))
      assert(df.filter(col("nat") =!= col("hof")).count() === 0,
        s"mismatch at n=$n")
    }
  }

  // ---- packed-codebook argmin/argmax loops (the r9 soak-OOM fixes) ----

  /** A random packed codebook: K entries of (cid ascending, d-dim
    * quantized vector, its exact squared norm). */
  private def packedRows(rnd: scala.util.Random, k: Int, d: Int)
      : Seq[(Long, Array[Long], Long)] = {
    val cids = Seq.fill(k)(rnd.nextLong().abs % 1000000L).distinct.sorted
    cids.map { cid =>
      val v = Array.fill(d)(rnd.nextLong() % 1000L)
      (cid, v, v.map(x => x * x).sum)
    }
  }

  test("IvfArgmaxCell equals the HOF argmax fold on random codebooks (incl. ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9090L)
    val rows = (0 until 300).map { i =>
      val d = 1 + rnd.nextInt(16)
      val cb = packedRows(rnd, 1 + rnd.nextInt(12), d)
      // every third row: duplicate an entry's VECTOR under a higher cid
      // so the cosine ties exactly and the tie-break is exercised
      val cbT = if (i % 3 == 0 && cb.nonEmpty)
        cb :+ ((cb.head._1 + 1000001L, cb.head._2, cb.head._3)) else cb
      val q = Array.fill(d)(rnd.nextLong() % 1000L)
      (cbT, q, q.map(x => x * x).sum)
    }
    val df = rows.toDF("cb", "qv", "nsq")
      .select(col("cb"), col("qv"), col("nsq"))
      .withColumn("cbS", expr("transform(cb, c -> struct(c._1 AS __cid, c._2 AS __cqv, c._3 AS __cnsq))"))
    val native = ColumnAdapter.column(graft.expressions.IvfArgmaxCell(
      ColumnAdapter.expression(col("cbS")),
      ColumnAdapter.expression(col("qv")),
      ColumnAdapter.expression(col("nsq"))))
    val hof = aggregate(col("cbS"),
      struct(lit(Double.NegativeInfinity).as("c"), lit(Long.MinValue).as("cid")),
      (acc, c) => {
        val cos = dotHof(col("qv"), c.getField("__cqv")).cast("double") /
          (sqrt(col("nsq").cast("double")) * sqrt(c.getField("__cnsq").cast("double")))
        when(cos > acc.getField("c"),
          struct(cos.as("c"), c.getField("__cid").as("cid"))).otherwise(acc)
      }).getField("cid")
    val got = df.select(native.as("n"), hof.as("h"))
    assert(got.filter(col("n") =!= col("h")).count() === 0)
  }

  test("PqArgminCode equals the HOF argmin fold on random codebooks (incl. ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7171L)
    val rows = (0 until 300).map { i =>
      val d = 1 + rnd.nextInt(8)
      val cb = packedRows(rnd, 1 + rnd.nextInt(12), d)
      val cbT = if (i % 3 == 0 && cb.nonEmpty)
        cb :+ ((cb.head._1 + 1000001L, cb.head._2, cb.head._3)) else cb
      val s = Array.fill(d)(rnd.nextLong() % 1000L)
      (cbT, s, s.map(x => x * x).sum)
    }
    val df = rows.toDF("cb", "sqv", "snsq")
      .withColumn("cbS", expr("transform(cb, c -> struct(c._1 AS __cid, c._2 AS __cqv, c._3 AS __cnsq))"))
    val native = ColumnAdapter.column(graft.expressions.PqArgminCode(
      ColumnAdapter.expression(col("cbS")),
      ColumnAdapter.expression(col("sqv")),
      ColumnAdapter.expression(col("snsq"))))
    val hof = aggregate(col("cbS"),
      struct(lit(Long.MaxValue).as("d"), lit(Long.MinValue).as("cid")),
      (acc, c) => {
        val dist = col("snsq") + c.getField("__cnsq") -
          lit(2L) * dotHof(col("sqv"), c.getField("__cqv"))
        when(dist < acc.getField("d"),
          struct(dist.as("d"), c.getField("__cid").as("cid"))).otherwise(acc)
      })
    val got = df.select(native.getField("code").as("nc"), native.getField("qdist").as("nd"),
      hof.getField("cid").as("hc"), hof.getField("d").as("hd"))
    assert(got.filter(col("nc") =!= col("hc") || col("nd") =!= col("hd")).count() === 0)
  }

  test("IvfTopCells equals the window ranking it replaced (incl. ties, K < nprobe)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(31337L)
    // nonzero-norm vectors only: the ANSI window form throws on a
    // zero-norm division where the native fold yields a NaN ordering —
    // not a caller-reachable shape (quantized real embeddings)
    def nzVec(d: Int) = Array.fill(d)(1L + rnd.nextLong().abs % 999L)
    val rows = (0 until 300).map { i =>
      val d = 1 + rnd.nextInt(16)
      // small K on purpose: K < nprobe rows exercise the short-array arm
      val cids = Seq.fill(1 + rnd.nextInt(8))(rnd.nextLong().abs % 1000000L)
        .distinct.sorted
      val cb = cids.map { cid =>
        val v = nzVec(d); (cid, v, v.map(x => x * x).sum)
      }
      val cbT = if (i % 3 == 0 && cb.nonEmpty)
        cb :+ ((cb.head._1 + 1000001L, cb.head._2, cb.head._3)) else cb
      val q = nzVec(d)
      (i.toLong, cbT, q, q.map(x => x * x).sum)
    }
    val df = rows.toDF("id", "cb", "qv", "nsq")
      .withColumn("cbS", expr("transform(cb, c -> struct(c._1 AS __cid, c._2 AS __cqv, c._3 AS __cnsq))"))
    for (nprobe <- Seq(1, 2, 4)) {
      val native = df.select(col("id"),
        ColumnAdapter.column(graft.expressions.IvfTopCells(
          ColumnAdapter.expression(col("cbS")),
          ColumnAdapter.expression(col("qv")),
          ColumnAdapter.expression(col("nsq")), nprobe)).as("n"))
      // the replaced plan: K rows per vector, cosine window rank
      val w = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cid"))
      val ranked = df.select(col("id"), col("nsq"), col("qv"),
          explode(col("cbS")).as("c"))
        .select(col("id"),
          col("c.__cid").as("cid"),
          (dotHof(col("qv"), col("c.__cqv")).cast("double") /
            (sqrt(col("nsq").cast("double")) *
              sqrt(col("c.__cnsq").cast("double")))).as("cos"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= nprobe)
        .groupBy(col("id"))
        .agg(transform(sort_array(collect_list(struct(col("rn"), col("cid")))),
          s => s.getField("cid")).as("h"))
      val got = native.join(ranked, "id")
      assert(got.filter(col("n") =!= col("h")).count() === 0,
        s"mismatch at nprobe=$nprobe")
      // element 1 is the home cell: the scalar argmax contract
      val home = df.select(
        ColumnAdapter.column(graft.expressions.IvfTopCells(
          ColumnAdapter.expression(col("cbS")),
          ColumnAdapter.expression(col("qv")),
          ColumnAdapter.expression(col("nsq")), nprobe)).getItem(0).as("t"),
        ColumnAdapter.column(graft.expressions.IvfArgmaxCell(
          ColumnAdapter.expression(col("cbS")),
          ColumnAdapter.expression(col("qv")),
          ColumnAdapter.expression(col("nsq")))).as("a"))
      assert(home.filter(col("t") =!= col("a")).count() === 0)
    }
  }

  test("IvfTopCells returns null on an empty codebook") {
    val df = spark.sql(
      """SELECT cast(array() as array<struct<c1:bigint,c2:array<bigint>,c3:bigint>>) AS cb,
        |       array(1L, 2L) AS v, 5L AS nsq""".stripMargin)
    val got = df.select(
      ColumnAdapter.column(graft.expressions.IvfTopCells(
        ColumnAdapter.expression(col("cb")),
        ColumnAdapter.expression(col("v")),
        ColumnAdapter.expression(col("nsq")), 2)).as("t")).head
    assert(got.isNullAt(0))
  }

  test("packed argmin/argmax expressions return null on an empty codebook") {
    val df = spark.sql(
      """SELECT cast(array() as array<struct<c1:bigint,c2:array<bigint>,c3:bigint>>) AS cb,
        |       array(1L, 2L) AS v, 5L AS nsq""".stripMargin)
    val got = df.select(
      ColumnAdapter.column(graft.expressions.IvfArgmaxCell(
        ColumnAdapter.expression(col("cb")),
        ColumnAdapter.expression(col("v")),
        ColumnAdapter.expression(col("nsq")))).as("a"),
      ColumnAdapter.column(graft.expressions.PqArgminCode(
        ColumnAdapter.expression(col("cb")),
        ColumnAdapter.expression(col("v")),
        ColumnAdapter.expression(col("nsq")))).as("p")).head
    assert(got.isNullAt(0) && got.isNullAt(1))
  }

  test("null elements: DotProductLong skips the term, DistinctShingles ignores the token") {
    // null-element arrays are SQL-reachable through the registered
    // functions; the operators themselves never produce them. The
    // declared output contract must hold anyway: dot treats a null
    // component pair as 0, shingles grams over non-null tokens only
    // (so the declared containsNull=false is actually true).
    val df = spark.sql(
      """SELECT array(1L, NULL, 3L) AS a, array(4L, 5L, NULL) AS b,
        |       array('a', NULL, 'b', 'c') AS t""".stripMargin)
    val got = df.select(
      dotNative(col("a"), col("b")).as("d"),
      shinglesNative(col("t"), 2).as("s")).head
    assert(got.getLong(0) === 4L) // 1·4 + skip + skip
    assert(got.getSeq[String](1) === Seq("a b", "b c"))
    assert(!got.getSeq[String](1).contains(null))
  }

  test("PHashFeatureSums equals the composed conv-over-hex form on ASCII payloads") {
    import spark.implicits._
    // ASCII-range bytes: the domain the composed form is defined on
    // (a full 8-byte window with the top bit set overflows its 64-bit
    // cast — pinned separately below). Lengths straddle every window
    // geometry: empty, shorter than one window, non-multiples of 64,
    // and long enough for disjoint windows on both grids.
    val rnd = new scala.util.Random(20260814L)
    val payloads = Seq(0, 1, 7, 63, 64, 65, 511, 1024, 4099).flatMap { n =>
      (0 until 25).map(_ => Array.fill(n)((rnd.nextInt(128)).toByte))
    }
    for (mid <- Seq(false, true)) {
      val df = payloads.toDF("p")
        .select(
          graft.operators.Multimodal.pHashFeatures(col("p"), mid).as("n"),
          graft.operators.Multimodal.pHashFeaturesComposed(col("p"), mid).as("h"))
      assert(df.filter(not(col("n") <=> col("h"))).count() === 0,
        s"native != composed (midpoint=$mid)")
    }
  }

  test("PHashPackWords equals the composed when-chain bit rule (64 and 256 blocks)") {
    import spark.implicits._
    // feature arrays in the PHashFeatureSums output range (4-byte
    // windows sum to [0, 1020]), plus adversarial shapes: all-equal
    // (every bit ties → 0), exact-median ties, and single-spike.
    val rnd = new scala.util.Random(20260815L)
    for (blocks <- Seq(64, 256)) {
      val rows = (0 until 200).map { i =>
        if (i == 0) Array.fill(blocks)(7L) // all ties -> every bit 0
        else if (i == 1) Array.tabulate(blocks)(j => if (j == 3) 1020L else 0L)
        else Array.fill(blocks)(rnd.nextInt(1021).toLong)
      }
      val df = rows.toDF("f").select(
        graft.operators.Multimodal.pHashWords(col("f"), blocks)
          .zipWithIndex.map { case (c, w) => c.as(s"n$w") } ++
        graft.operators.Multimodal.pHashWordsComposed(col("f"), blocks)
          .zipWithIndex.map { case (c, w) => c.as(s"h$w") }: _*)
      for (w <- 0 until (blocks + 63) / 64)
        assert(df.filter(not(col(s"n$w") <=> col(s"h$w"))).count() === 0,
          s"native word $w != composed (blocks=$blocks)")
      // pHash64 (the oracle-matched 64-bit mode) is word 0 of the pack
      if (blocks == 64) {
        val d2 = rows.toDF("f").select(
          graft.operators.Multimodal.pHash64(col("f")).as("n"),
          graft.operators.Multimodal.pHash64Composed(col("f")).as("h"))
        assert(d2.filter(not(col("n") <=> col("h"))).count() === 0)
      }
    }
  }

  test("PHashFeatureSums handles high bytes; 8-byte geometry zeroes overflow windows") {
    import spark.implicits._
    def feats(c: Column, sampleBytes: Int): Column =
      ColumnAdapter.column(graft.expressions.PHashFeatureSums(
        ColumnAdapter.expression(c), false, 64, sampleBytes))
    val hi = Array.fill(512)(0x90.toByte) // top bit set everywhere
    val lo = Array.fill(512)(0x41.toByte) // 'A' = 65
    val got = Seq((hi, lo)).toDF("hi", "lo")
      .select(
        // operator geometry (sampleBytes = 4): a 4-byte window maxes
        // at 2^32 — no overflow, plain unsigned byte sums on BOTH
        // high- and low-byte payloads (4·0x90 = 576, 4·65 = 260)
        feats(col("hi"), 4).as("h4"),
        feats(col("lo"), 4).as("l4"),
        // 8-byte geometry: a full window starting >= 0x80 reads as a
        // value >= 2^63, which the composed form's 64-bit cast (and
        // the DuckDB oracle's TRY_CAST) rejects to 0 — the native
        // loop must replicate that; sub-top-bit windows still sum
        feats(col("hi"), 8).as("h8"),
        feats(col("lo"), 8).as("l8"))
      .head
    assert(got.getSeq[Long](0).forall(_ == 576L))
    assert(got.getSeq[Long](1).forall(_ == 260L))
    assert(got.getSeq[Long](2).forall(_ == 0L))
    assert(got.getSeq[Long](3).forall(_ == 520L))
  }
}
