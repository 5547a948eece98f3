package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embeddings, NearDup}

/** The runtime-dial contract: battery queries AND their DuckDB oracles
  * both derive the ANN/banding dials from the LIVE corpus row count —
  * the oracle side as scalar subqueries (`pqStepExprSql`,
  * `planesExprSql`, `shdial` in simhashScaledSql) emitting the
  * pow2-ceil-log2 / clamp arithmetic in SQL. These tests pin the SQL
  * arithmetic (replicated here operation-for-operation on doubles,
  * exactly what DuckDB evaluates) to the Scala sizing helpers across a
  * corpus-size sweep, plus the literal-table bounds the longer oracle
  * tables rely on — if a helper or an emitted formula drifts, the
  * mismatch fails HERE with a named dial instead of surfacing as n
  * oracle hash mismatches at some scale factor.
  */
class DialParitySpec extends AnyFunSuite {

  /** Corpus sizes the sweep certifies: every count up to 10k (covers
    * sf0.001/0.01/0.1 and the 10×/100× soaks with big margin), then
    * log-spaced points to 10^12. */
  private val sweep: Seq[Long] =
    (1L to 10000L) ++ Seq(100000L, 1000000L, 10000000L, 1000000000L, 1000000000000L)

  /** The SQL `CAST(power(2, ceil(log2(GREATEST(1, n // k)))) AS BIGINT)`
    * replicated on doubles — the exact expression pqStepExprSql emits. */
  private def sqlPqStep(n: Long, k: Long): Long =
    math.pow(2.0, math.ceil(math.log(math.max(1L, n / k).toDouble) / math.log(2.0))).toLong

  /** The SQL `LEAST(62, GREATEST(1, CAST(ceil(log2(GREATEST(1, n // b))) AS INT)))`. */
  private def sqlPlanes(n: Long, b: Long): Int =
    math.min(62, math.max(1,
      math.ceil(math.log(math.max(1L, n / b).toDouble) / math.log(2.0)).toInt))

  /** The SQL `LEAST(60, GREATEST(1, (CASE n<=1 THEN 0 ELSE ceil(log2 n) END) + 3))`. */
  private def sqlBandBits(n: Long): Int =
    math.min(60, math.max(1,
      (if (n <= 1L) 0
       else math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt) + 3))

  test("pqStepExprSql's pow2-ceil arithmetic == stepForBoundedK over the sweep") {
    for (n <- sweep; k <- Seq(SparkEntry.PqCodebookK, SparkEntry.ScaledPqCodebookK))
      assert(sqlPqStep(n, k) === Embeddings.stepForBoundedK(n, k),
        s"pq step diverged at n=$n k=$k")
  }

  test("planesExprSql's clamp arithmetic == planesFor over the sweep") {
    for (n <- sweep;
         b <- Seq(SparkEntry.LshTargetBucket, SparkEntry.ScaledLshTargetBucket))
      assert(sqlPlanes(n, b) === Embeddings.planesFor(n, b),
        s"planes diverged at n=$n b=$b")
  }

  test("shdial's band-bits arithmetic == simHashBandBitsFor over the sweep") {
    for (n <- sweep) {
      assert(sqlBandBits(n) === NearDup.simHashBandBitsFor(n),
        s"band bits diverged at n=$n")
      // the Spark battery applies the family-width cap too — a no-op
      // for the sha256 family (960/16 = 60 == the formula's own cap)
      assert(NearDup.Sha256Family.maxWidthBits / SparkEntry.ScaledSimHashBands === 60)
    }
  }

  test("the oracle literal tables cover every dial the gate corpora can derive") {
    // MaxOraclePlanes-row weight tables serve any planesFor count up
    // to corpora of targetBucket * 2^MaxOraclePlanes vectors; the gate
    // corpora (≤ 2k vectors, soaked to 100×) stay far under that.
    val maxGateVectors = 2000L * 100L
    for (b <- Seq(SparkEntry.LshTargetBucket, SparkEntry.ScaledLshTargetBucket))
      assert(Embeddings.planesFor(maxGateVectors, b) <= SparkEntry.MaxOraclePlanes,
        s"planesFor($maxGateVectors, $b) escapes the ${SparkEntry.MaxOraclePlanes}-row table")
    // simhash hash words are emitted to MaxOracleBandBits — corpora to 2^21 docs
    assert(NearDup.simHashBandBitsFor(1L << 21) <= SparkEntry.MaxOracleBandBits)
    assert(NearDup.simHashBandBitsFor(5000L * 100L) <= SparkEntry.MaxOracleBandBits)
  }

  test("the dials actually TURN as the corpus grows (the 100 TB premise)") {
    // 10× corpus: buckets refine, codebook K stays bounded, band
    // entropy rises — each by the amount its scaladoc promises.
    val n = SparkEntry.VerifyEmbCorpus
    assert(Embeddings.planesFor(10 * n, SparkEntry.LshTargetBucket)
      > Embeddings.planesFor(n, SparkEntry.LshTargetBucket))
    val step10 = Embeddings.stepForBoundedK(10 * n, SparkEntry.PqCodebookK)
    val k10 = 10 * n / step10
    assert(k10 <= SparkEntry.PqCodebookK && k10 > SparkEntry.PqCodebookK / 2,
      s"K at 10x = $k10 escaped (targetK/2, targetK]")
    assert(NearDup.simHashBandBitsFor(10 * SparkEntry.VerifyDocCorpus)
      > NearDup.simHashBandBitsFor(SparkEntry.VerifyDocCorpus))
  }

  test("the sf0.01 instantiations the old constant oracles pinned still hold") {
    // the historical anchor values — kept so an accidental helper
    // change that happens to keep formula parity but moves the
    // certified corpora's dials is still named here
    assert(Embeddings.planesFor(500L, SparkEntry.LshTargetBucket) === Embeddings.Planes)
    assert(Embeddings.stepForBoundedK(500L, SparkEntry.PqCodebookK) === Embeddings.CentroidStep)
    assert(Embeddings.stepForBoundedK(500L, SparkEntry.ScaledPqCodebookK) === SparkEntry.ScaledPqStep)
    assert(NearDup.simHashBandBitsFor(500L) === 12)
    // …and the sf0.1 values the first full-sweep mismatch list measured
    assert(Embeddings.stepForBoundedK(2000L, SparkEntry.PqCodebookK) === 128L)
    assert(Embeddings.planesFor(2000L, SparkEntry.LshTargetBucket) === 6)
    assert(NearDup.simHashBandBitsFor(5000L) === 16)
  }
}
