package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embeddings, NearDup}

/** The runtime-dial contract: battery queries derive their ANN/banding
  * dials from the LIVE corpus row count (so candidate joins stay linear
  * as the corpus grows), while the DuckDB oracles interpolate each
  * dial's value AT THE VERIFY CORPUS (500 docs / 500 vectors). These
  * tests pin the two sides to each other — if a sizing helper or a
  * target constant changes, the mismatch fails HERE with a named dial
  * instead of surfacing as n oracle hash mismatches.
  */
class DialParitySpec extends AnyFunSuite {

  test("LSH planes at the verify corpus equal the 4-plane oracle CTEs") {
    assert(Embeddings.planesFor(SparkEntry.VerifyEmbCorpus, SparkEntry.LshTargetBucket)
      === Embeddings.Planes)
  }

  test("scaled LSH planes at the verify corpus equal lshScaledSql's constant") {
    assert(Embeddings.planesFor(SparkEntry.VerifyEmbCorpus, SparkEntry.ScaledLshTargetBucket)
      === SparkEntry.ScaledLshPlanes)
  }

  test("PQ codebook step at the verify corpus equals pqCteFor's constant") {
    assert(Embeddings.stepForBoundedK(SparkEntry.VerifyEmbCorpus, SparkEntry.PqCodebookK)
      === Embeddings.CentroidStep)
  }

  test("m16 PQ step at the verify corpus equals pqSearchSql's constant") {
    assert(Embeddings.stepForBoundedK(SparkEntry.VerifyEmbCorpus, SparkEntry.ScaledPqCodebookK)
      === SparkEntry.ScaledPqStep)
  }

  test("SimHash band bits at the verify corpus equal simhashScaledSql's width") {
    // ScaledSimHashWidth is DEFINED as bands * simHashBandBitsFor(500),
    // so asserting the product against it would be a tautology — pin
    // the literal values the oracle SQL actually interpolates instead,
    // so a drift in either the helper or the bands constant fails here
    // with a named dial.
    assert(NearDup.simHashBandBitsFor(SparkEntry.VerifyDocCorpus) === 12)
    assert(SparkEntry.ScaledSimHashBands === 16)
    assert(SparkEntry.ScaledSimHashWidth === 192)
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
}
