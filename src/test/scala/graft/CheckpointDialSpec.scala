package graft

import org.apache.spark.sql.functions._

import graft.operators.{DedupClusters, Graph}

/** The reliability dial of the iterative operators: per-round lineage
  * truncation through a RELIABLE checkpoint directory must be a pure
  * execution choice — bit-identical results to the default
  * localCheckpoint path, with the checkpoint data actually landing in
  * the given directory (that is what survives an executor loss).
  */
class CheckpointDialSpec extends SparkSpecBase {

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ckpt_$tag").toString

  // a 2-cycle-rich random graph: 200 nodes, seeded edges
  private lazy val edges = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 400).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .toDF("src", "dst")
  }

  test("components: reliable checkpoint dir produces identical clusters and writes files") {
    val dir = tmpDir("cc")
    val pairs = edges.select(col("src").as("doc_a"), col("dst").as("doc_b"))
    val local = DedupClusters.components(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = DedupClusters.components(pairs, checkpointDir = Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable === local)
    // the reliable path must really have checkpointed into the dir
    def fileCount(d: java.io.File): Int =
      if (d.isFile) 1 else Option(d.listFiles).toSeq.flatten.map(fileCount).sum
    assert(fileCount(new java.io.File(dir)) > 0,
      s"no checkpoint data written under $dir")
  }

  test("components releases dead rounds: persisted RDDs do not grow with contraction rounds") {
    import spark.implicits._
    // a 64-node PATH graph forces several large-star/small-star rounds
    // (diameter 63); each round localCheckpoints a fresh edge list.
    // Without the in-loop release, every round's blocks stay persisted
    // until driver GC — the count below would grow with the round
    // count. With it, at most the input truncation's live tail and the
    // final round survive the call.
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val got = DedupClusters.components(chain)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === (0L until 64L).map(i => (i, 0L)).toSet)
    val after = sc.getPersistentRDDs.size
    assert(after - before <= 2,
      s"dead contraction rounds left persisted: $before -> $after " +
        "(release() in the loop should unpersist each superseded round)")
  }

  test("pageRank: truncation cadence and reliability mode never change the ranks") {
    val noTrunc = Graph.pageRank(edges, iters = 12, checkpointEvery = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val localTrunc = Graph.pageRank(edges, iters = 12, checkpointEvery = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliableTrunc = Graph.pageRank(edges, iters = 12, checkpointEvery = 3,
        checkpointDir = Some(tmpDir("pr")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(localTrunc === noTrunc)
    assert(reliableTrunc === noTrunc)
  }

  test("labelPropagation: truncated long run equals the unrolled plan") {
    val noTrunc = Graph.labelPropagation(edges, iters = 9, checkpointEvery = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truncated = Graph.labelPropagation(edges, iters = 9, checkpointEvery = 2,
        checkpointDir = Some(tmpDir("lpa")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truncated === noTrunc)
  }
}
