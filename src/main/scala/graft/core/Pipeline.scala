package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Composable pipeline API — the Spark-native successor of the reference
  * engine's extractor → transformer-chain → loader-fan-out shape
  * (reference: tiny_etl/pipline.py:179-300, ThreadedPipeline topology).
  *
  * Everything the reference does with processes, queues, ack counters and
  * shutdown protocols collapses here into ONE lazy logical plan plus one
  * action per sink. Catalyst fuses the transform chain (whole-stage
  * codegen ≙ the reference's flatMapApply generator fusion,
  * tiny_etl/commons.py:46-56) and the Spark scheduler replaces the
  * hand-rolled worker/queue plumbing.
  */
object api {
  /** A transform is a pure DataFrame function — the Spark shape of
    * AbstractTransformer.transform (tiny_etl/transformers/commons.py:33-57).
    */
  type Transform = DataFrame => DataFrame

  /** Source contract ≙ AbstractExtractor (tiny_etl/extractors/commons.py:6-15). */
  trait Source { def load(spark: SparkSession): DataFrame }

  /** Sink contract ≙ AbstractLoader (tiny_etl/loaders/commons.py:10-38).
    * Batching / flushing / parallel write tiers are Spark writer concerns.
    */
  trait Sink { def write(df: DataFrame): Unit }

  /** Chain transforms left-to-right. */
  def chain(ts: Transform*): Transform = df => ts.foldLeft(df)((d, t) => t(d))
}

import api._

/** One source, a fused transform chain, and N sinks that all see the full
  * result — the reference broadcasts every record to every loader queue
  * (tiny_etl/pipline.py:127-135). We cache the final plan once so the
  * multi-sink fan-out doesn't recompute the lineage per sink.
  */
final case class Pipeline(
    source: Source,
    transforms: Seq[Transform] = Nil,
    sinks: Seq[Sink] = Nil) {

  def transform(t: Transform): Pipeline = copy(transforms = transforms :+ t)
  def to(s: Sink): Pipeline = copy(sinks = sinks :+ s)

  /** Build the lazy plan without executing. */
  def plan(spark: SparkSession): DataFrame =
    transforms.foldLeft(source.load(spark))((df, t) => t(df))

  /** Execute: write the (cached, if fan-out) result to every sink. */
  def run(spark: SparkSession): Unit = {
    val df = plan(spark)
    if (sinks.sizeIs > 1) {
      val cached = df.cache()
      try sinks.foreach(_.write(cached))
      finally cached.unpersist()
    } else sinks.foreach(_.write(df))
  }
}
