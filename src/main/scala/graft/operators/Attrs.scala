package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.api.Transform

/** Column-level projection/derivation — the Spark form of
  * OneToOneItemAttributesTransformer (tiny_etl/transformers/one_to_one.py:9-66).
  *
  * The reference applies four rule kinds to each record:
  *   - static_values_1: set a literal at a path
  *   - derived_values_2: fn-chain from an input path to a NEW output path
  *   - trans_values_3:  fn-chain applied in place
  *   - remove_key_paths: drop fields
  *
  * Load-bearing semantics (SURVEY §2.2, §7.4): every rule reads the
  * PRE-IMAGE — the reference reads `item` and writes `item_`
  * (one_to_one.py:41-52), so a derived column sees the value a sibling
  * in-place rule is about to overwrite. We reproduce that by evaluating
  * all right-hand sides against the input frame in ONE `select`, never
  * chaining `withColumn` (which would leak post-image values and also
  * bloat the plan with N projections — one select keeps a single
  * codegen'd projection).
  *
  * Null propagation: the reference skips a rule when the input value is
  * null (one_to_one.py:41-42,51-52) — Spark's expression semantics
  * (null in → null out) already match for fn-chains.
  *
  * Deliberate divergence — `remove`: the reference calls
  * dict_deep_remove on the pre-copy `item` (one_to_one.py:60-62), so a
  * TOP-LEVEL remove_key_paths never affects the yielded `item_` — the
  * declared remove is a silent no-op in the reference. This rebuild
  * implements the evident intent (the columns are actually dropped);
  * the oracle queries encode the dropped-column behavior.
  */
final case class AttrsTransform(
    static: Seq[(String, Any)] = Nil,
    derived: Seq[(String, String, Column => Column)] = Nil,
    inPlace: Seq[(String, Column => Column)] = Nil,
    remove: Seq[String] = Nil)
    extends Transform {

  def apply(df: DataFrame): DataFrame = {
    val inPlaceMap = inPlace.toMap
    val staticMap = static.toMap
    val removed = remove.toSet

    val kept = df.columns.toSeq.filterNot(removed.contains).map { name =>
      (staticMap.get(name), inPlaceMap.get(name)) match {
        case (Some(v), _) => lit(v).as(name)
        case (_, Some(f)) => f(col(name)).as(name)
        case _            => col(name)
      }
    }
    val newStatics = staticMap.collect {
      case (name, v) if !df.columns.contains(name) => lit(v).as(name)
    }
    // Derived columns evaluate against the pre-image `df` columns by
    // construction: all expressions below are resolved in one select.
    val derivedCols = derived.map { case (out, in, f) => f(col(in)).as(out) }
    df.select(kept ++ newStatics ++ derivedCols: _*)
  }
}

object AttrsTransform {
  /** Identity transform — OneToOneNoopTransformer
    * (tiny_etl/transformers/commons.py:73-90). */
  val noop: Transform = identity[DataFrame]
}
