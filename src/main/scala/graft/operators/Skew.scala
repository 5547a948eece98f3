package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Cols

/** Key-salting for skewed shuffles — the manual escape hatch for the
  * one residue AQE's skew-join splitting does not cover (a single join
  * key so hot that even a split partition is one task's worth, or
  * engines/contexts where AQE is off, e.g. stateful streaming).
  *
  * Shape: the probe side gets a deterministic salt in [0, saltN) from a
  * hash of its full row; the build side is replicated saltN× (one copy
  * per salt value); the equijoin key becomes (key..., salt). A key with
  * p% of all rows then spreads over saltN tasks instead of one. Cost:
  * build side × saltN — use for modest build sides that are too big or
  * too dynamic to broadcast but cheap to replicate.
  *
  * The salt is derived (xxhash64 of the probe row), not random — same
  * input, same plan, same result, per the library's determinism
  * contract; replicate-side explode uses a literal sequence, so no RNG
  * state exists anywhere.
  */
object Skew {

  /** Salted equijoin on `keys`. Output equals
    * `left.join(right, keys, joinType)` row-for-row; only the shuffle
    * distribution differs. `joinType` is restricted to the shapes where
    * replicating the RIGHT side is sound (inner / left variants).
    *
    * The salt hashes the FULL probe row, so it only spreads a hot key
    * whose rows DIFFER somewhere. Fully-identical duplicate rows — the
    * common shape in a dedup-centric pipeline — all hash to one salt
    * and still collapse into one task; pass `disambiguators` (any
    * deterministic per-row expressions that vary across the duplicates,
    * e.g. a line number, a file offset, or `spark_partition_id()` when
    * run-to-run plan stability is acceptable) to mix extra entropy into
    * the salt. Determinism: with column-based disambiguators the salt
    * is a pure function of the row, per the library contract. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      saltN: Int,
      joinType: String = "inner",
      disambiguators: Seq[org.apache.spark.sql.Column] = Nil): DataFrame = {
    require(saltN >= 1, s"saltN must be >= 1, got $saltN")
    val okTypes = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
    require(okTypes(joinType.toLowerCase),
      s"saltedJoin replicates the right side; '$joinType' would change semantics")
    val saltC = Cols.fresh("__salt", left.columns.toSeq ++ right.columns)
    val l = left.withColumn(saltC,
      pmod(xxhash64(struct(left.columns.map(col).toSeq ++ disambiguators: _*)),
        lit(saltN.toLong)))
    val r = right.withColumn(saltC,
      explode(sequence(lit(0L), lit(saltN.toLong - 1))))
    l.join(r, keys :+ saltC, joinType).drop(saltC)
  }
}
