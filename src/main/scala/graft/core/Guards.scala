package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-plan data-contract guards — checks that ride the query plan and
  * fail the JOB at execution time (not an eager driver-side action), so
  * a contract violation surfaces exactly once, wherever the frame is
  * first materialized.
  */
object Guards {

  /** Pass-through that fails execution if `idCol` carries a duplicate
    * value, with the offending id in the error message. Every index
    * seam here keys state by id (centroid identities ARE ids, signature
    * stores join on id), so a duplicated id silently corrupts
    * downstream joins — this makes the contract self-enforcing.
    *
    * Shape: a per-id window count plus `assert_true`, kept alive by a
    * FILTER on the asserted value (a projected-then-dropped assert
    * would be deleted by column pruning; a filter cannot be). Costs one
    * hash shuffle of the input on `idCol` — right for increment-sized
    * seams (daily tranches, query frames); on a corpus-sized hot path
    * prefer validating once at ingest and skipping the guard there.
    */
  def requireUniqueIds(df: DataFrame, idCol: String): DataFrame = {
    val c = Cols.fresh("__n_per_id", df.columns.toSeq)
    df.withColumn(c, count(lit(1)).over(Window.partitionBy(col(idCol))))
      .filter(assert_true(col(c) === 1,
        concat(lit(s"duplicate id in column '$idCol': "),
          col(idCol).cast("string"))).isNull)
      .drop(c)
  }
}
