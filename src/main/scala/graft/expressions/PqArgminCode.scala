package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-codebook-entry (code, squared-L2 qdist) over a packed PQ
  * codebook — the PQ encode loop as ONE native codegen'd expression,
  * the subspace sibling of [[IvfArgmaxCell]].
  *
  * Inputs: `cb` = `array<struct<cid bigint, cqv array<bigint>,
  * cnsq bigint>>` (one subspace's codebook, cid-ascending), `sqv` =
  * the quantized subvector, `snsq` = its squared norm. Distance is
  * the exact int64 `snsq + cnsq − 2·dot(sqv, cqv)`; minimum wins,
  * ties keep the FIRST (smallest cid) via strict less-than — the
  * ordering contract of the grid `max_by` both this and the HOF fold
  * replaced. Null for an empty codebook (callers filter those rows).
  *
  * Exists for the same reason as [[IvfArgmaxCell]]: the row-grid
  * SortAggregate was an OOM cliff at the 10× soak and the `aggregate`
  * HOF fold is interpreted per element; this is the same fold
  * compiled into whole-stage codegen. All-integer arithmetic, so
  * bit-exactness needs no ordering shim.
  */
case class PqArgminCode(cb: Expression, sqv: Expression, snsq: Expression)
    extends TernaryExpression {

  override def first: Expression = cb
  override def second: Expression = sqv
  override def third: Expression = snsq

  override def dataType: DataType = StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("qdist", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val cbOk = cb.dataType match {
      case ArrayType(StructType(Array(f0, f1, f2)), _) =>
        f0.dataType == LongType &&
          (f1.dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
          f2.dataType == LongType
      case _ => false
    }
    val svOk = sqv.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    }
    if (cbOk && svOk && snsq.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "PqArgminCode expects (array<struct<bigint, array<bigint>, bigint>>, " +
        s"array<bigint>, bigint), got ${cb.dataType.simpleString}, " +
        s"${sqv.dataType.simpleString}, ${snsq.dataType.simpleString}")
  }

  override def nullSafeEval(cbAny: Any, svAny: Any, snsqAny: Any): Any = {
    val cents = cbAny.asInstanceOf[ArrayData]
    val s = svAny.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    val sn = snsqAny.asInstanceOf[Long]
    var bestDist = Long.MaxValue
    var bestCid = Long.MinValue
    var i = 0
    while (i < k) {
      val c = cents.getStruct(i, 3)
      val cv = c.getArray(1)
      val n = math.min(s.numElements(), cv.numElements())
      var dot = 0L
      var j = 0
      while (j < n) { dot += s.getLong(j) * cv.getLong(j); j += 1 }
      val dist = sn + c.getLong(2) - 2L * dot
      if (dist < bestDist) {
        bestDist = dist
        bestCid = c.getLong(0)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestCid, bestDist)): InternalRow
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cbV, svV, snsqV) => {
      val k = ctx.freshName("pqK")
      val i = ctx.freshName("pqI")
      val j = ctx.freshName("pqJ")
      val n = ctx.freshName("pqN")
      val c = ctx.freshName("pqC")
      val cv = ctx.freshName("pqCv")
      val dot = ctx.freshName("pqDot")
      val dist = ctx.freshName("pqDist")
      val bestDist = ctx.freshName("pqBestDist")
      val bestCid = ctx.freshName("pqBestCid")
      s"""
         |final int $k = $cbV.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bestDist = java.lang.Long.MAX_VALUE;
         |  long $bestCid = java.lang.Long.MIN_VALUE;
         |  for (int $i = 0; $i < $k; $i++) {
         |    final org.apache.spark.sql.catalyst.InternalRow $c = $cbV.getStruct($i, 3);
         |    final org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray(1);
         |    final int $n = java.lang.Math.min($svV.numElements(), $cv.numElements());
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $dot += $svV.getLong($j) * $cv.getLong($j);
         |    }
         |    final long $dist = $snsqV + $c.getLong(2) - 2L * $dot;
         |    if ($dist < $bestDist) {
         |      $bestDist = $dist;
         |      $bestCid = $c.getLong(0);
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { java.lang.Long.valueOf($bestCid), java.lang.Long.valueOf($bestDist) });
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqArgminCode =
    copy(cb = newFirst, sqv = newSecond, snsq = newThird)

  override def prettyName: String = "pq_argmin_code"
}
