package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Argmax-cosine cell id over a packed centroid array — the IVF
  * assignment loop as ONE native codegen'd expression.
  *
  * Inputs: `cb` = `array<struct<cid bigint, cqv array<bigint>,
  * cnsq bigint>>` (the whole centroid table packed cid-ascending —
  * see `Embeddings.packedCentroids`), `qv` = the quantized query
  * vector, `nsq` = its squared norm. Returns the `cid` with the
  * maximum cosine `dot(qv, cqv) / (√nsq · √cnsq)`; ties keep the
  * FIRST (smallest cid, the array being pre-sorted) via a strict
  * greater-than, the exact ordering contract of the `max_by(cid,
  * struct(cos, -cid))` grid aggregation this replaces. Null if the
  * centroid array is empty (callers filter that row out — an empty
  * index assigns nothing).
  *
  * Why native: the composable forms are either an n·K row grid
  * through a struct-buffered SortAggregate (an executor-OOM cliff at
  * the 10× soak — see SCALE.md round 9) or an `aggregate` HOF fold
  * (O(row) memory but interpreted per element, ~2× on the fixture
  * battery). This compiles the same fold to a bare loop inside
  * whole-stage codegen: O(row) memory AND codegen speed. Double
  * comparison goes through `SQLOrderingUtil.compareDoubles` so NaN
  * ordering is bit-identical to the SQL `>` the HOF form used.
  */
case class IvfArgmaxCell(cb: Expression, qv: Expression, nsq: Expression)
    extends TernaryExpression {

  override def first: Expression = cb
  override def second: Expression = qv
  override def third: Expression = nsq

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val cbOk = cb.dataType match {
      case ArrayType(StructType(Array(f0, f1, f2)), _) =>
        f0.dataType == LongType &&
          (f1.dataType match { case ArrayType(LongType, _) => true; case _ => false }) &&
          f2.dataType == LongType
      case _ => false
    }
    val qvOk = qv.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    }
    if (cbOk && qvOk && nsq.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "IvfArgmaxCell expects (array<struct<bigint, array<bigint>, bigint>>, " +
        s"array<bigint>, bigint), got ${cb.dataType.simpleString}, " +
        s"${qv.dataType.simpleString}, ${nsq.dataType.simpleString}")
  }

  override def nullSafeEval(cbAny: Any, qvAny: Any, nsqAny: Any): Any = {
    val cents = cbAny.asInstanceOf[ArrayData]
    val q = qvAny.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    val qn = math.sqrt(nsqAny.asInstanceOf[Long].toDouble)
    var bestCos = Double.NegativeInfinity
    var bestCid = Long.MinValue
    var i = 0
    while (i < k) {
      val c = cents.getStruct(i, 3)
      val cv = c.getArray(1)
      val n = math.min(q.numElements(), cv.numElements())
      var dot = 0L
      var j = 0
      while (j < n) { dot += q.getLong(j) * cv.getLong(j); j += 1 }
      val cos = dot.toDouble / (qn * math.sqrt(c.getLong(2).toDouble))
      if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(cos, bestCos) > 0) {
        bestCos = cos
        bestCid = c.getLong(0)
      }
      i += 1
    }
    bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cbV, qvV, nsqV) => {
      val k = ctx.freshName("ivfK")
      val i = ctx.freshName("ivfI")
      val j = ctx.freshName("ivfJ")
      val n = ctx.freshName("ivfN")
      val c = ctx.freshName("ivfC")
      val cv = ctx.freshName("ivfCv")
      val dot = ctx.freshName("ivfDot")
      val cos = ctx.freshName("ivfCos")
      val qn = ctx.freshName("ivfQn")
      val bestCos = ctx.freshName("ivfBestCos")
      val bestCid = ctx.freshName("ivfBestCid")
      s"""
         |final int $k = $cbV.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double $qn = java.lang.Math.sqrt((double) $nsqV);
         |  double $bestCos = java.lang.Double.NEGATIVE_INFINITY;
         |  long $bestCid = java.lang.Long.MIN_VALUE;
         |  for (int $i = 0; $i < $k; $i++) {
         |    final org.apache.spark.sql.catalyst.InternalRow $c = $cbV.getStruct($i, 3);
         |    final org.apache.spark.sql.catalyst.util.ArrayData $cv = $c.getArray(1);
         |    final int $n = java.lang.Math.min($qvV.numElements(), $cv.numElements());
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $dot += $qvV.getLong($j) * $cv.getLong($j);
         |    }
         |    final double $cos =
         |      (double) $dot / ($qn * java.lang.Math.sqrt((double) $c.getLong(2)));
         |    if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |        .compareDoubles($cos, $bestCos) > 0) {
         |      $bestCos = $cos;
         |      $bestCid = $c.getLong(0);
         |    }
         |  }
         |  ${ev.value} = $bestCid;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): IvfArgmaxCell =
    copy(cb = newFirst, qv = newSecond, nsq = newThird)

  override def prettyName: String = "ivf_argmax_cell"
}
