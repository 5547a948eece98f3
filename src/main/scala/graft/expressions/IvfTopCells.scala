package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Top-`nprobe` cosine cell ids over a packed centroid array — the
  * multi-probe generalization of [[IvfArgmaxCell]], as ONE native
  * codegen'd expression.
  *
  * Inputs: `cb` = `array<struct<cid bigint, cqv array<bigint>,
  * cnsq bigint>>` (the whole centroid table packed cid-ascending —
  * `Embeddings.packedCentroids`), `qv` = the quantized query vector,
  * `nsq` = its squared norm. Returns the `nprobe` cids with the
  * highest cosine, ordered (cosine desc, cid asc) — element 1 is
  * therefore exactly [[IvfArgmaxCell]]'s home cell, so one evaluation
  * serves BOTH the corpus-side assignment and the probe list, where
  * the previous multi-probe plan scanned the corpus twice (once
  * through the packed fold for assignment, once through an n·K row
  * grid + window sort for ranked cells — the grid being the very
  * OOM-at-scale shape the packed fold exists to avoid). Fewer
  * centroids than `nprobe` returns all of them; empty array in,
  * null out (callers filter — an empty index assigns nothing).
  *
  * Ordering contract: insertion keeps slots sorted by (cos desc, cid
  * asc); iterating the cid-ascending array with a strict
  * `compareDoubles(cos, slot) > 0` means an equal-cosine later (=
  * larger) cid never displaces an earlier one — bit-identical to the
  * `row_number() OVER (ORDER BY cos DESC, cid)` ranking it replaces,
  * NaN ordering included.
  */
case class IvfTopCells(cb: Expression, qv: Expression, nsq: Expression, nprobe: Int)
    extends TernaryExpression {

  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def first: Expression = cb
  override def second: Expression = qv
  override def third: Expression = nsq

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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
      "IvfTopCells expects (array<struct<bigint, array<bigint>, bigint>>, " +
        s"array<bigint>, bigint), got ${cb.dataType.simpleString}, " +
        s"${qv.dataType.simpleString}, ${nsq.dataType.simpleString}")
  }

  override def nullSafeEval(cbAny: Any, qvAny: Any, nsqAny: Any): Any = {
    val cents = cbAny.asInstanceOf[ArrayData]
    val q = qvAny.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    val qn = math.sqrt(nsqAny.asInstanceOf[Long].toDouble)
    val topCos = Array.fill(nprobe)(Double.NegativeInfinity)
    val topCid = Array.fill(nprobe)(Long.MinValue)
    var m = 0
    var i = 0
    while (i < k) {
      val c = cents.getStruct(i, 3)
      val cv = c.getArray(1)
      val n = math.min(q.numElements(), cv.numElements())
      var dot = 0L
      var j = 0
      while (j < n) { dot += q.getLong(j) * cv.getLong(j); j += 1 }
      val cos = dot.toDouble / (qn * math.sqrt(c.getLong(2).toDouble))
      // insertion position: strictly-better slots stay put
      var p = m
      while (p > 0 && org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(cos, topCos(p - 1)) > 0) p -= 1
      if (p < nprobe) {
        var s = math.min(m, nprobe - 1)
        while (s > p) { topCos(s) = topCos(s - 1); topCid(s) = topCid(s - 1); s -= 1 }
        topCos(p) = cos
        topCid(p) = c.getLong(0)
        if (m < nprobe) m += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(topCid, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (cbV, qvV, nsqV) => {
      val k = ctx.freshName("tcK")
      val i = ctx.freshName("tcI")
      val j = ctx.freshName("tcJ")
      val n = ctx.freshName("tcN")
      val c = ctx.freshName("tcC")
      val cv = ctx.freshName("tcCv")
      val dot = ctx.freshName("tcDot")
      val cos = ctx.freshName("tcCos")
      val qn = ctx.freshName("tcQn")
      val topCos = ctx.freshName("tcTopCos")
      val topCid = ctx.freshName("tcTopCid")
      val m = ctx.freshName("tcM")
      val p = ctx.freshName("tcP")
      val s = ctx.freshName("tcS")
      s"""
         |final int $k = $cbV.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final double $qn = java.lang.Math.sqrt((double) $nsqV);
         |  final double[] $topCos = new double[$nprobe];
         |  final long[] $topCid = new long[$nprobe];
         |  java.util.Arrays.fill($topCos, java.lang.Double.NEGATIVE_INFINITY);
         |  int $m = 0;
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
         |    int $p = $m;
         |    while ($p > 0 && org.apache.spark.sql.catalyst.util.SQLOrderingUtil
         |        .compareDoubles($cos, $topCos[$p - 1]) > 0) $p--;
         |    if ($p < $nprobe) {
         |      for (int $s = java.lang.Math.min($m, $nprobe - 1); $s > $p; $s--) {
         |        $topCos[$s] = $topCos[$s - 1];
         |        $topCid[$s] = $topCid[$s - 1];
         |      }
         |      $topCos[$p] = $cos;
         |      $topCid[$p] = $c.getLong(0);
         |      if ($m < $nprobe) $m++;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(java.util.Arrays.copyOf($topCid, $m));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): IvfTopCells =
    copy(cb = newFirst, qv = newSecond, nsq = newThird)

  override def prettyName: String = "ivf_top_cells"
}
