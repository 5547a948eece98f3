package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** The 64 blockhash sample-window byte sums of a binary payload as ONE
  * native codegen'd expression — the feature half of
  * [[graft.operators.Multimodal.pHash64]].
  *
  * Why this exists: the composable form reads the payload through
  * `lower(hex(bin))` and then, PER BLOCK, slices 16 hex chars and
  * `conv`s them back to a long whose bytes are summed by
  * shift-and-mask — 64 blocks × 2 grids = 128 `conv` calls plus a
  * payload-sized hex string per row, and the unrolled expression tree
  * is big enough to push whole-stage codegen's generated methods past
  * JIT limits (the bench logged 5 MB task binaries on the phash
  * query). The hex round trip computes nothing the raw bytes don't
  * already hold: the byte sum of a big-endian-read window IS the sum
  * of the window's unsigned bytes. This expression is that loop —
  * 64 × ≤8 unsigned byte adds straight off the payload, no hex
  * string, no conv, O(row) generated code.
  *
  * Exact-parity contract with the composed form and the DuckDB oracle
  * (`TRY_CAST('0x' || substring(hx, …, 16) AS BIGINT)`), asserted by
  * ExpressionEquivalenceSpec:
  *   - window start for block i is `len·i/blocks` bytes (floor), or
  *     `len·(2i+1)/(2·blocks)` on the midpoint grid;
  *   - a window truncated by end-of-payload sums the bytes that
  *     exist (the missing suffix contributes 0);
  *   - a FULL 8-byte window whose first byte has the top bit set
  *     reads as a value ≥ 2⁶³, which both engines' 64-bit casts
  *     reject to 0 — the native loop replicates that as a first-byte
  *     test so high-byte payloads keep hash parity. (Sub-8-byte
  *     windows max out at 2⁵⁶ and never trigger it; the operator's
  *     default geometry samples [[graft.operators.Multimodal.PHashSampleBytes]]
  *     = 4 bytes, so there the sums are plain unsigned byte sums for
  *     every payload.)
  *
  * Null contract: null payload → null (standard UnaryExpression);
  * empty payload → all-zero features (every window is empty).
  */
case class PHashFeatureSums(
    child: Expression,
    midpoint: Boolean,
    blocks: Int,
    sampleBytes: Int)
    extends UnaryExpression {

  require(blocks >= 1, s"blocks must be >= 1, got $blocks")
  require(sampleBytes >= 1 && sampleBytes <= 8,
    s"sampleBytes must be in [1, 8], got $sampleBytes")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"PHashFeatureSums expects a binary input, got ${child.dataType.simpleString}")

  override def nullSafeEval(binAny: Any): Any = {
    val bytes = binAny.asInstanceOf[Array[Byte]]
    val len = bytes.length
    val out = new Array[Long](blocks)
    var i = 0
    while (i < blocks) {
      val start = (if (midpoint) len.toLong * (2 * i + 1) / (2L * blocks)
                   else len.toLong * i / blocks).toInt
      val end = math.min(start + sampleBytes, len)
      var f = 0L
      if (!(end - start == 8 && (bytes(start) & 0x80) != 0)) {
        var j = start
        while (j < end) { f += bytes(j) & 0xff; j += 1 }
      }
      out(i) = f
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bin => {
      val len = ctx.freshName("phLen")
      val out = ctx.freshName("phOut")
      val i = ctx.freshName("phI")
      val j = ctx.freshName("phJ")
      val start = ctx.freshName("phStart")
      val end = ctx.freshName("phEnd")
      val f = ctx.freshName("phF")
      val startExpr =
        if (midpoint) s"(int) ((long) $len * (2 * $i + 1) / ${2L * blocks}L)"
        else s"(int) ((long) $len * $i / ${blocks}L)"
      s"""
         |final int $len = $bin.length;
         |final long[] $out = new long[$blocks];
         |for (int $i = 0; $i < $blocks; $i++) {
         |  final int $start = $startExpr;
         |  final int $end = java.lang.Math.min($start + $sampleBytes, $len);
         |  long $f = 0L;
         |  if (!($end - $start == 8 && ($bin[$start] & 0x80) != 0)) {
         |    for (int $j = $start; $j < $end; $j++) {
         |      $f += $bin[$j] & 0xff;
         |    }
         |  }
         |  $out[$i] = $f;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PHashFeatureSums =
    copy(child = newChild)

  override def prettyName: String = "phash_feature_sums"
}
