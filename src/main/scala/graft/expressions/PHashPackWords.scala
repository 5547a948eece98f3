package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The blockhash bit rule — bit i = 1 iff feature i's sum strictly
  * exceeds 2× the lower median of all `blocks` sums — packed into
  * ⌈blocks/64⌉ longs as ONE native codegen'd expression: the word half
  * of [[graft.operators.Multimodal.pHashWords]].
  *
  * Why this exists: the composable form is `array_sort` plus ONE
  * `when(element_at(...) * 2 > med2, 1L << j)` branch PER BIT — 256
  * blocks × 2 grids = 512 when-branches whose generated code blows
  * past JIT method limits, so the hot projection runs effectively
  * interpreted (measured: the signature stage alone was 6.9 s of
  * `multimodal_phash_scaled`'s 7.8 s at sf0.1 — 1.4 ms/row for what
  * is arithmetically ~512 comparisons). This expression is the rule
  * as a loop — one defensive-copy sort (the input array must not be
  * mutated: UnsafeArrayData aliases the row buffer) and one pack pass
  * — O(blocks log blocks) per row with O(1)-sized generated code.
  *
  * Exact-parity contract with the composed form (asserted by
  * ExpressionEquivalenceSpec):
  *   - med2 = sorted[blocks/2 − 1] + sorted[blocks/2] (0-indexed) —
  *     2× the lower median, the `element_at(sorted, blocks/2) +
  *     element_at(sorted, blocks/2 + 1)` of the composed form;
  *   - strict `>` (ties → 0), bit j of word w set for feature
  *     64·w + j — word 0 of blocks = 64 is bit-identical to
  *     [[graft.operators.Multimodal.pHash64]]'s single long.
  *
  * The input MUST hold exactly `blocks` non-null longs (the
  * [[PHashFeatureSums]] output shape) — anything else is a geometry
  * bug upstream and fails loudly rather than hashing garbage.
  *
  * Null contract: null feature array → null (standard
  * UnaryExpression).
  */
case class PHashPackWords(child: Expression, blocks: Int)
    extends UnaryExpression {

  require(blocks >= 2, s"blocks must be >= 2, got $blocks")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // containsNull = true is rejected at TYPE CHECK, not tolerated at
  // runtime: the interpreted path (GenericArrayData.toLongArray) would
  // NPE on a null element while codegen (UnsafeArrayData.toLongArray)
  // would silently read the null slot as 0 and hash garbage — the two
  // eval paths must never diverge, and the only non-null-element
  // producer this expression is specified against ([[PHashFeatureSums]])
  // already declares containsNull = false.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      "PHashPackWords expects array<bigint> with non-nullable elements " +
        "(a null feature sum is a geometry bug upstream; the codegen " +
        "path would silently hash it as 0)")
    case other => TypeCheckResult.TypeCheckFailure(
      s"PHashPackWords expects array<bigint>, got ${other.simpleString}")
  }

  private val nWords = (blocks + 63) / 64

  override def nullSafeEval(featsAny: Any): Any = {
    val feats = featsAny.asInstanceOf[ArrayData].toLongArray()
    if (feats.length != blocks) throw new IllegalArgumentException(
      s"PHashPackWords(blocks = $blocks) got ${feats.length} features")
    val sorted = feats.clone()
    java.util.Arrays.sort(sorted)
    val med2 = sorted(blocks / 2 - 1) + sorted(blocks / 2)
    val words = new Array[Long](nWords)
    var i = 0
    while (i < blocks) {
      if (feats(i) * 2 > med2) words(i / 64) |= 1L << (i % 64)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, feats => {
      val f = ctx.freshName("ppwF")
      val sorted = ctx.freshName("ppwSorted")
      val med2 = ctx.freshName("ppwMed2")
      val words = ctx.freshName("ppwWords")
      val i = ctx.freshName("ppwI")
      s"""
         |final long[] $f = $feats.toLongArray();
         |if ($f.length != $blocks) {
         |  throw new IllegalArgumentException(
         |    "PHashPackWords(blocks = $blocks) got " + $f.length + " features");
         |}
         |final long[] $sorted = (long[]) $f.clone();
         |java.util.Arrays.sort($sorted);
         |final long $med2 = $sorted[${blocks / 2 - 1}] + $sorted[${blocks / 2}];
         |final long[] $words = new long[$nWords];
         |for (int $i = 0; $i < $blocks; $i++) {
         |  if ($f[$i] * 2 > $med2) $words[$i / 64] |= 1L << ($i % 64);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($words);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PHashPackWords =
    copy(child = newChild)

  override def prettyName: String = "phash_pack_words"
}
