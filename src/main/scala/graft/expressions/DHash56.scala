package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: 56-bit difference hash (dHash) of a
  * 32×32 grayscale image vector — the perceptual fingerprint for
  * image near-dup detection (the standard dHash construction from the
  * public perceptual-hashing literature, e.g. the pHash/ImageHash
  * family: downscale, then hash the sign of adjacent-cell brightness
  * gradients).
  *
  * Semantics (integer-exact, so a SQL oracle can re-derive it — the
  * q27 bit-algebra discipline): the 1,024-element row-major vector
  * ([[graft.ops.Images.decodeToVector]]'s output shape, the
  * reference's own 32×32 modality, main.py:123-142) is reduced to an
  * 8×8 grid of 4×4-block sums; bit r*7+c (r in 0..7, c in 0..6) is
  * set iff S(r,c) < S(r,c+1). Comparing SUMS instead of means avoids
  * any division: for whole-valued pixels every accumulation is exact
  * in double, and the hash is invariant under global brightness shift
  * (all sums move equally) — re-encoded or brightness-adjusted copies
  * collapse to the SAME hash, small local edits flip O(1) bits, so a
  * banded Hamming join finds them (q38's SimHash shape).
  *
  * Per-row bounded work (1,024 elements) fused into whole-stage
  * codegen via a single static call — the same (b)-tier escalation
  * precedent as [[SimHash64]] and [[CosineSimilarity]]: hashing is a
  * pure map stage; the only shuffle downstream moves 8-byte hashes.
  */
case class DHash56(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash56"

  override def nullSafeEval(input: Any): Any =
    DHash56.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.DHash56$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DHash56 =
    copy(child = newChild)
}

object DHash56 {

  /** Block sums then gradient bits; null elements count as 0 (decoded
    * images never carry nulls — the tolerance only keeps the kernel
    * total). Vectors shorter than 1,024 hash their prefix (missing
    * pixels are 0), longer ones their first 1,024.
    */
  def compute(a: ArrayData): Long = {
    val s = new Array[Double](64)
    val n = math.min(a.numElements(), 1024)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        // cell index: row = (i/32)/4, col = (i%32)/4
        s((((i >> 5) >> 2) << 3) + ((i & 31) >> 2)) += a.getFloat(i)
      }
      i += 1
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        if (s((r << 3) + c) < s((r << 3) + c + 1)) h |= 1L << (r * 7 + c)
        c += 1
      }
      r += 1
    }
    h
  }
}
