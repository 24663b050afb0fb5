package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprints
  * (Schleimer et al., SIGMOD'03) in ONE fused per-row kernel — a TRUE
  * rolling hash (O(1) per gram via the precomputed B^(k−1) term)
  * feeding a window-minimum selection, versus the HOF composition in
  * early q47 that re-folded k chars per gram through interpreted
  * lambdas with a per-gram array allocation (13 s at sf0.1; this
  * kernel is ~10×). Same (b)-tier escalation precedent as
  * [[CosineSimilarity]].
  *
  * Math is IDENTICAL to the DuckDB oracle: base-B polynomial of char
  * codes mod M per k-gram, minimum of each w-hash window, distinct
  * set. Output is the sorted distinct fingerprint array (ascending —
  * deterministic; the q47 summary aggregates are order-invariant
  * anyway). Strings shorter than k+w−1 chars yield an empty array.
  * Char codes are UTF-16 units — identical to code points on the
  * BMP text this targets (the oracle's `ascii()` is code-point based,
  * so parity holds for ASCII/BMP corpora).
  *
  * Codegen emits a single static call to [[WinnowFingerprints.compute]]
  * — the per-row work is hundreds of operations, so the win is keeping
  * the surrounding stage in whole-stage codegen, not inlining the loop.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size k must be >= 1, got $k")
  require(w >= 1, s"window size w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WinnowFingerprints$$.MODULE$$" +
        s".compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  /** Base and modulus of the polynomial hash — mirrored literally in the
    * q47 oracle SQL; change both together or never.
    */
  val B = 131L
  val M = 2147483647L

  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    // code points, not UTF-16 units — matches the oracle's per-code-
    // point hash and [[WinnowedGramMins]]'s indexing for all text
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    // B^(k-1) mod M for the rolling drop-leading-char step
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * B % M; i += 1 }
    // Ring buffer of the last w gram hashes — auxiliary memory is O(w),
    // not O(len): a per-row array of every gram hash would be the
    // memory hazard on pathologically long documents.
    val ring = new Array[Long](w)
    val selected = new java.util.TreeSet[java.lang.Long]()
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    ring(0) = h
    // w=1 degenerates to "select every gram hash": gram 0's window is
    // complete immediately (the loop below only selects from gram 1 on)
    if (w == 1) selected.add(h)
    var g = 1 // index of the NEXT gram to hash
    while (g < nGrams) {
      // ((h − c_out·B^(k−1)) · B + c_in) mod M, kept non-negative
      h = ((h - cps(g - 1) * bk % M + M) % M * B + cps(g + k - 1)) % M
      ring(g % w) = h
      if (g >= w - 1) {
        var m = ring(0)
        var t = 1
        while (t < w) { if (ring(t) < m) m = ring(t); t += 1 }
        selected.add(m)
      }
      g += 1
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
