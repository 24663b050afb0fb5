package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: POSITIONAL winnowing (Schleimer et al.,
  * SIGMOD'03) — the selected (position, fingerprint) pairs of a
  * document, one per k-gram-hash window minimum, leftmost on ties.
  *
  * [[WinnowFingerprints]] returns the distinct fingerprint VALUES (all
  * q47 needs); span-level dedup ([[graft.ops.SpanDedup]]) additionally
  * needs WHERE each selected gram starts, so duplicated-fingerprint
  * hits can be merged back into character intervals. Positions are
  * 1-based (substr semantics, matching the q100/q104 oracles).
  *
  * Same hash as [[WinnowFingerprints]] — base-131 polynomial of char
  * codes mod 2³¹−1, O(1) per gram via the rolling drop-term — so the
  * DuckDB oracle reproduces selection bit-for-bit (`list_position`
  * returns the FIRST index of the window minimum = this kernel's
  * strict-< leftmost scan). Strings shorter than k+w−1 yield an empty
  * array. Auxiliary memory is O(w) (hash ring buffer), not O(len).
  */
case class WinnowedGramMins(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"gram size k must be >= 1, got $k")
  require(w >= 1, s"window size w must be >= 1, got $w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "winnowed_gram_mins"

  override def nullSafeEval(input: Any): Any =
    WinnowedGramMins.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WinnowedGramMins$$.MODULE$$" +
        s".compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowedGramMins =
    copy(child = newChild)
}

object WinnowedGramMins {
  import WinnowFingerprints.{B, M}

  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    // CODE POINTS, not UTF-16 units: positions feed `substr` (which
    // counts code points) in SpanDedup's literal-gram dup gate, and
    // the DuckDB oracle hashes per code point — charAt indexing would
    // shift every position after a supplementary-plane character and
    // make the re-sliced gram misaligned (silent missed duplicates).
    // For BMP text the two indexings coincide; this makes ALL text
    // self-consistent.
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - k + 1
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * B % M; i += 1 }
    val ring = new Array[Long](w)
    // pos → fingerprint; a position's hash is a function of the
    // position, so re-selection by overlapping windows is idempotent
    val selected = new java.util.TreeMap[Long, Long]()
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    ring(0) = h
    if (w == 1) selected.put(1L, h)
    var g = 1
    while (g < nGrams) {
      h = ((h - cps(g - 1) * bk % M + M) % M * B + cps(g + k - 1)) % M
      ring(g % w) = h
      if (g >= w - 1) {
        // leftmost window minimum: scan grams g−w+1 … g in order,
        // strict < keeps the first occurrence
        var bestPos = g - w + 1
        var bestH = ring(bestPos % w)
        var t = g - w + 2
        while (t <= g) {
          if (ring(t % w) < bestH) { bestPos = t; bestH = ring(t % w) }
          t += 1
        }
        selected.put(bestPos + 1L, bestH) // 1-based
      }
      g += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      i += 1
    }
    new GenericArrayData(out)
  }
}
