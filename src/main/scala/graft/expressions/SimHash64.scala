package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit token-level SimHash of a string
  * (Charikar, STOC'02) in one fused per-row kernel.
  *
  * Semantics are bit-identical to the relational formulation q38 used
  * through round 5 (`explode(array_distinct(split(text, ' ')))` →
  * `xxhash64(token)` → 64 conditional-sum bit votes → `bit > 0` ⇒ set),
  * asserted in `SimHashExprSpec`. The difference is the execution shape:
  * SimHash is a PER-DOCUMENT reduction, so computing it via explode +
  * groupBy shuffles one row per (doc, token) and re-aggregates — at
  * 100 TB that is a full-corpus-sized shuffle for a value derivable in
  * the map task that read the document. This kernel makes fingerprinting
  * a pure map stage: zero shuffle until the band self-join, which moves
  * only 8-byte fingerprints.
  *
  * Token semantics mirror `split(text, " ")` exactly (Java regex split,
  * limit −1: consecutive separators yield empty tokens, trailing empties
  * kept) and dedup mirrors `array_distinct` (token string equality).
  * Hashes are Spark's own `xxhash64` (seed 42), so fingerprints equal
  * the old pipeline's bit for bit.
  *
  * Codegen emits a single static call to [[SimHash64.compute]] so the
  * surrounding stage stays in whole-stage codegen — the same (b)-tier
  * escalation precedent as [[CosineSimilarity]], [[WinnowFingerprints]]
  * and [[CharBigrams]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash64$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val space = UTF8String.fromString(" ")

  def compute(s: UTF8String): Long = {
    // Same split as Spark's split(text, " "): regex, limit -1.
    val tokens = s.split(space, -1)
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[UTF8String]()
    var t = 0
    while (t < tokens.length) {
      val tok = tokens(t)
      if (seen.add(tok)) {
        val h = XxHash64Function.hash(tok, StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }
}
