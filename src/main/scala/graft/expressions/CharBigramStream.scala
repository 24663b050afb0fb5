package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL adjacent character bigrams of a
  * string, in order, WITH multiplicity — the event stream a language
  * MODEL counts, where [[CharBigrams]] (distinct, first-appearance) is
  * the feature set a language CLASSIFIER matches. One pass, one output
  * slot per position; the HOF alternative (transform over a position
  * sequence with substring) re-walks the string per position — the
  * O(len²)-per-row trap the q49 kernel exists to avoid.
  *
  * Semantics: input with fewer than 2 CODE POINTS → empty array;
  * output length is exactly codePointCount−1. Bigrams are CODE-POINT
  * pairs (an astral character is one unit, never a split surrogate
  * pair) — the same slicing as Spark's `substring` and the DuckDB
  * oracle, so batch/stream/oracle agree on any unicode text, not just
  * the BMP (the round-14 advice divergence). Identical to the old
  * UTF-16 form on BMP text.
  *
  * Codegen emits a single static call to [[CharBigramStream.compute]]
  * so the surrounding stage stays in whole-stage codegen.
  */
case class CharBigramStream(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_bigram_stream"

  override def nullSafeEval(input: Any): Any =
    CharBigramStream.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharBigramStream$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): CharBigramStream = copy(child = newChild)
}

object CharBigramStream {
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val nCp = str.codePointCount(0, str.length)
    if (nCp < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nCp - 1)
    // one UTF-16 walk, two cursors: `start` trails one code point
    // behind `mid`; each bigram is the substring spanning two code
    // points (2-4 UTF-16 units)
    var start = 0
    var mid = Character.charCount(str.codePointAt(0))
    var i = 0
    while (i < nCp - 1) {
      val end = mid + Character.charCount(str.codePointAt(mid))
      out(i) = UTF8String.fromString(str.substring(start, end))
      start = mid; mid = end; i += 1
    }
    new GenericArrayData(out)
  }
}
