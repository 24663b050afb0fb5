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
  * Semantics: <2-char input → empty array; output length is exactly
  * len−1. Chars are UTF-16 units — identical to code points on BMP
  * text (the DuckDB oracle slices code points, so parity holds for
  * ASCII/BMP corpora, as with [[CharBigrams]]).
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
    val n = str.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.fromString(str.substring(i, i + 2)); i += 1
    }
    new GenericArrayData(out)
  }
}
