package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct adjacent character bigrams of a
  * string, in first-appearance order — the n-gram unit for language ID
  * (q49). One pass over the chars with an O(distinct) set, versus the
  * HOF composition (split → two slices → zip_with(concat) →
  * array_distinct) whose interpreted lambdas and per-element UTF8String
  * allocations were the dominant cost of the lang-ID pipeline. Same
  * (b)-tier escalation precedent as [[CosineSimilarity]] and
  * [[WinnowFingerprints]].
  *
  * Semantics match the HOF composition exactly (TextSpec asserts the
  * edge lengths): input with <2 CODE POINTS → empty array; duplicates
  * keep first appearance. Bigrams are CODE-POINT pairs (a `split("")`
  * regex never splits a surrogate pair, so the HOF formulation was
  * already code-point based; this kernel now matches it — and the
  * DuckDB oracle's slicing — on astral text too, the round-15
  * [[CharBigramStream]] fix applied to its sibling).
  *
  * Codegen emits a single static call to [[CharBigrams.compute]] so the
  * surrounding stage stays in whole-stage codegen.
  */
case class CharBigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_bigrams"

  override def nullSafeEval(input: Any): Any =
    CharBigrams.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharBigrams$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): CharBigrams =
    copy(child = newChild)
}

object CharBigrams {
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.codePointCount(0, str.length) < 2)
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    // two-cursor code-point walk (the CharBigramStream pattern): each
    // bigram spans two code points, 2-4 UTF-16 units
    var start = 0
    var mid = Character.charCount(str.codePointAt(0))
    while (mid < str.length) {
      val end = mid + Character.charCount(str.codePointAt(mid))
      seen.add(str.substring(start, end))
      start = mid; mid = end
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
