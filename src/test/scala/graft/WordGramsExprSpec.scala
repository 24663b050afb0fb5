package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns.{wordGramHashes, wordGrams}

/** The codegen'd word-n-gram kernels (`expressions/WordGrams.scala`)
  * must be byte-identical to the interpreted HOF forms they replaced
  * (round-21 optimization): `transform(sequence(0, size-n), i =>
  * concat_ws(" ", element_at...))` and its `xxhash64`-mapped shingle
  * variant, on every GUARDED input (size >= n; below that the HOF
  * emitted garbage grams that no call site ever evaluates — the
  * kernels return an empty array instead).
  */
class WordGramsExprSpec extends SparkTestBase {
  import spark.implicits._

  private def hof(t: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(0), size(t) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))

  private val texts = Seq(
    "the quick brown fox jumps",
    "a b",
    "single",
    "",                       // split -> [""]
    "double  space inside",   // empty token in the middle
    "trailing space ",        // empty token at the end
    "naïve café über—dash",   // non-ASCII
    "😀 astral 😁 pair", // surrogate pairs
    "x y x y x")              // repeated grams keep multiplicity

  test("wordGrams matches the HOF form for n=1..3 on guarded inputs") {
    val df = texts.toDF("text")
      .select(split($"text", " ").as("t"))
    for (n <- 1 to 3) {
      val g = df.filter(size($"t") >= n)
      val a = g.select(hof($"t", n).as("g")).collect().map(_.getSeq[String](0))
      val b = g.select(wordGrams($"t", n).as("g")).collect().map(_.getSeq[String](0))
      assert(a.toSeq === b.toSeq, s"n=$n")
    }
  }

  test("wordGramHashes matches transform+xxhash64 on guarded inputs") {
    val df = texts.toDF("text")
      .select(split($"text", " ").as("t"))
    for (n <- 1 to 3) {
      val g = df.filter(size($"t") >= n)
      val a = g.select(transform(hof($"t", n), s => xxhash64(s)).as("h"))
        .collect().map(_.getSeq[Long](0))
      val b = g.select(wordGramHashes($"t", n).as("h"))
        .collect().map(_.getSeq[Long](0))
      assert(a.toSeq === b.toSeq, s"n=$n")
    }
  }

  test("inputs shorter than n yield an empty array, and null rows stay null") {
    val df = Seq(Some("a b"), Some("a"), None).toDF("text")
      .select(split($"text", " ").as("t"))
    val out = df.select(wordGrams($"t", 3).as("g"), wordGramHashes($"t", 3).as("h"))
      .collect()
    assert(out(0).getSeq[String](0) === Nil && out(0).getSeq[Long](1) === Nil)
    assert(out(1).getSeq[String](0) === Nil && out(1).getSeq[Long](1) === Nil)
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("null array elements follow concat_ws semantics (skipped in the join)") {
    // arrays built with array() can hold nulls; concat_ws drops them
    val df = Seq(1).toDF("i")
      .select(array(lit("a"), lit(null).cast("string"), lit("b")).as("t"))
    val a = df.select(hof($"t", 2).as("g")).head().getSeq[String](0)
    val b = df.select(wordGrams($"t", 2).as("g")).head().getSeq[String](0)
    assert(a === b)
    assert(b === Seq("a", "b")) // "a"+skip and skip+"b"
  }
}
