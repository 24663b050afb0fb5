package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns.winnowFingerprints

/** Tests for the custom codegen'd winnowing expression
  * ([[graft.expressions.WinnowFingerprints]]) — equivalence with a
  * plain-Scala reference implementation, codegen participation, and
  * edge cases.
  */
class WinnowExprSpec extends SparkTestBase {
  import spark.implicits._

  /** Straight-line reference: fold-hash every k-gram, min per w-window,
    * distinct, sorted — no rolling optimization, so a bug in the
    * expression's rolling update cannot hide in a shared kernel.
    */
  private def reference(text: String, k: Int, w: Int): Seq[Long] = {
    if (text.length < k + w - 1) return Seq.empty
    val gh = text.sliding(k).map(
      _.foldLeft(0L)((acc, c) => (acc * 131L + c.toLong) % 2147483647L)).toArray
    gh.sliding(w).map(_.min).toSet.toSeq.sorted
  }

  test("expression matches the reference fold on random ASCII strings") {
    val rnd = new scala.util.Random(3)
    val cases = (0 until 100).map { i =>
      val len = rnd.nextInt(60)
      (i.toLong, (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    val got = cases.toDF("id", "text")
      .select($"id", winnowFingerprints($"text", 4, 3).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    cases.foreach { case (id, text) =>
      assert(got(id) === reference(text, 4, 3), s"mismatch for '$text'")
    }
  }

  test("w=1 selects every gram hash including gram 0 (degenerate window)") {
    val rnd = new scala.util.Random(5)
    val cases = (0 until 30).map { i =>
      (i.toLong, (0 until 4 + rnd.nextInt(20)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    }
    val got = cases.toDF("id", "text")
      .select($"id", winnowFingerprints($"text", 4, 1).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    cases.foreach { case (id, text) =>
      assert(got(id) === reference(text, 4, 1), s"w=1 mismatch for '$text'")
    }
  }

  test("invalid k or w is rejected at construction") {
    intercept[IllegalArgumentException] {
      graft.expressions.WinnowFingerprints(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 4, 0)
    }
    intercept[IllegalArgumentException] {
      graft.expressions.WinnowFingerprints(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), 0, 3)
    }
  }

  test("strings shorter than k+w-1 yield an empty array, null stays null") {
    val out = Seq((1L, "short"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
      .select($"id", winnowFingerprints($"text", 8, 4).as("fps"))
      .collect()
    assert(out.find(_.getLong(0) == 1L).get.getSeq[Long](1).isEmpty)
    assert(out.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("output is sorted ascending and duplicate-free") {
    val fps = Seq(Tuple1("abcabcabcabcabcabc")).toDF("text")
      .select(winnowFingerprints($"text", 4, 3).as("fps"))
      .as[Seq[Long]].head()
    assert(fps === fps.distinct.sorted)
  }

  /** Positional reference for [[graft.expressions.WinnowedGramMins]]:
    * leftmost min per window, distinct (pos, hash) pairs sorted by pos,
    * 1-based positions.
    */
  private def positionalReference(text: String, k: Int, w: Int): Seq[(Long, Long)] = {
    if (text.length < k + w - 1) return Seq.empty
    val gh = text.sliding(k).map(
      _.foldLeft(0L)((acc, c) => (acc * 131L + c.toLong) % 2147483647L)).toArray
    (0 to gh.length - w).map { j =>
      val win = gh.slice(j, j + w)
      val off = win.indexOf(win.min)
      ((j + off + 1).toLong, win.min)
    }.distinct.sortBy(_._1)
  }

  test("positional winnowing matches the reference on random ASCII strings") {
    import org.apache.spark.sql.graftshim.GraftColumns.winnowedGramMins
    val rnd = new scala.util.Random(9)
    val cases = (0 until 100).map { i =>
      val len = rnd.nextInt(60)
      (i.toLong, (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString)
    }
    val got = cases.toDF("id", "text")
      .select($"id", winnowedGramMins($"text", 4, 3).as("s"))
      .as[(Long, Seq[(Long, Long)])].collect().toMap
    cases.foreach { case (id, text) =>
      assert(got(id) === positionalReference(text, 4, 3), s"mismatch for '$text'")
    }
  }

  test("positional winnowing selects the LEFTMOST position on hash ties") {
    import org.apache.spark.sql.graftshim.GraftColumns.winnowedGramMins
    // "aaaa...": every gram hashes identically, so every window is an
    // all-tie — the selected position must be each window's FIRST gram
    // (matching DuckDB's list_position first-match semantics).
    val sel = Seq(Tuple1("aaaaaaaaaa")).toDF("text")
      .select(winnowedGramMins($"text", 4, 3).as("s"))
      .as[Seq[(Long, Long)]].head()
    assert(sel.map(_._1) === (1L to 5L)) // windows start at grams 1..5
  }

  test("positional fingerprint VALUES agree with WinnowFingerprints") {
    import org.apache.spark.sql.graftshim.GraftColumns.winnowedGramMins
    val text = "the quick brown fox jumps over the lazy dog"
    val row = Seq(Tuple1(text)).toDF("text")
      .select(winnowFingerprints($"text", 8, 4).as("fps"),
        winnowedGramMins($"text", 8, 4).as("s"))
      .as[(Seq[Long], Seq[(Long, Long)])].head()
    assert(row._2.map(_._2).distinct.sorted === row._1)
  }

  test("the projection stays inside whole-stage codegen") {
    // spark.range is a codegen'd source (a 1-row local relation never
    // enters codegen, proving nothing either way)
    val df = spark.range(4)
      .select(winnowFingerprints(
        concat(lit("the quick brown fox jumps over the lazy dog "),
          $"id".cast("string")), 8, 4).as("fps"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in simpleString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect().forall(_.getSeq[Long](0).nonEmpty))
  }
}
