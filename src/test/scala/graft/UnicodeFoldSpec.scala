package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns.{accentFold, nfkcFold}

/** [[graft.expressions.UnicodeFold]] — the accent-fold / NFKC-fold
  * normalization kernel (q197). The accent arm's contract is "equals
  * DuckDB strip_accents on canonical text" (hash-enforced by q197's
  * oracle); here the arms are pinned on hand-verified cases including
  * the ones the oracle plant can't carry (NFKC compatibility forms,
  * astral text, nulls).
  */
class UnicodeFoldSpec extends SparkTestBase {
  import spark.implicits._

  private def foldAll(rows: Seq[(Long, String)], nfkc: Boolean): Map[Long, String] = {
    val c = if (nfkc) nfkcFold(col("text")) else accentFold(col("text"))
    rows.toDF("doc_id", "text").select($"doc_id", c.as("f"))
      .as[(Long, String)].collect().toMap
  }

  test("accent fold strips combining marks (precomposed AND decomposed input) " +
      "and leaves non-mark diacritics alone") {
    val cases = Seq(
      1L -> ("Café déjà vu", "Cafe deja vu"),      // precomposed Mn
      2L -> ("naïve façade", "naive facade"),          // combining Mn
      3L -> ("Łukasz Øre Ærø Đavid",
        "Łukasz Øre Ærø Đavid"),          // stroke/slash: NOT marks
      4L -> ("का", "क"),                            // devanagari Mc strips
      5L -> ("a⃝", "a"),                                      // enclosing Me strips
      6L -> ("ascii only 123", "ascii only 123"),                  // fast path
      7L -> ("", ""),
      8L -> ("😀 日本語", "😀 日本語")) // astral+CJK untouched
    val got = foldAll(cases.map { case (i, (in, _)) => (i, in) }, nfkc = false)
    cases.foreach { case (i, (_, want)) => assert(got(i) === want, s"case $i") }
  }

  test("accent fold recomposes unaffected sequences to NFC (decomposed " +
      "input without marks to strip still normalizes)") {
    // o + combining acute -> the mark strips; the output is plain 'o',
    // and a separately decomposed sequence that KEEPS its base letter
    // round-trips composed: here ambiguous-free — assert idempotence
    val once = foldAll(Seq(1L -> "ó écología"), nfkc = false)(1L)
    assert(once === "o ecologia")
    val twice = foldAll(Seq(1L -> once), nfkc = false)(1L)
    assert(twice === once, "fold must be idempotent")
  }

  test("nfkc fold additionally collapses compatibility forms " +
      "(ligatures, enclosed digits, full-width) before the accent strip") {
    val cases = Seq(
      1L -> ("ﬁt ①", "fit 1"),                           // fi ligature, circled 1
      2L -> ("ＡＢＣ", "ABC"),                         // full-width
      3L -> ("½", "1⁄2"),                                // vulgar half -> 1⁄2
      4L -> ("Caféﬁ", "Cafefi"),                         // compat + accent in one token
      5L -> (" ", " "))                                       // nbsp -> space under NFKC
    val got = foldAll(cases.map { case (i, (in, _)) => (i, in) }, nfkc = true)
    cases.foreach { case (i, (_, want)) => assert(got(i) === want, s"case $i") }
    // the accent-only arm must NOT touch compatibility forms — that is
    // exactly the oracle-able/non-oracle-able boundary
    val plain = foldAll(Seq(1L -> "ﬁt ①"), nfkc = false)(1L)
    assert(plain === "ﬁt ①")
  }

  test("null rides through, and the fold is a map-only stage") {
    val df = Seq((1L, Option("Café")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
      .select($"doc_id", accentFold($"text").as("f"))
    assert(df.as[(Long, Option[String])].collect().toMap ===
      Map(1L -> Some("Cafe"), 2L -> None))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fold must not shuffle:\n$plan")
  }

  test("SQL registration: accent_fold and nfkc_fold are callable " +
      "through the extensions surface") {
    graft.plans.GraftExtensions.install(spark)
    val got = spark.sql(
      "SELECT accent_fold('Café'), nfkc_fold('ﬁt')").head()
    assert(got.getString(0) === "Cafe")
    assert(got.getString(1) === "fit")
  }
}
