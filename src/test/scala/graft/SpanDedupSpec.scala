package graft

import org.apache.spark.sql.functions._

/** Exact cross-document substring dedup (span removal) — ops.SpanDedup. */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("dupSpans flags only cross-doc repeats and merges overlapping hits") {
    // L=4: "ABCDEF" is shared by docs 1 and 2 -> grams ABCD/BCDE/CDEF all
    // duplicated, overlapping hits must merge into ONE [s,e] span per doc.
    // Doc 3 has no 4-gram in common with anyone.
    val d = docs(
      1L -> "xxABCDEFyy",
      2L -> "ABCDEFzzzz",
      3L -> "qrstuvwxyz")
    val spans = ops.SpanDedup.dupSpans(d, gramLen = 4)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans === Seq((1L, 3L, 8L, 6L), (2L, 1L, 6L, 6L)))
  }

  test("adjacent (non-overlapping) hits merge into one contiguous span") {
    // Two duplicated 3-grams sit back-to-back in doc 1 ("AAA" at 1, "BBB"
    // at 4) but come from DIFFERENT partners — adjacency still merges.
    val d = docs(
      1L -> "AAABBBc",
      2L -> "AAAzzzz",
      3L -> "yBBBzzz")
    val spans = ops.SpanDedup.dupSpans(d, gramLen = 3)
      .filter($"doc_id" === 1L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(spans === Seq((1L, 1L, 6L, 6L)))
  }

  test("within-doc repeats alone do not trigger; short docs contribute nothing") {
    val d = docs(
      1L -> "ABABABABAB", // self-repetitive, but unique to doc 1
      2L -> "zzzzzzzzzz",
      3L -> "AB")         // shorter than gramLen: no grams, no crash
    val spans = ops.SpanDedup.dupSpans(d, gramLen = 4)
    assert(spans.count() === 0)
  }

  test("dupSpans matches a brute-force oracle on a random small corpus") {
    // Deterministic pseudo-random corpus over a 3-letter alphabet (high
    // collision rate, so all code paths fire). Oracle: literal definition
    // computed in driver Scala.
    val L = 5
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 40L).map(i =>
      i -> (0 until (20 + rnd.nextInt(60))).map(_ => "abc" (rnd.nextInt(3))).mkString)
    val expected = {
      val grams = corpus.flatMap { case (id, t) =>
        (0 to t.length - L).map(p => (id, p + 1, t.substring(p, p + L))) }
      val dup = grams.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
      grams.filter(g => dup(g._3))
        .groupBy(_._1).toSeq.flatMap { case (id, hs) =>
          // interval merge with adjacency
          val sorted = hs.map(h => (h._2.toLong, h._2.toLong + L - 1)).sortBy(_._1)
          sorted.drop(1).foldLeft(Vector(sorted.head)) { (acc, cur) =>
            val (s, e) = acc.last
            if (cur._1 <= e + 1) acc.init :+ ((s, math.max(e, cur._2)))
            else acc :+ cur
          }.map { case (s, e) => (id, s, e, e - s + 1) }
        }.sortBy(t => (t._1, t._2))
    }
    val got = ops.SpanDedup.dupSpans(docs(corpus: _*), gramLen = L)
      .orderBy("doc_id", "span_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
  }

  test("removeSpans excises exactly the flagged ranges and keeps clean docs") {
    val d = docs(
      1L -> "xxABCDEFyy",
      2L -> "ABCDEFzzzz",
      3L -> "qrstuvwxyz")
    val spans = ops.SpanDedup.dupSpans(d, gramLen = 4)
    val cleaned = ops.SpanDedup.removeSpans(d, spans)
      .select($"doc_id", $"clean_text")
      .as[(Long, String)].collect().toMap
    assert(cleaned === Map(1L -> "xxyy", 2L -> "zzzz", 3L -> "qrstuvwxyz"))
  }

  test("removeSpans handles multi-span docs, doc-prefix and doc-suffix spans") {
    // doc 1 shares its PREFIX with doc 2 and its SUFFIX with doc 3, with a
    // unique middle — two spans, removal keeps only the middle.
    val d = docs(
      1L -> "HEADER10uniq2FOOTER9",
      2L -> "HEADER10zzzzzzzz",
      3L -> "wwwwwwwwwFOOTER9")
    val spans = ops.SpanDedup.dupSpans(d, gramLen = 6)
    val cleaned = ops.SpanDedup.removeSpans(d, spans)
      .filter($"doc_id" === 1L)
      .select($"clean_text").as[String].head()
    assert(cleaned === "uniq2")
  }

  test("q100 runs on the real fixture: bounded, sorted, within-doc spans") {
    val out = ops.SpanDedup.q100SubstringDedup(spark, "/root/testdata/sf0.001")
    val rows = out.as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty) // the fixture contains exact duplicate docs
    val lens = ops.Sources.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", length($"text").cast("long")).as[(Long, Long)]
      .collect().toMap
    rows.foreach { case (id, s, e, l) =>
      assert(s >= 1 && e <= lens(id) && l === e - s + 1 && l >= 24)
    }
    // spans within one doc are disjoint and non-adjacent (maximal merge)
    rows.groupBy(_._1).values.foreach { sp =>
      sp.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1)
        case _ =>
      }
    }
  }
}
