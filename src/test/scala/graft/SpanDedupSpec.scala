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

  test("removeSpans is monotonic under overlapping/nested caller spans") {
    // dupSpans never emits overlaps, but removeSpans is public: a nested
    // span must not move the cursor backward and re-emit excised text.
    val d = docs(1L -> "abcdefghij")
    val spans = Seq((1L, 2L, 7L), (1L, 3L, 5L), (1L, 4L, 9L))
      .toDF("doc_id", "span_start", "span_end")
    val cleaned = ops.SpanDedup.removeSpans(d, spans)
      .select($"clean_text").as[String].head()
    // union of [2,7],[3,5],[4,9] = [2,9] -> keep chars 1 and 10
    assert(cleaned === "aj")
  }

  test("winnowed spans are sub-intervals of exact spans; long spans are found") {
    // Same deterministic random corpus class as the brute-force test:
    // 3-letter alphabet, so duplicated runs are everywhere and both the
    // winnow-selection and merge paths fire.
    val L = 5; val w = 3
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 30L).map(i =>
      i -> (0 until (20 + rnd.nextInt(50))).map(_ => "abc" (rnd.nextInt(3))).mkString)
    val d = docs(corpus: _*)
    val exact = ops.SpanDedup.dupSpans(d, gramLen = L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val winnowed = ops.SpanDedup.winnowedDupSpans(d, gramLen = L, window = w)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // (a) every winnowed span lies inside an exact span of the same doc:
    // a duplicated SELECTED gram is a duplicated gram
    winnowed.foreach { case (id, s, e, _) =>
      assert(exact.exists { case (xid, xs, xe, _) =>
        xid == id && xs <= s && e <= xe },
        s"winnowed span ($id,$s,$e) outside every exact span")
    }
    // (b) the PRECISE winnowing guarantee (Schleimer Thm. 1): every
    // maximal CROSS-DOC shared run of length >= L+w-1 contains a full
    // gram-hash window, whose min both docs select — so each side must
    // carry a winnowed span intersecting the run. (A merged exact SPAN
    // of that length is NOT guaranteed: it can be a composite of
    // shorter runs from different partners, each below the bound.)
    def sharedRuns(a: String, b: String, minLen: Int): Seq[(Int, Int)] = {
      val m = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) m(i)(j) = m(i - 1)(j - 1) + 1
      (for {
        i <- 1 to a.length; j <- 1 to b.length
        l = m(i)(j)
        if l >= minLen &&
          (i == a.length || j == b.length || a(i) != b(j))
      } yield (i - l + 1, i)).distinct
    }
    for {
      (ida, ta) <- corpus; (idb, tb) <- corpus if ida < idb
      (s, e) <- sharedRuns(ta, tb, L + w - 1)
    } assert(winnowed.exists { case (wid, ws, we, _) =>
        wid == ida && ws <= e.toLong && s.toLong <= we },
      s"shared run [$s,$e] of docs ($ida,$idb) missed in $ida")
  }

  test("winnowed dup gate survives supplementary-plane characters") {
    // An astral (non-BMP) char before a shared run: UTF-16 charAt
    // indexing would shift every later position by one and misalign the
    // literal-gram re-slice (the round-13 review finding). With the
    // code-point kernels, the run is still found and the spans align
    // with the exact (q100) path, whose positions were always
    // code-point substr semantics.
    val shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 chars
    val emoji = new String(Character.toChars(0x1F600)) // 1 code point, 2 UTF-16 units
    val d = docs(
      1L -> s"$emoji$shared tail one",
      2L -> s"prefix2 $shared tail two",
      3L -> "no overlap with anything else at all, plain filler text")
    val winnowed = ops.SpanDedup.winnowedDupSpans(d, gramLen = 24, window = 4)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(winnowed.exists(_._1 == 1L), "doc with astral prefix must flag")
    assert(winnowed.exists(_._1 == 2L))
    val exact = ops.SpanDedup.dupSpans(d, gramLen = 24)
      .select($"doc_id", $"span_start", $"span_end")
      .as[(Long, Long, Long)].collect().toSet
    // winnowed spans are sub-intervals of exact spans, in CODE POINTS
    winnowed.foreach { case (id, s0, e0) =>
      assert(exact.exists { case (i2, s2, e2) =>
        i2 == id && s2 <= s0 && e0 <= e2 }, s"($id,$s0,$e0) not within exact")
    }
  }

  test("q104 on the fixture: bounded within-doc spans, thinner stream than q100") {
    val out = ops.SpanDedup.q104WinnowedSpans(spark, "/root/testdata/sf0.001")
    val rows = out.as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty) // exact duplicate docs survive winnowed selection
    val lens = ops.Sources.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", length($"text").cast("long")).as[(Long, Long)]
      .collect().toMap
    rows.foreach { case (id, s, e, l) =>
      assert(s >= 1 && e <= lens(id) && l === e - s + 1 && l >= 24)
    }
    // guarantee check at (24, 8): a CROSS-DOC shared 31-char substring
    // contains exactly one full window of 8 gram hashes, whose min both
    // docs select — so every shared-31-gram occurrence must be covered
    // by a winnowed span intersecting its interval
    val docsArr = ops.Sources.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val gramDocs = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.Set[Long]]
    docsArr.foreach { case (id, t) =>
      (0 to t.length - 31).foreach { p =>
        gramDocs.getOrElseUpdate(t.substring(p, p + 31),
          scala.collection.mutable.Set.empty) += id
      }
    }
    val byDoc = rows.groupBy(_._1)
    var checked = 0
    docsArr.foreach { case (id, t) =>
      (0 to t.length - 31).foreach { p =>
        if (gramDocs(t.substring(p, p + 31)).size >= 2) {
          checked += 1
          assert(byDoc.getOrElse(id, Nil).exists { case (_, ws, we, _) =>
            ws <= p + 31L && p + 1L <= we },
            s"shared 31-gram of doc $id at ${p + 1} missed by winnowed spans")
        }
      }
    }
    assert(checked > 0) // the fixture does contain cross-doc shared runs
  }

  test("decontaminate flags only benchmark containment, never train-only repeats") {
    val shared = "the quick brown fox jumps over" // 30 chars
    val trainRun = "zebra yak xylophone walrus vole!" // 32 chars, train-only
    val train = Seq(
      (1L, s"A$shared tail."),          // contaminated: shares 30 chars w/ bench
      (2L, s"pre $trainRun mid $trainRun"), // repeats only within TRAIN
      (3L, s"also has $trainRun here."),    // shares with doc 2, NOT with bench
      (4L, "totally unrelated content, nothing shared anywhere at all."))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"benchmark question: $shared indeed."))
      .toDF("doc_id", "text")
    val got = ops.SpanDedup.decontaminate(train, bench, gramLen = 24)
      .select($"doc_id", $"n_spans", $"contaminated_chars")
      .as[(Long, Long, Long)].collect().toSet
    // only doc 1 is flagged: docs 2/3 share a run with EACH OTHER but
    // no gram with the benchmark — the containment gate, not dedup
    assert(got.map(_._1) === Set(1L))
    // both sides follow the planted run with a space, so the true
    // shared run is 31 chars — the gram pass finds the maximal run,
    // not the planted string (the SuffixDedupSpec hand-case lesson)
    assert(got === Set((1L, 1L, 31L)))
  }

  test("leakage report: per-bench attribution to the smallest id, zero rows kept") {
    val shared = "the quick brown fox jumps over the lazy dog" // 43 chars
    val train = Seq(
      (1L, s"A $shared tail."),
      (2L, s"B $shared other."),
      (3L, "totally unrelated content, nothing shared anywhere at all."))
      .toDF("doc_id", "text")
    // both leaked bench items cover the run INCLUDING the trailing
    // space (the char after "dog " differs everywhere: m/t/o/a), so
    // every train-shared gram exists in both and attributes to 100
    val bench = Seq(
      (100L, s"q1: $shared more?"),
      (101L, s"q2: $shared again"),
      (102L, "a clean benchmark question nobody has quoted anywhere yet"))
      .toDF("doc_id", "text")
    val got = ops.SpanDedup.leakageReport(train, bench, gramLen = 24)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(100L, 101L, 102L),
      "every benchmark item reports, leaked or not")
    val byId = got.map(r => r._1 -> (r._2, r._3)).toMap
    // grams shared between bench 100 and 101 attribute to min id 100,
    // so 101 keeps only hits on grams UNIQUE to it (none in train)
    assert(byId(100L)._1 === 2L, "both train docs leak bench 100")
    assert(byId(100L)._2 > 0L)
    assert(byId(101L) === ((0L, 0L)),
      "shared grams attributed to the smaller bench id")
    assert(byId(102L) === ((0L, 0L)), "clean item reports zero")
  }

  test("decontaminate matches a brute-force oracle on a random small corpus") {
    // same adversarial 3-letter alphabet as the dupSpans property test:
    // heavy gram collisions exercise the containment gate, islands
    // merge, and rollup together
    val L = 5
    val rnd = new scala.util.Random(11)
    def doc() = (0 until (20 + rnd.nextInt(60)))
      .map(_ => "abc" (rnd.nextInt(3))).mkString
    val trainRows = (0L until 30L).map(i => i -> doc())
    val benchRows = (100L until 104L).map(i => i -> doc())
    val benchGrams = benchRows.flatMap { case (_, t) =>
      (0 to t.length - L).map(p => t.substring(p, p + L)) }.toSet
    val expected = trainRows.flatMap { case (id, t) =>
      val hits = (0 to t.length - L).map(p => (p + 1, t.substring(p, p + L)))
        .filter(h => benchGrams(h._2))
        .map(h => (h._1.toLong, h._1.toLong + L - 1))
      if (hits.isEmpty) None
      else {
        val merged = hits.drop(1).foldLeft(Vector(hits.head)) { (acc, cur) =>
          val (s, e) = acc.last
          if (cur._1 <= e + 1) acc.init :+ ((s, math.max(e, cur._2)))
          else acc :+ cur
        }
        Some((id, merged.size.toLong, merged.map { case (s, e) => e - s + 1 }.sum))
      }
    }.sortBy(_._1)
    val got = ops.SpanDedup.decontaminate(
        docs(trainRows: _*), docs(benchRows: _*), gramLen = L)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty, "3-letter corpus must contaminate")
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
