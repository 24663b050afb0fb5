package graft

import org.apache.spark.sql.functions._

/** Join-family unit tests (SURVEY §2.3) on literal edge cases: null
  * keys, duplicate keys, empty sides, and as-of semantics.
  */
class JoinsSpec extends SparkTestBase {
  import spark.implicits._

  private val left = Seq(
    (1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "l")
  private val right = Seq(
    (1L, "x"), (1L, "y"), (4L, "z")).toDF("id", "r")

  test("inner join multiplies duplicate keys") {
    val j = left.join(right, "id")
    assert(j.count() === 2) // id=1 matches twice, 2/3 unmatched
  }

  test("left outer keeps unmatched rows with nulls") {
    val j = left.join(right, Seq("id"), "left")
    assert(j.count() === 4)
    assert(j.filter($"r".isNull).select($"id").as[Long].collect().sorted === Array(2L, 3L))
  }

  test("full outer covers both unmatched sides") {
    val j = left.join(right, Seq("id"), "full")
    assert(j.count() === 5) // 2 matches + ids 2,3 left-only + id 4 right-only
  }

  test("null keys never match (SQL three-valued equality)") {
    val l = Seq((Some(1L), "a"), (None, "b")).toDF("id", "l")
    val r = Seq((Some(1L), "x"), (None, "y")).toDF("id", "r")
    assert(l.join(r, l("id") === r("id")).count() === 1)
  }

  test("semi returns at most one row per left row; anti is its complement") {
    val semi = left.join(right, Seq("id"), "left_semi")
    val anti = left.join(right, Seq("id"), "left_anti")
    assert(semi.as[(Long, String)].collect().map(_._1).toSeq === Seq(1L))
    assert(anti.count() === 2)
    assert(semi.count() + anti.count() === left.count())
  }

  test("join against an empty side") {
    val empty = Seq.empty[(Long, String)].toDF("id", "r")
    assert(left.join(empty, Seq("id"), "inner").count() === 0)
    assert(left.join(empty, Seq("id"), "left").count() === 3)
  }

  test("as-of join picks the latest at-or-before row, inclusive on ties") {
    // user 1: views at t=10 (v=1.0) and t=20 (v=2.0); clicks at t=15, t=20, t=5.
    // Expected: click@15 -> 1.0 (view@10), click@20 -> 2.0 (same-instant
    // view is visible), click@5 -> null (no prior view).
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (100L, ts(10), 1L, "view", 1.0, "{}"),
      (101L, ts(20), 1L, "view", 2.0, "{}"),
      (102L, ts(15), 1L, "click", 9.0, "{}"),
      (103L, ts(20), 1L, "click", 9.0, "{}"),
      (104L, ts(5), 1L, "click", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // exercise the REAL operator core (not a hand copy of its plan)
    val out = ops.Joins.asOfLastView(ev)
      .select($"event_id", $"last_view_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(102L) === Some(1.0))
    assert(out(103L) === Some(2.0))
    assert(out(104L) === None)
  }

  test("as-of tie rule: among views sharing (user_id, ts) the max event_id wins") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (100L, ts(10), 1L, "view", 1.0, "{}"),
      (105L, ts(10), 1L, "view", 7.0, "{}"),  // same instant, higher id
      (102L, ts(15), 1L, "click", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = ops.Joins.asOfLastView(ev)
      .select($"event_id", $"last_view_value")
      .as[(Long, Option[Double])].collect().toMap
    assert(out(102L) === Some(7.0))
  }

  test("band join assigns every order to exactly one band") {
    val n = ops.Sources.orders(spark, "/root/testdata/sf0.001").count()
    val banded = ops.Joins.q17BandJoin(spark, "/root/testdata/sf0.001")
      .agg(sum($"n")).head().getLong(0)
    assert(banded === n)
  }

  test("explicit broadcast survives into the physical plan") {
    val plan = ops.Joins.q14JoinStar(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("bloom semi-join equals the plain semi-join on random key sets (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.zip(
      Gen.listOfN(200, Gen.choose(0L, 300L)), // fact keys, with duplicates
      Gen.listOfN(12, Gen.choose(0L, 300L)))  // dim keys, overlapping range
    val cases = (0 until 6).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.nonEmpty)
    cases.foreach { case (factKeys, dimKeys) =>
      val fact = factKeys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("fk", "rowid")
      val dim = dimKeys.toDF("dk")
      val out = ops.Joins.bloomSemiJoin(fact, dim, "fk", "dk",
        expectedItems = dimKeys.size.toLong.max(1L))
        .as[(Long, Long)].collect().toSet
      val expected = fact.join(dim, $"fk" === $"dk", "left_semi")
        .as[(Long, Long)].collect().toSet
      assert(out === expected, s"dimKeys=$dimKeys")
    }
  }

  test("bloom semi-join: exact result, and the prefilter actually prunes") {
    val fact = (0L until 2000L).map(k => (k, s"row$k")).toDF("fk", "payload")
    val dim = Seq(3L, 7L, 1999L, 500L).toDF("dk")
    val out = ops.Joins.bloomSemiJoin(fact, dim, "fk", "dk", expectedItems = 10L)
    // exactness: equals the plain semi-join (bloom has no false negatives;
    // the exact join scrubs false positives)
    val expected = fact.join(dim, $"fk" === $"dk", "left_semi")
      .as[(Long, String)].collect().toSet
    assert(out.as[(Long, String)].collect().toSet === expected)
    assert(expected.map(_._1) === Set(3L, 7L, 1999L, 500L))
    // pruning: the bloom prefilter alone (before the exact join) must
    // drop the vast majority of the 2000 fact rows at 1% fpp
    val bf = dim.stat.bloomFilter("dk", 10L, 0.01)
    val candidates = fact.as[(Long, String)].collect()
      .count { case (k, _) => bf.mightContain(k) }
    assert(candidates < 100, s"bloom kept $candidates of 2000 rows")
  }

  test("binned band join equals the direct inequality join") {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    val binned = ops.Joins.q67BinnedBandJoin(spark, dir)
      .as[(String, Long, Double)].collect().toSet
    val bands = Seq(
      ("b1_micro", 0.0, 40000.0), ("b2_small", 40000.0, 95000.0),
      ("b3_mid", 95000.0, 180000.0), ("b4_large", 180000.0, 320000.0),
      ("b5_jumbo", 320000.0, 2000000.0)).toDF("band", "lo", "hi")
    val direct = ops.Sources.orders(spark, dir)
      .join(broadcast(bands), $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"band")
      .agg(count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast("decimal(12,2)")), 2)
          .cast("double").as("band_total"))
      .as[(String, Long, Double)].collect().toSet
    assert(binned === direct)
    // every order lands in exactly one band (disjoint, full coverage)
    assert(binned.toSeq.map(_._2).sum ===
      ops.Sources.orders(spark, dir).count())
  }

  test("binned band join plans a hash join on the bin key, not a nested loop") {
    val plan = ops.Joins.q67BinnedBandJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the fact-side join must be an equi hash join keyed on the bin;
    // the single allowed nested loop is the 5-row bands x 1-row
    // max-bound cross that prepares the broadcast side. The bin key's
    // POSITION in the printed key list is not pinned: the rewrite adds
    // a second equi key (graft_band_bin) and their order flips with
    // expression-id allocation (suite-order dependent — the round-19
    // full run printed [graft_band_bin_f#.., bin#..] where isolation
    // printed [bin#.., ..]), so match the key anywhere in the list
    assert("BroadcastHashJoin \\[(?:[^\\]]*, )?bin#".r
        .findFirstIn(plan).isDefined,
      s"bin must be an equi key of a broadcast hash join:\n$plan")
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 <= 1)
  }

  /** Independent local edit-distance oracle (classic DP). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val sub = d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), sub)
    }
    d(a.length)(b.length)
  }

  private val fuzzyDirty = Seq("NATON_3", "NATIION_7", "XATION_21",
    "NATION_2Q", "NTION_19", "XQZV")

  test("fuzzy join returns exactly the pairs a local DP oracle finds") {
    val got = ops.Joins.q84FuzzyJoin(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val nations = ops.Sources.nation(spark, "/root/testdata/sf0.001")
      .select("n_name").collect().map(_.getString(0)).toSeq
    val want = (for {
      d <- fuzzyDirty; n <- nations
      dist = lev(d, n) if dist <= 2
    } yield (d, n, dist.toLong)).toSet
    assert(got === want)
    assert(got.nonEmpty && !got.exists(_._1 == "XQZV"))
    // every misspelling except the decoy found at least one nation
    assert(got.map(_._1) === fuzzyDirty.filterNot(_ == "XQZV").toSet)
  }

  test("length-band prefilter is a sound lower bound: never drops a match") {
    import spark.implicits._
    val dirty = fuzzyDirty.toDF("dirty")
    val nations = ops.Sources.nation(spark, "/root/testdata/sf0.001")
      .select($"n_name")
    def pairs(withPrefilter: Boolean) = {
      val cond = if (withPrefilter)
        abs(length($"dirty") - length($"n_name")) <= 2 &&
          levenshtein($"dirty", $"n_name") <= 2
      else levenshtein($"dirty", $"n_name") <= 2
      nations.join(broadcast(dirty), cond)
        .select($"dirty", $"n_name")
        .as[(String, String)].collect().toSet
    }
    val p = pairs(withPrefilter = true)
    assert(p.nonEmpty && p === pairs(withPrefilter = false))
  }

  test("blocked fuzzy join equals brute force on random corpora (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // small alphabet forces collisions, near-misses, and length spreads;
    // lengths 0..12 cover the empty string and sub-segment-length strings
    val strGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpusGen = Gen.choose(10, 40).flatMap(n => Gen.listOfN(n, strGen))
    (0 until 4).foreach { i =>
      val d = 1 + (i % 3)
      val ls = corpusGen.apply(Gen.Parameters.default, Seed(900L + i)).get
      val rs = corpusGen.apply(Gen.Parameters.default, Seed(950L + i)).get
      val left = ls.zipWithIndex.map { case (s, j) => (j.toLong, s) }.toDF("lid", "ls")
      val right = rs.zipWithIndex.map { case (s, j) => (j.toLong, s) }.toDF("rid", "rs")
      val got = ops.Joins.fuzzyJoinBlocked(left, "lid", "ls", right, "rid", "rs", d)
        .select($"lid", $"rid", $"dist").as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (l, li) <- ls.zipWithIndex; (r, ri) <- rs.zipWithIndex
        dist = lev(l, r) if dist <= d
      } yield (li.toLong, ri.toLong, dist.toLong)).toSet
      assert(got === want, s"case $i d=$d: blocking must be an exact pigeonhole")
      assert(want.nonEmpty, s"case $i d=$d: vacuous corpus")
    }
  }

  test("blocked fuzzy join never broadcasts either full side") {
    // the scale claim: with broadcast off (as it would be for two
    // 100M-row feeds) the candidate join is a KEYED join on the block
    // struct — never a nested loop over either side
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    val left = (0L until 500L).map(i => (i, s"name_${i % 97}_x")).toDF("lid", "ls")
    val right = (0L until 500L).map(i => (i, s"name_${i % 89}_y")).toDF("rid", "rs")
    val out = ops.Joins.fuzzyJoinBlocked(left, "lid", "ls", right, "rid", "rs", 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join must not plan a nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"candidate join must be a keyed shuffle join:\n$plan")
    assert(out.count() > 0)
  }

  test("fuzzy join auto-orients: result AND candidate volume are side-order invariant") {
    import spark.implicits._
    // asymmetric feeds: 8 dirty rows vs a 400-row corpus — the probe
    // fan-out is ~13x the index fan-out at d=2, so orientation matters
    val small = Seq("name_3_x", "nam_3_x", "name_41_", "ame_17_x",
      "name_5_xq", "nme_29_x", "zzzzzzzz", "name_7_x")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("lid", "ls")
    val big = (0L until 400L).map(i => (i, s"name_${i % 97}_x")).toDF("rid", "rs")
    // the decision itself: whichever call order, the big side indexes
    assert(ops.Joins.fuzzySwapSides(big, small),
      "big-as-left must swap so the small side probes")
    assert(!ops.Joins.fuzzySwapSides(small, big),
      "small-as-left must keep caller orientation")
    // candidate volume: small-probe is the cheap orientation (sanity
    // check that the decision optimizes the right quantity)
    val candSmallProbe = ops.Joins.fuzzyCandidates(small, "ls", big, "rs", 2).count()
    val candBigProbe = ops.Joins.fuzzyCandidates(big, "rs", small, "ls", 2).count()
    assert(candSmallProbe < candBigProbe,
      s"small-probe must generate fewer candidates ($candSmallProbe vs $candBigProbe)")
    // end-to-end: both call orders return the identical pair set
    val ab = ops.Joins.fuzzyJoinBlocked(small, "lid", "ls", big, "rid", "rs", 2)
      .select($"lid", $"rid", $"dist").as[(Long, Long, Long)].collect().toSet
    val ba = ops.Joins.fuzzyJoinBlocked(big, "rid", "rs", small, "lid", "ls", 2)
      .select($"lid", $"rid", $"dist").as[(Long, Long, Long)].collect().toSet
    assert(ab === ba, "pair set must be side-order invariant")
    assert(ab.nonEmpty, "vacuous fixture")
  }
}
