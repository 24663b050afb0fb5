package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Sketches

/** Misra–Gries heavy-hitters sketch (q78, sketch family alongside
  * HLL/GK). Pins the three deterministic guarantees — estimate ≤ true,
  * undercount ≤ n/k, every item with true count > n/k survives — over
  * randomized skewed streams and partitionings, plus the exact-regime
  * degenerate case and the oracled query's booleans end-to-end.
  *
  * Deterministic: seeded ScalaCheck generators, no forAll (same style
  * as BandJoinPropertySpec/SamplingSpec).
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private def sketchOf(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("t").repartition(parts).as[String]
      .select(new Sketches.MisraGries(k).toColumn)
      .head().m

  test("sketch is exact when k exceeds the distinct count") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val got = sketchOf(new scala.util.Random(7).shuffle(items), k = 16, parts = 5)
    assert(got === Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
  }

  test("MG guarantees hold on randomized skewed streams across partitionings") {
    // Geometric-ish skew over a 30-token alphabet: token i has weight
    // ~0.8^i, so a handful of true heavy hitters emerge per stream.
    val tokenGen: Gen[String] = Gen.frequency(
      (0 until 30).map(i => (math.max(1, (1000 * math.pow(0.8, i)).toInt),
        Gen.const(s"t$i"))): _*)
    val caseGen = for {
      n <- Gen.choose(50, 1500)
      k <- Gen.choose(2, 16)
      parts <- Gen.oneOf(1, 3, 8)
      items <- Gen.listOfN(n, tokenGen)
    } yield (items, k, parts)
    val cases = (0 until 10).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(4200L + i)))
    assert(cases.size === 10)
    cases.foreach { case (items, k, parts) =>
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val got = sketchOf(items, k, parts)
      val label = s"(n=$n k=$k parts=$parts)"
      assert(got.size <= k - 1, s"state bound violated $label")
      got.foreach { case (t, est) =>
        val truth = exact.getOrElse(t, 0L)
        assert(est <= truth, s"overcount for $t $label: $est > $truth")
        assert((truth - est) * k <= n,
          s"undercount beyond n/k for $t $label: $truth - $est")
      }
      exact.foreach { case (t, c) =>
        if (c * k > n)
          assert(got.contains(t), s"true heavy hitter $t (cnt=$c) missing $label")
      }
    }
  }

  test("grouped sketches: one independent heavy-hitter summary per key") {
    val rows = Seq("en" -> "a", "en" -> "a", "en" -> "b",
      "de" -> "x", "de" -> "y", "de" -> "y", "de" -> "y")
    // k > per-group distincts makes each group's sketch exact and
    // order-independent
    val got = rows.toDF("lang", "token").repartition(5)
      .groupBy($"lang")
      .agg(Sketches.misraGries(8)($"token").as("s"))
      .select($"lang", $"s.m")
      .as[(String, Map[String, Long])].collect().toMap
    assert(got("en") === Map("a" -> 2L, "b" -> 1L))
    assert(got("de") === Map("x" -> 1L, "y" -> 3L))
  }

  test("sketch aggregation is two-phase: map-side partial, buffer-only exchange") {
    val plan = Seq("a", "b").toDF("t")
      .agg(Sketches.misraGries(8)($"t"))
      .queryExecution.executedPlan.toString
    // partial_misragries below the exchange = each task reduces its rows
    // into one <=(k-1)-entry buffer before any data moves; the exchange
    // carries only those buffers (the mergeable-summaries shape)
    assert(plan.contains("partial_misragries"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("streaming trending tokens merges the sketch across micro-batches") {
    import java.sql.Timestamp
    implicit val sql = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, String)]
    val q = Sketches.trendingTokensStream(
        input.toDF().toDF("ts", "text"), k = 10)
      .writeStream.format("memory").queryName("trending")
      .outputMode("append").start()
    try {
      // two micro-batches land in the SAME 10:00 window — the state
      // store must carry batch 1's buffer into batch 2's merge
      input.addData((Timestamp.valueOf("2024-01-01 10:05:00"), "a a a b"))
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-01 10:40:00"), "a c c"))
      q.processAllAvailable()
      assert(spark.table("trending").count() === 0) // window still open
      // an 11:20 event moves the watermark past 11:00 → window closes
      input.addData((Timestamp.valueOf("2024-01-01 11:20:00"), "d d"))
      q.processAllAvailable()
      val rows = spark.table("trending")
        .select($"window_start".cast("string"), $"top_tokens")
        .as[(String, Map[String, Long])].collect().toMap
      // k=10 exceeds the window's 3 distinct tokens, so the merged
      // sketch is EXACT across batches — order-independent assertion
      assert(rows("2024-01-01 10:00:00") === Map("a" -> 4L, "b" -> 1L, "c" -> 2L))
    } finally q.stop()
  }

  test("q78 guarantee booleans hold end-to-end and heavy hitters exist at sf0.001") {
    val row = Sketches.q78HeavyHitters(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_tokens") > 0L)
    // Non-vacuous: the corpus has stopword-class tokens above n/64.
    assert(row.getAs[Long]("n_heavy") > 0L)
    assert(row.getAs[Boolean]("all_heavy_present"))
    assert(row.getAs[Boolean]("est_within_eps"))
  }

  // --- Count-Min ----------------------------------------------------------

  private def cmsTable(items: Seq[String], d: Int, w: Int, parts: Int): Array[Long] =
    items.toDF("t").repartition(parts).as[String]
      .select(new Sketches.CountMin(d, w).toColumn)
      .head().t

  test("CMS never undercounts; exact for a small alphabet in a wide table") {
    val items = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val t = cmsTable(new scala.util.Random(7).shuffle(items), d = 4,
      w = 4096, parts = 5)
    // 3 items in 4096 slots: no collisions under the fixed seeds, so
    // the min-over-rows estimate is exact (deterministic assertion)
    assert(Sketches.cmsEstimate(t, "a", 4, 4096) === 40L)
    assert(Sketches.cmsEstimate(t, "b", 4, 4096) === 25L)
    assert(Sketches.cmsEstimate(t, "c", 4, 4096) === 3L)
    // a never-seen item can only over-estimate, and here it's clean
    assert(Sketches.cmsEstimate(t, "zz", 4, 4096) === 0L)
  }

  test("CMS estimates are partition-invariant (elementwise-add merge)") {
    val rnd = new scala.util.Random(11)
    val items = Seq.fill(800)(s"t${rnd.nextInt(50)}")
    val tables = Seq(1, 3, 8).map(p => cmsTable(items, d = 5, w = 64, parts = p))
    assert(tables(0).toSeq === tables(1).toSeq)
    assert(tables(1).toSeq === tables(2).toSeq)
  }

  test("CMS guarantees hold on randomized skewed streams: est>=true, eps overcount") {
    val tokenGen: Gen[String] = Gen.frequency(
      (0 until 200).map(i => (math.max(1, (1000 * math.pow(0.95, i)).toInt),
        Gen.const(s"t$i"))): _*)
    val caseGen = for {
      n <- Gen.choose(500, 3000)
      items <- Gen.listOfN(n, tokenGen)
    } yield items
    val d = 4; val w = 256
    val eps = math.E / w
    val delta = math.exp(-d.toDouble)
    val cases = (0 until 5).flatMap(i =>
      caseGen.apply(Gen.Parameters.default, Seed(777L + i)))
    assert(cases.size === 5)
    cases.foreach { items =>
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val t = cmsTable(items, d, w, parts = 4)
      var violations = 0
      exact.foreach { case (tok, truth) =>
        val est = Sketches.cmsEstimate(t, tok, d, w)
        assert(est >= truth, s"CMS undercounted $tok: $est < $truth")
        if (est - truth > eps * n) violations += 1
      }
      assert(violations <= math.max(1.0, 2 * delta * exact.size),
        s"eps-overcount violations $violations of ${exact.size} (n=$n)")
    }
  }

  test("CMS aggregation is two-phase: map-side partial, buffer-only exchange") {
    val plan = Seq("a", "b").toDF("t")
      .agg(Sketches.countMin(4, 64)($"t"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_countmin"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("q106 CMS bounds booleans hold end-to-end at sf0.001") {
    val row = Sketches.q106CmsBounds(spark, "/root/testdata/sf0.001").head()
    assert(row.getAs[Long]("n_tokens") > 0L)
    assert(row.getAs[Long]("n_distinct") > 0L)
    assert(row.getAs[Boolean]("est_ge_true"))
    assert(row.getAs[Boolean]("overcount_rate_ok"))
  }
}
