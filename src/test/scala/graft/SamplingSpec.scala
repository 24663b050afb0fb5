package graft

import org.apache.spark.sql.functions.{lit, when}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for sampling (SURVEY §2.2 P5/P6, §5.2). ScalaCheck
  * generators drive the cases with a pinned seed (the scalatest-plus
  * bridge artifact is not in the offline cache, so cases are drawn
  * explicitly rather than via forAll).
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(sizes: Map[String, Int]) =
    sizes.toSeq.flatMap { case (l, n) => (0 until n).map(i => (l, s"$l-$i")) }
      .toDF("label", "id")

  test("stratified sample returns exactly min(k, group size) rows per class") {
    val gen = Gen.zip(
      Gen.mapOfN(3, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(1, 30))),
      Gen.choose(1, 15))
    val cases = (0 until 8).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.nonEmpty)
    cases.filter(_._1.nonEmpty).foreach { case (sizes, k) =>
      val df = corpus(sizes)
      val out = util.Sampling.stratifiedExactSample(df, "label", k, 7L)
      val counts = out.groupBy("label").count().as[(String, Long)].collect().toMap
      sizes.foreach { case (l, n) =>
        assert(counts.getOrElse(l, 0L) === math.min(n, k).toLong,
          s"sizes=$sizes k=$k label=$l")
      }
    }
  }

  test("stratified sample is a subset of the input and seed-deterministic") {
    val df = corpus(Map("a" -> 20, "b" -> 5))
    val s1 = util.Sampling.stratifiedExactSample(df, "label", 3, 11L)
      .as[(String, String)].collect().toSet
    val s2 = util.Sampling.stratifiedExactSample(df, "label", 3, 11L)
      .as[(String, String)].collect().toSet
    val all = df.as[(String, String)].collect().toSet
    assert(s1 === s2)
    assert(s1.subsetOf(all))
  }

  test("balanceToMinClass equalizes every class to the global minimum") {
    val df = corpus(Map("a" -> 17, "b" -> 4, "c" -> 9))
    val out = util.Sampling.balanceToMinClass(df, "label", 5L)
    val counts = out.groupBy("label").count().as[(String, Long)].collect().toMap
    assert(counts === Map("a" -> 4L, "b" -> 4L, "c" -> 4L))
  }

  test("balanceToMinClass builds its plan without launching a sizing job") {
    // the min-class-size lookup rides the plan as a 1-row broadcast —
    // the old form ran a separate .head() action (a full scan at scale)
    // before the sampling pass
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val df = corpus(Map("a" -> 17, "b" -> 4, "c" -> 9))
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val planned = util.Sampling.balanceToMinClass(df, "label", 5L)
      assert(planned.columns.toSeq === df.columns.toSeq) // plan built, no action
      // the listener bus is async — drain before reading the count
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val c = counter.get
        if (c == last) stable += 1 else { stable = 0; last = c }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    assert(counter.get === 0,
      s"plan construction must be job-free, ran ${counter.get} job(s)")
  }

  test("hash-weighted sample: membership is a pure function of the key") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, 100L + (i % 1900))).toDF("k", "w")
    def ids(parts: Int) = util.Sampling
      .hashWeightedSample(df.repartition(parts), "k", "w", 2000L)
      .select($"k").as[Long].collect().toSet
    val a = ids(1)
    assert(a === ids(7), "sample must not depend on partitioning")
    assert(a.nonEmpty && a.size < 5000)
  }

  test("hash-weighted sample: rate tracks the weight, p>=1 keeps all") {
    import spark.implicits._
    val low = (0L until 20000L).map(i => (i, 200L)).toDF("k", "w")
    val high = (100000L until 120000L).map(i => (i, 1000L)).toDF("k", "w")
    val rLow = util.Sampling.hashWeightedSample(low, "k", "w", 2000L).count() / 20000.0
    val rHigh = util.Sampling.hashWeightedSample(high, "k", "w", 2000L).count() / 20000.0
    assert(math.abs(rLow - 0.10) < 0.02, s"low-weight rate $rLow !~ 0.10")
    assert(math.abs(rHigh - 0.50) < 0.02, s"high-weight rate $rHigh !~ 0.50")
    val full = (0L until 100L).map(i => (i, 2000L)).toDF("k", "w")
    assert(util.Sampling.hashWeightedSample(full, "k", "w", 2000L).count() === 100L)
  }

  test("weighted exact-k sample: k rows, partition-independent, heap plan") {
    import spark.implicits._
    val df = (0L until 10000L).map(i => (i, 1L + (i % 100))).toDF("k", "w")
    val sampled = util.Sampling.weightedExactSample(df, "k", "w", 50)
    val a = sampled.select($"k").as[Long].collect().toSet
    assert(a.size === 50)
    val b = util.Sampling.weightedExactSample(df.repartition(9), "k", "w", 50)
      .select($"k").as[Long].collect().toSet
    assert(a === b, "sample must not depend on partitioning")
    // scale shape: per-task top-k heap, not a global sort
    assert(sampled.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
  }

  test("weighted exact-k sample is weight-biased; w<=0 is p=0") {
    import spark.implicits._
    // two halves of the key space at 10x weight ratio: the heavy half
    // should dominate the sample (A-ES inclusion ~ proportional to w)
    val df = ((0L until 5000L).map(i => (i, 1L)) ++
      (5000L until 10000L).map(i => (i, 10L))).toDF("k", "w")
    val heavy = util.Sampling.weightedExactSample(df, "k", "w", 200)
      .filter($"k" >= 5000L).count()
    assert(heavy > 150, s"heavy half got $heavy of 200 — expected ~10:1 bias")
    val withZero = df.withColumn("w", when($"k" < 9999L, 0L).otherwise($"w"))
    val only = util.Sampling.weightedExactSample(withZero, "k", "w", 200)
      .select($"k").as[Long].collect().toSeq
    assert(only === Seq(9999L), "w<=0 rows must be excluded")
  }

  test("weighted per-group sample: exact-k per group on randomized inputs (property)") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.mapOfN(4, Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), Gen.choose(1, 40))),
      Gen.choose(1, 12))
    val cases = (0 until 8).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(31L + i)))
    assert(cases.nonEmpty)
    cases.filter(_._1.nonEmpty).foreach { case (sizes, k) =>
      // weights 0..4 cycling: w=0 rows must not count toward the group size
      val df = sizes.toSeq.flatMap { case (g, n) =>
        (0 until n).map(i => (g, s"$g-$i", (i % 5).toLong))
      }.toDF("g", "id", "w")
      val out = util.Sampling.weightedExactSamplePerGroup(df, "g", "id", "w", k)
      val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
      sizes.foreach { case (g, n) =>
        val eligible = (0 until n).count(_ % 5 != 0)
        assert(counts.getOrElse(g, 0L) === math.min(eligible, k).toLong,
          s"sizes=$sizes k=$k group=$g eligible=$eligible")
      }
      // no sampled row may carry a non-positive weight
      assert(out.filter($"w" <= 0).count() === 0L)
    }
  }

  test("weighted per-group sample: partition-independent and weight-biased in-group") {
    import spark.implicits._
    // one group with a 10x weight split, one control group
    val df = ((0L until 2000L).map(i => ("big", i, if (i < 1000) 1L else 10L)) ++
      (0L until 50L).map(i => ("small", 100000L + i, 1L))).toDF("g", "k", "w")
    val a = util.Sampling.weightedExactSamplePerGroup(df, "g", "k", "w", 100)
      .select($"k").as[Long].collect().toSet
    val b = util.Sampling.weightedExactSamplePerGroup(df.repartition(13), "g", "k", "w", 100)
      .select($"k").as[Long].collect().toSet
    assert(a === b, "sample must not depend on partitioning")
    val heavy = a.count(k => k >= 1000L && k < 2000L)
    assert(heavy > 75, s"heavy half got $heavy of 100 — expected ~10:1 bias")
    // the undersized group is kept whole
    assert(a.count(_ >= 100000L) === 50)
  }

  test("corpus mixture hits target proportions exactly and is partition-invariant") {
    val rows = (0L until 300L).map(i => (i, s"g${i % 3}")) // 100 per group
    val df = rows.toDF("id", "grp")
    val wt = when($"grp" === "g0", 6L).when($"grp" === "g1", 3L).otherwise(1L)
    val out = util.Sampling.corpusMixture(df, "id", "grp", wt)
      .as[(Long, String, Long)].collect()
    // W = 10; T* = min(100*10/6, 100*10/3, 100*10/1) = 166;
    // quotas: g0 = 6*166/10 = 99, g1 = 3*166/10 = 49, g2 = 166/10 = 16
    val byGroup = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGroup === Map("g0" -> 99, "g1" -> 49, "g2" -> 16))
    // ranks are 1..n_quota within each group
    out.groupBy(_._2).foreach { case (g, sel) =>
      assert(sel.map(_._3).sorted.toSeq === (1L to sel.length).toSeq, g)
    }
    // selection is a pure function of the id — repartitioning changes nothing
    val out2 = util.Sampling.corpusMixture(df.repartition(13), "id", "grp", wt)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq === out2.sortBy(_._1).toSeq)
    // inconsistent weights within a group fail loudly
    val bad = intercept[Exception] {
      util.Sampling.corpusMixture(df, "id", "grp",
        when($"id" % 2 === 0, 1L).otherwise(2L))
    }
    assert(bad.getMessage.contains("not constant"))
  }

  test("unimax: caps bind smallest-first, freed budget flows to big " +
      "languages, fractional epoch never overshoots, partition-invariant") {
    // lang sizes (tokens): a=6 docs*2=12, b=30*2=60, c=100*2=200
    val rows = (0L until 136L).map { i =>
      val lang = if (i < 6) "a" else if (i < 36) "b" else "c"
      (i, lang, 2L)
    }
    val df = rows.toDF("id", "lang", "toks")
    // budget 120, maxEpochs 3: asc order a(12), b(60), c(200)
    //  a: min(120/3=40, 36) = 36 -> rem 84
    //  b: min(84/2=42, 180) = 42 -> rem 42   (fractional: 42 of 60)
    //  c: min(42/1=42, 600) = 42              (fractional: 42 of 200)
    val out = util.Sampling.unimaxPlan(df, "id", "lang", $"toks", 120L, 3)
      .as[(Long, String, Long, Long, Long, Long, Long, Boolean, Long)]
      .collect()
    val byLang = out.groupBy(_._2)
    def plan(l: String) = byLang(l).head
    assert(plan("a")._5 === 36L && plan("b")._5 === 42L && plan("c")._5 === 42L)
    // budgets sum to the full budget (nothing stranded)
    assert(Seq("a", "b", "c").map(plan(_)._5).sum === 120L)
    // a: 3 full epochs, no fractional; b/c: 0 full + fractional prefix
    assert(byLang("a").forall(r => r._7 == 3L && !r._8 && r._9 == 3L))
    assert(byLang("b").count(_._8) === 21 && byLang("c").count(_._8) === 21)
    // fractional selection = exactly the lowest ranks, never overshoots
    Seq("b", "c").foreach { l =>
      val sel = byLang(l).filter(_._8)
      assert(sel.map(_._3).sum <= 42L)
      assert(sel.map(_._6).sorted.toSeq === (1L to sel.length).toSeq, l)
    }
    // pure function of (id, lang, toks): partitioning changes nothing
    val out2 = util.Sampling
      .unimaxPlan(df.repartition(13), "id", "lang", $"toks", 120L, 3)
      .as[(Long, String, Long, Long, Long, Long, Long, Boolean, Long)]
      .collect()
    assert(out.sortBy(_._1).toSeq === out2.sortBy(_._1).toSeq)
  }

  test("corpus mixture quota math survives weights whose products overflow Long") {
    // W = 2e18; cnt·W = 2e19 > Long.MaxValue — Long arithmetic would
    // wrap negative and zero (or invert) the quotas; BigInt keeps them
    // exact: T* = min(10·2e18/1e18) = 20, quota_g = 1e18·20/2e18 = 10
    val rows = (0L until 20L).map(i => (i, s"g${i % 2}"))
    val df = rows.toDF("id", "grp")
    val big = 1000000000000000000L // 1e18
    val out = util.Sampling.corpusMixture(df, "id", "grp", lit(big))
      .as[(Long, String, Long)].collect()
    val byGroup = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGroup === Map("g0" -> 10, "g1" -> 10))
  }

  test("temperature mixture: sqrt up-weights rare groups, caps, partition-invariant") {
    // 400 / 100 / 25 rows — natural shares 76%/19%/5%; sqrt masses
    // 20/10/5 => shares 57%/29%/14%: the rare groups gain share.
    val rows = (0L until 400L).map(i => (i, "big")) ++
      (0L until 100L).map(i => (1000L + i, "mid")) ++
      (0L until 25L).map(i => (2000L + i, "rare"))
    val df = rows.toDF("id", "grp")
    val out = util.Sampling.temperatureMixture(df, "id", "grp",
      alpha = 0.5, targetNum = 1, targetDen = 2)
      .as[(Long, String, Long)].collect()
    // T = 525/2 = 262; masses r = 1e6*(20, 10, 5), R = 35e6;
    // quotas: big 262*20/35 = 149, mid 262*10/35 = 74, rare min(25, 37) = 25
    val byGroup = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGroup === Map("big" -> 149, "mid" -> 74, "rare" -> 25))
    // rare group share rose from 5% natural to 10% of the mixture (capped),
    // big fell from 76% to 60%
    // ranks are 1..quota within each group
    out.groupBy(_._2).foreach { case (g, sel) =>
      assert(sel.map(_._3).sorted.toSeq === (1L to sel.length).toSeq, g)
    }
    val out2 = util.Sampling.temperatureMixture(df.repartition(13), "id", "grp",
      alpha = 0.5, targetNum = 1, targetDen = 2)
      .as[(Long, String, Long)].collect()
    assert(out.sortBy(_._1).toSeq === out2.sortBy(_._1).toSeq)
    // alpha = 1 degenerates to proportional-to-count quotas
    val prop = util.Sampling.temperatureMixture(df, "id", "grp",
      alpha = 1.0, targetNum = 1, targetDen = 2)
      .as[(Long, String, Long)].collect()
      .groupBy(_._2).view.mapValues(_.length).toMap
    assert(prop === Map("big" -> 199, "mid" -> 49, "rare" -> 12))
  }

  test("epoched temperature mixture: exact T_g rows per group, div/mod " +
      "epoch structure, partition-invariant") {
    // 400 / 25: masses 1e6*(20, 5), R = 25e6; T = 425*2 = 850;
    // T_big = 850*20/25 = 680 -> 1 full pass + 280 extra;
    // T_rare = 850*5/25 = 170 -> 6 full passes + 20 extra
    val rows = (0L until 400L).map(i => (i, "big")) ++
      (0L until 25L).map(i => (2000L + i, "rare"))
    val df = rows.toDF("id", "grp")
    val out = util.Sampling.temperatureMixtureEpochs(df, "id", "grp",
      alpha = 0.5, targetNum = 2, targetDen = 1)
      .as[(Long, String, Long, Long)].collect()
    val byGroup = out.groupBy(_._2)
    assert(byGroup("big").length === 680)
    assert(byGroup("rare").length === 170)
    // every rare doc appears in epochs 0..5; ranks <= 20 in epoch 6 too
    val rareEpochs = byGroup("rare").groupBy(_._1).view
      .mapValues(_.map(_._4).sorted.toSeq).toMap
    assert(rareEpochs.values.forall(e =>
      e == (0L to 5L) || e == (0L to 6L)))
    assert(rareEpochs.values.count(_ == (0L to 6L)) === 20)
    // the extra-epoch docs are exactly the smallest md5 ranks
    val rareRanks = byGroup("rare").map(r => (r._1, r._3)).toMap
    assert(rareEpochs.filter(_._2 == (0L to 6L)).keySet ===
      rareRanks.filter(_._2 <= 20L).keySet)
    val out2 = util.Sampling.temperatureMixtureEpochs(df.repartition(13),
      "id", "grp", alpha = 0.5, targetNum = 2, targetDen = 1)
      .as[(Long, String, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._4)).toSeq ===
      out2.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("ccnet buckets: terciles partition the scored docs, cutoffs ordered") {
    val dir = "/root/testdata/sf0.001"
    val out = ops.Quality.q120CcnetBuckets(spark, dir)
      .as[(Long, Long, String)].collect()
    assert(out.nonEmpty)
    val byBucket = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    // every head bits <= every middle bits <= every tail bits
    assert(byBucket("head") > 0 && byBucket("middle") > 0 && byBucket("tail") > 0)
    val maxHead = out.filter(_._3 == "head").map(_._2).max
    val minMid = out.filter(_._3 == "middle").map(_._2).min
    val maxMid = out.filter(_._3 == "middle").map(_._2).max
    val minTail = out.filter(_._3 == "tail").map(_._2).min
    assert(maxHead <= minMid && maxMid <= minTail)
    // tercile balance: each bucket within ±2 of n/3 (cutoff ties can shift)
    val n = out.length
    byBucket.values.foreach(c => assert(math.abs(c - n / 3) <= n / 3 / 2 + 2))
  }

  test("85/15 split partitions the input without overlap") {
    val df = corpus(Map("a" -> 200))
    val (train, test) = util.Sampling.split8515(df, 42L)
    val t = train.as[(String, String)].collect().toSet
    val v = test.as[(String, String)].collect().toSet
    assert((t intersect v).isEmpty)
    assert(t.size + v.size === 200)
    assert(t.size > 140) // loose: Bernoulli split targets 85%
  }
}
