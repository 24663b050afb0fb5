package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns

import graft.plans.GraftExtensions

/** [[graft.plans.GraftExtensions]] + [[graft.plans.BandJoinToBinned]]:
  * SQL-function registration of the custom codegen'd expressions, and
  * the automatic band-join → binned-equi-join optimizer rewrite.
  *
  * All tests run against an ISOLATED `newSession()` — the install
  * mutates session state (function registry + extra optimizations),
  * which must not leak into the other suites' shared session.
  */
class ExtensionsSpec extends SparkTestBase with AdaptiveSparkPlanHelper {

  private lazy val ext: SparkSession = {
    val s = spark.newSession()
    GraftExtensions.install(s)
    s
  }

  private def hashJoins(p: SparkPlan) = collectWithSubqueries(p) { case j: BroadcastHashJoinExec => j }
  private def nestedLoops(p: SparkPlan) = collectWithSubqueries(p) { case j: BroadcastNestedLoopJoinExec => j }

  // ---- SQL function registration -----------------------------------------

  test("install registers cosine_sim and it matches the column API") {
    val viaSql = ext.sql(
      "SELECT cosine_sim(array(3.0D, 4.0D), array(4.0D, 3.0D)) AS c").head.getDouble(0)
    assert(math.abs(viaSql - 24.0 / 25.0) < 1e-15)
    val viaCol = ext.range(1)
      .select(GraftColumns.cosineSimilarity(
        array(lit(3.0), lit(4.0)), array(lit(4.0), lit(3.0))).as("c"))
      .head.getDouble(0)
    assert(viaSql == viaCol)
  }

  test("install registers simhash64 / char_bigrams / winnow_fingerprints") {
    val text = "the quick brown fox jumps over the lazy dog"
    val viaSql = ext.sql(s"SELECT simhash64('$text') AS h").head.getLong(0)
    val viaCol = ext.range(1)
      .select(GraftColumns.simHash64(lit(text)).as("h")).head.getLong(0)
    assert(viaSql == viaCol)

    val bg = ext.sql("SELECT char_bigrams('abab') AS g").head.getSeq[String](0)
    assert(bg == Seq("ab", "ba"))

    val fpSql = ext.sql(s"SELECT winnow_fingerprints('$text', 5, 4) AS f")
      .head.getSeq[Long](0)
    val fpCol = ext.range(1)
      .select(GraftColumns.winnowFingerprints(lit(text), 5, 4).as("f"))
      .head.getSeq[Long](0)
    assert(fpSql == fpCol && fpSql.nonEmpty)

    val dhSql = ext.sql(
      "SELECT dhash56(transform(sequence(0, 1023), i -> CAST(i % 251 AS FLOAT))) AS h")
      .head.getLong(0)
    val dhCol = ext.range(1)
      .select(GraftColumns.dHash56(
        transform(sequence(lit(0), lit(1023)),
          i => (i % 251).cast("float"))).as("h"))
      .head.getLong(0)
    assert(dhSql == dhCol)
  }

  test("winnow_fingerprints rejects non-literal k/w") {
    val e = intercept[Exception] {
      ext.sql("SELECT winnow_fingerprints('abc', CAST(id AS INT), 4) FROM range(1)").collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" ")
    assert(chain.contains("integer literal"))
  }

  test("install is idempotent") {
    GraftExtensions.install(ext)
    GraftExtensions.install(ext)
    assert(ext.experimental.extraOptimizations.count(_ == graft.plans.BandJoinToBinned) == 1)
    assert(ext.sql("SELECT cosine_sim(array(1.0D), array(1.0D)) c").head.getDouble(0) == 1.0)
  }

  // ---- BandJoinToBinned rewrite ------------------------------------------

  /** Deterministic fact frame: 20k rows, values dense in [0, 1000). */
  private def fact(s: SparkSession) = {
    import s.implicits._
    s.range(0, 20000).select($"id", (($"id" * 37) % 1000).cast("double").as("v"))
  }

  private def bandsDf(s: SparkSession, rows: Seq[(String, Double, Double)]) = {
    import s.implicits._
    rows.toDF("band", "lo", "hi")
  }

  private val disjoint = Seq(("a", 0.0, 100.0), ("b", 100.0, 420.0), ("c", 420.0, 1000.0))

  test("band join plans as BroadcastHashJoin under the rule, nested-loop without it") {
    import ext.implicits._
    val joined = fact(ext).join(bandsDf(ext, disjoint), $"v" >= $"lo" && $"v" < $"hi")
    joined.collect() // force the (possibly adaptive) final plan
    assert(hashJoins(joined.queryExecution.executedPlan).nonEmpty, "rule did not fire")
    assert(nestedLoops(joined.queryExecution.executedPlan).isEmpty)

    val plain = fact(spark).join(bandsDf(spark, disjoint),
      col("v") >= col("lo") && col("v") < col("hi"))
    plain.collect()
    assert(nestedLoops(plain.queryExecution.executedPlan).nonEmpty,
      "control session unexpectedly avoided the nested loop")
  }

  test("rewrite preserves the exact join result (disjoint bands)") {
    import ext.implicits._
    val got = fact(ext).join(bandsDf(ext, disjoint), $"v" >= $"lo" && $"v" < $"hi")
      .select($"id", $"band").as[(Long, String)].collect().sorted.toSeq
    val want = {
      import spark.implicits._
      fact(spark).join(bandsDf(spark, disjoint), $"v" >= $"lo" && $"v" < $"hi")
        .select($"id", $"band").as[(Long, String)].collect().sorted.toSeq
    }
    assert(got == want && got.size == 20000)
  }

  test("overlapping bands: one output row per (row, band) match, never per bin") {
    import ext.implicits._
    val overlapping = Seq(("x", 0.0, 500.0), ("y", 250.0, 750.0))
    val got = fact(ext).join(bandsDf(ext, overlapping), $"v" >= $"lo" && $"v" < $"hi")
      .groupBy($"band").count().as[(String, Long)].collect().toMap
    // v = (id*37) % 1000 is uniform over 0..999 (gcd(37,1000)=1, 20 full cycles)
    assert(got == Map("x" -> 10000L, "y" -> 10000L))
  }

  test("strict and non-strict bounds both keep exact edge semantics") {
    import ext.implicits._
    // band edge 100.0 is a real v value; flip the bound shapes
    val bands = bandsDf(ext, Seq(("lo_in", 100.0, 200.0)))
    val in = fact(ext).join(bands, $"v" >= $"lo" && $"v" < $"hi")
    val ex = fact(ext).join(bands, $"v" > $"lo" && $"v" <= $"hi")
    in.collect(); ex.collect()
    assert(hashJoins(in.queryExecution.executedPlan).nonEmpty)
    assert(hashJoins(ex.queryExecution.executedPlan).nonEmpty)
    val nIn = in.count()
    val nEx = ex.count()
    // 100 values/cycle in [100,200), 20 cycles; swapping the closed end
    // moves exactly the v=100 rows (20) out and the v=200 rows (20) in
    assert(nIn == 2000 && nEx == 2000)
    assert(in.filter($"v" === 100.0).count() == 20 && ex.filter($"v" === 100.0).count() == 0)
    assert(in.filter($"v" === 200.0).count() == 0 && ex.filter($"v" === 200.0).count() == 20)
  }

  test("broadcast hint on a LEFT band side follows the band through the rewrite") {
    import ext.implicits._
    // the rewritten join is always (fact, binnedBand): a hint attached
    // to a left-hand band side must swap with it, or broadcast(bands)
    // would become a broadcast hint on the fact side — the side that
    // must never be broadcast at scale
    val joined = broadcast(bandsDf(ext, disjoint))
      .join(fact(ext), $"v" >= $"lo" && $"v" < $"hi")
    joined.collect()
    val hjs = hashJoins(joined.queryExecution.executedPlan)
    assert(hjs.nonEmpty, "rule did not fire on the flipped orientation")
    import org.apache.spark.sql.catalyst.optimizer.BuildRight
    assert(hjs.forall(_.buildSide == BuildRight),
      "broadcast hint re-attached to the fact side after the flip")
    assert(joined.count() == 20000)
  }

  test("rule declines a single-bound theta join") {
    import ext.implicits._
    val oneSided = fact(ext).limit(100)
      .join(bandsDf(ext, disjoint), $"v" >= $"lo")
    oneSided.collect()
    assert(nestedLoops(oneSided.queryExecution.executedPlan).nonEmpty)
    assert(hashJoins(oneSided.queryExecution.executedPlan).isEmpty)
  }

  test("an equi conjunct rides into the rewrite as a composite hash key") {
    // per-group bands: group 0/1/2 each has its own (overlapping) tiers
    val keyedRows = Seq(
      ("g0_lo", 0L, 0.0, 300.0), ("g0_hi", 0L, 300.0, 1000.0),
      ("g1_all", 1L, 0.0, 1000.0),
      ("g2_lo", 2L, 0.0, 500.0), ("g2_hi", 2L, 400.0, 1000.0))
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
      df.select(col("id"), col("band")).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1))).sorted
    val got = {
      import ext.implicits._
      val keyed = keyedRows.toDF("band", "k", "lo", "hi")
      val j = fact(ext).withColumn("g", col("id") % 3)
        .join(keyed, col("g") === col("k") &&
          col("v") >= col("lo") && col("v") < col("hi"))
      j.collect()
      // fires: bin column present, executed join is a hash join
      assert(j.queryExecution.optimizedPlan.toString.contains("graft_band_bin"))
      assert(hashJoins(j.queryExecution.executedPlan).nonEmpty)
      rowsOf(j)
    }
    // control session (no rule): same join, same rows
    val want = {
      import spark.implicits._
      val keyed = keyedRows.toDF("band", "k", "lo", "hi")
      rowsOf(fact(spark).withColumn("g", col("id") % 3)
        .join(keyed, col("g") === col("k") &&
          col("v") >= col("lo") && col("v") < col("hi")))
    }
    assert(got.nonEmpty && got === want)
  }

  test("rewrite is a fixpoint: the rule leaves its own output unchanged") {
    import ext.implicits._
    val keyed = Seq(("t", 0L, 0.0, 500.0)).toDF("band", "k", "lo", "hi")
    val j = fact(ext).withColumn("g", $"id" % 3)
      .join(keyed, $"g" === $"k" && $"v" >= $"lo" && $"v" < $"hi")
    val once = j.queryExecution.optimizedPlan // rule already applied here
    assert(once.toString.contains("graft_band_bin"), "rewrite did not fire")
    val twice = graft.plans.BandJoinToBinned(once)
    assert(twice.toString === once.toString,
      "rule re-fired on its own output — fixpoint guard broken")
  }

  // ---- type matrix: int/long/decimal/double × strict/non-strict ----------

  /** Same 20k-row fact frame with the band value in each supported
    * type. Long values sit far above 2^53 so a double round-trip would
    * corrupt them — the integral path must bin in the exact 64-bit
    * domain.
    */
  private def typedFact(s: SparkSession, dt: String) = {
    import s.implicits._
    val base = ($"id" * 37) % 1000
    val v = dt match {
      case "int"     => base.cast("int")
      case "long"    => lit(4000000000000000000L) + base.cast("long") * 1000000L
      case "decimal" => (base.cast("double") / 10.0).cast("decimal(10,2)")
      case "double"  => base.cast("double")
      // sub-second offsets: a binning that rounded micros through
      // seconds or a double would misplace these rows
      case "timestamp" =>
        timestamp_micros(lit(1700000000000000L) + base.cast("long") * 61000001L)
      case "date" => date_add(lit("2020-01-01").cast("date"), base.cast("int"))
    }
    s.range(0, 20000).select($"id", v.as("v"))
  }

  private def typedBands(s: SparkSession, dt: String) = {
    import s.implicits._
    val raw = Seq(("a", 0.0, 100.0), ("b", 100.0, 420.0), ("c", 420.0, 1000.0))
      .toDF("band", "rawlo", "rawhi")
    val (lo, hi) = dt match {
      case "int" => ($"rawlo".cast("int"), $"rawhi".cast("int"))
      case "long" =>
        (lit(4000000000000000000L) + $"rawlo".cast("long") * 1000000L,
          lit(4000000000000000000L) + $"rawhi".cast("long") * 1000000L)
      case "decimal" =>
        (($"rawlo" / 10.0).cast("decimal(10,2)"), ($"rawhi" / 10.0).cast("decimal(10,2)"))
      case "double" => ($"rawlo", $"rawhi")
      case "timestamp" =>
        (timestamp_micros(lit(1700000000000000L) + $"rawlo".cast("long") * 61000001L),
          timestamp_micros(lit(1700000000000000L) + $"rawhi".cast("long") * 61000001L))
      case "date" =>
        (date_add(lit("2020-01-01").cast("date"), $"rawlo".cast("int")),
          date_add(lit("2020-01-01").cast("date"), $"rawhi".cast("int")))
    }
    raw.select($"band", lo.as("lo"), hi.as("hi"))
  }

  for (dt <- Seq("int", "long", "decimal", "double", "timestamp", "date");
       strict <- Seq(true, false)) {
    test(s"type matrix: $dt bands, ${if (strict) "strict" else "non-strict"} upper bound") {
      def joined(s: SparkSession) = {
        val (f, b) = (typedFact(s, dt), typedBands(s, dt))
        val cond =
          if (strict) f("v") >= b("lo") && f("v") < b("hi")
          else f("v") > b("lo") && f("v") <= b("hi")
        f.join(b, cond).select(f("id"), b("band"))
      }
      val got = joined(ext)
      val gotRows = got.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(hashJoins(got.queryExecution.executedPlan).nonEmpty,
        s"rule did not fire for $dt")
      assert(nestedLoops(got.queryExecution.executedPlan).isEmpty)
      val want = joined(spark).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(gotRows == want && gotRows.nonEmpty)
    }
  }

  test("integral bands spanning negative values bin exactly (trunc-div parity)") {
    def j(s: SparkSession) = {
      import s.implicits._
      val f = s.range(0, 4000).select($"id", (($"id" * 37) % 1000 - 500).cast("long").as("v"))
      val bands = Seq(("neg", -500L, -100L), ("mid", -100L, 200L), ("pos", 200L, 500L))
        .toDF("band", "lo", "hi")
      f.join(bands, $"v" >= $"lo" && $"v" < $"hi").groupBy($"band").count()
    }
    val got = j(ext)
    val gotMap = got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hashJoins(got.queryExecution.executedPlan).nonEmpty)
    val want = j(spark).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotMap == want && gotMap.values.sum > 0)
  }

  // ---- decline paths ------------------------------------------------------

  test("a non-finite band bound declines the whole rewrite, results intact") {
    import ext.implicits._
    // an open-topped +Inf band matches every row >= lo under the
    // nested loop; silently dropping it from a binned rewrite would
    // lose those matches — the rule must decline instead (ADVICE r8)
    val bands = Seq(("low", 0.0, 500.0), ("top", 500.0, Double.PositiveInfinity))
      .toDF("band", "lo", "hi")
    val j = fact(ext).join(bands, $"v" >= $"lo" && $"v" < $"hi")
    val counts = j.groupBy($"band").count().as[(String, Long)].collect().toMap
    assert(counts == Map("low" -> 10000L, "top" -> 10000L))
    j.collect()
    assert(nestedLoops(j.queryExecution.executedPlan).nonEmpty, "rewrite should decline on +Inf")
    assert(hashJoins(j.queryExecution.executedPlan).isEmpty)

    val nanBands = Seq(("n", Double.NaN, 500.0)).toDF("band", "lo", "hi")
    val jn = fact(ext).join(nanBands, $"v" >= $"lo" && $"v" < $"hi")
    jn.collect()
    assert(nestedLoops(jn.queryExecution.executedPlan).nonEmpty, "rewrite should decline on NaN")
  }

  test("huge-magnitude double bounds decline (bin ids near Long saturation)") {
    import ext.implicits._
    val bands = Seq(("x", 1.0e19, 1.0e19 + 2048.0)).toDF("band", "lo", "hi")
    val j = fact(ext).join(bands, $"v" >= $"lo" && $"v" < $"hi")
    j.collect()
    assert(nestedLoops(j.queryExecution.executedPlan).nonEmpty,
      "rewrite should decline when |bound|/w exceeds 2^62")
  }

  test("huge fact values under normal bands stay consistent (saturation side)") {
    import ext.implicits._
    val f = Seq(0.0, 50.0, 999.0, 1.0e300, -1.0e300, Double.NaN).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val bands = bandsDf(ext, disjoint)
    val got = f.join(bands, $"v" >= $"lo" && $"v" < $"hi")
      .select($"id", $"band").as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((0L, "a"), (1L, "a"), (2L, "c")))
  }

  // ---- non-literal (parquet-backed) band sides ----------------------------

  test("parquet-backed band side fires via bounded plan-time read") {
    import ext.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bands").toString
    Seq(("a", 0.0, 100.0), ("b", 100.0, 420.0), ("c", 420.0, 1000.0))
      .toDF("band", "lo", "hi").write.mode("overwrite").parquet(dir)
    val bands = ext.read.parquet(dir)
    val j = fact(ext).join(bands, $"v" >= $"lo" && $"v" < $"hi")
      .select($"id", $"band")
    val got = j.as[(Long, String)].collect().sorted.toSeq
    assert(hashJoins(j.queryExecution.executedPlan).nonEmpty,
      "rule did not fire on a parquet band side")
    assert(nestedLoops(j.queryExecution.executedPlan).isEmpty)
    val want = {
      import spark.implicits._
      fact(spark).join(spark.read.parquet(dir),
          col("v") >= col("lo") && col("v") < col("hi"))
        .select(col("id"), col("band")).as[(Long, String)].collect().sorted.toSeq
    }
    assert(got == want && got.size == 20000)
  }

  test("oversized band side takes the distributed shuffle fallback, not a nested loop") {
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    val s = spark.newSession()
    GraftExtensions.install(s)
    // two large sides: neither may broadcast, exactly as at 100 TB
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import s.implicits._
    // 15k contiguous width-10 int bands — above maxBandRows, shipped
    // from parquet: the case the materialized rewrite declines
    val dir = java.nio.file.Files.createTempDirectory("graft-bigbands").toString
    s.range(15000).select(
        concat(lit("b"), $"id").as("band"),
        ($"id" * 10L).as("lo"),
        (($"id" + 1L) * 10L).as("hi"))
      .write.mode("overwrite").parquet(dir)
    val bands = s.read.parquet(dir)
    val facts = s.range(20000).select($"id", (($"id" * 7919L) % 150000L).as("v"))
    val j = facts.join(bands, $"v" >= $"lo" && $"v" < $"hi").select($"id", $"band")
    val plan = j.queryExecution.executedPlan
    assert(nestedLoops(plan).isEmpty,
      s"oversized band side must not fall back to a nested loop:\n$plan")
    val keyed = collectWithSubqueries(plan) {
      case x: SortMergeJoinExec => x: SparkPlan
      case x: ShuffledHashJoinExec => x: SparkPlan
    }
    assert(keyed.nonEmpty && plan.toString.contains("graft_band_bin"),
      s"expected a shuffle join on the synthetic bin key:\n$plan")
    // contiguous width-10 bands: every fact row lands in exactly band v/10
    val got = j.as[(Long, String)].collect().sorted.toSeq
    val want = (0L until 20000L)
      .map(id => (id, s"b${(id * 7919L) % 150000L / 10L}")).sorted
    assert(got == want)
  }

  test("q87 drives the distributed fallback on real testdata (sf0.01, 15k windows)") {
    val s = spark.newSession()
    val df = SparkEntry.queries("q87_large_band_join")(s, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan
    assert(nestedLoops(plan).isEmpty,
      s"15k-window band side must take the distributed fallback:\n$plan")
    assert(plan.toString.contains("graft_band_bin"),
      s"expected the synthetic bin key in the plan:\n$plan")
    val rows = df.collect()
    assert(rows.length === 5 && rows.map(_.getLong(1)).sum > 2000,
      "every priority class should match thousands of (lineitem, window) pairs")
  }

  test("a non-deterministic band side is never materialized at plan time") {
    import ext.implicits._
    val bands = ext.range(3).select(
      concat(lit("b"), $"id").as("band"),
      (rand(7) * 500.0).as("lo"),
      (rand(7) * 500.0 + 500.0).as("hi"))
    val j = fact(ext).join(bands, $"v" >= $"lo" && $"v" < $"hi")
    j.collect() // must not throw; plan must stay a nested loop
    assert(nestedLoops(j.queryExecution.executedPlan).nonEmpty)
    assert(hashJoins(j.queryExecution.executedPlan).isEmpty)
  }

  test("band side on the LEFT of the join fires too") {
    import ext.implicits._
    val j = bandsDf(ext, disjoint).join(fact(ext), $"v" >= $"lo" && $"v" < $"hi")
    j.collect()
    assert(hashJoins(j.queryExecution.executedPlan).nonEmpty)
    assert(j.count() == 20000)
  }

  test("null and inverted band rows produce no matches and no crash") {
    import ext.implicits._
    val bands = Seq(
      ("ok", java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(100.0)),
      ("null_lo", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(50.0)),
      ("inverted", java.lang.Double.valueOf(90.0), java.lang.Double.valueOf(10.0)))
      .toDF("band", "lo", "hi")
    val got = fact(ext).join(bands, $"v" >= $"lo" && $"v" < $"hi")
      .groupBy($"band").count().as[(String, Long)].collect().toMap
    assert(got == Map("ok" -> 2000L))
  }

  // ---- q71 end-to-end -----------------------------------------------------

  test("q71 runs the rewrite on real testdata with a broadcast hash plan") {
    val s = spark.newSession()
    val df = SparkEntry.queries("q71_auto_band_join")(s, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length >= 4 && rows.map(_.getLong(1)).sum > 5000)
    assert(hashJoins(df.queryExecution.executedPlan).nonEmpty)
    assert(nestedLoops(df.queryExecution.executedPlan).isEmpty)
  }

  test("q72 int-band join rewrites on real testdata; quantities fully covered") {
    val df = SparkEntry.queries("q72_int_band_join")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(hashJoins(df.queryExecution.executedPlan).nonEmpty)
    assert(nestedLoops(df.queryExecution.executedPlan).isEmpty)
    // tiers 1..50 cover the whole l_quantity domain — every lineitem
    // lands in exactly one tier
    val total = rows.map(_.getLong(1)).sum
    val nLineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    assert(rows.length == 4 && total == nLineitem)
  }

  test("q73 parquet-band join rewrites on real testdata with a hash plan") {
    val df = SparkEntry.queries("q73_parquet_band_join")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(hashJoins(df.queryExecution.executedPlan).nonEmpty)
    assert(nestedLoops(df.queryExecution.executedPlan).isEmpty)
    // the 25 nation bands cover [0, 300k); the rest of the price domain
    // is intentionally unmatched (inner join), so not all 1500 orders land
    assert(rows.length > 10 && rows.map(_.getLong(1)).sum > 500)
  }

  test("q77 timestamp-band join rewrites on real testdata with a hash plan") {
    val df = SparkEntry.queries("q77_time_band_join")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(hashJoins(df.queryExecution.executedPlan).nonEmpty)
    assert(nestedLoops(df.queryExecution.executedPlan).isEmpty)
    // five one-year windows over 1996-2001; orders span 1995-2001, so
    // every window matches some orders but not all orders match
    val nOrders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet").count()
    val matched = rows.map(_.getLong(1)).sum
    assert(rows.length == 5 && matched > 0 && matched < nOrders)
  }

  test("q80 per-group band join rewrites on real testdata with a hash plan") {
    val df = SparkEntry.queries("q80_grouped_band_join")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_band_bin"),
      "composite equi+band condition did not rewrite")
    assert(hashJoins(df.queryExecution.executedPlan).nonEmpty)
    assert(nestedLoops(df.queryExecution.executedPlan).isEmpty)
    // F and O tier schedules both non-empty; the P schedule matches no
    // lineitem (linestatus is only F/O) so exactly 5 tiers emerge, and
    // quantities 1..50 are fully covered per group
    assert(rows.map(_.getString(0)).toSet === Set("F", "O"))
    assert(rows.length === 5)
    val total = rows.map(_.getLong(2)).sum
    val nLineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    assert(total === nLineitem, "tiers must partition every lineitem row per group")
  }
}
