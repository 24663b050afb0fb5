package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.plans.GraftExtensions

/** Property check: [[graft.plans.BandJoinToBinned]] is
  * result-identical to the nested-loop band join over RANDOMIZED band
  * sets — overlapping, inverted, null, huge-magnitude, NaN/Inf bounds —
  * in both the floating and the exact integral domain, against fact
  * values that include the same pathologies. Whether the rule fires or
  * declines on a given band set is not asserted here (ExtensionsSpec
  * pins the plans); what this suite pins is that EITHER WAY the answer
  * matches a control session without the rule, row for row.
  *
  * Deterministic: cases are drawn from seeded ScalaCheck generators
  * (same explicit-seed style as SamplingSpec), no forAll.
  */
class BandJoinPropertySpec extends SparkTestBase {

  private lazy val ext: SparkSession = {
    val s = spark.newSession()
    GraftExtensions.install(s)
    s
  }

  /** Session whose materialization budget is zero — every band side
    * routes through the DISTRIBUTED fallback (Generate + shuffle join);
    * floating domains fire only when the stats job's NaN/Inf screen
    * comes back clean, declining to the control plan otherwise.
    */
  private lazy val extLarge: SparkSession = {
    val s = spark.newSession()
    GraftExtensions.install(s)
    s.conf.set("spark.graft.bandJoin.maxBandRows", "0")
    s
  }

  private val nCases = 12

  // bounds: mostly ordinary, sometimes extreme / special / null —
  // inverted and overlapping bands arise naturally from independent draws
  private val dblBound: Gen[Option[Double]] = Gen.frequency(
    8 -> Gen.choose(-1000.0, 1000.0).map(Some(_)),
    1 -> Gen.oneOf(1.0e19, -1.0e19, java.lang.Double.MIN_VALUE,
      Double.PositiveInfinity, Double.NegativeInfinity, Double.NaN).map(Some(_)),
    1 -> Gen.const(None))

  private val lngBound: Gen[Option[Long]] = Gen.frequency(
    8 -> Gen.choose(-1000L, 1000L).map(Some(_)),
    1 -> Gen.oneOf(Long.MinValue, Long.MaxValue, Long.MaxValue - 3,
      4000000000000000000L).map(Some(_)),
    1 -> Gen.const(None))

  /** Micro-precision external timestamp — JVM zone is pinned UTC in
    * build.sbt, so the external↔internal round-trip is zone-stable.
    */
  private def tsOfMicros(micros: Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    ts
  }

  // ordinary epoch-adjacent micros, the representable extremes (year 1
  // and 9999), and nulls; sub-millisecond fractions throughout so a
  // binning that rounded through millis/seconds would misplace rows
  private val tsBound: Gen[Option[java.sql.Timestamp]] = Gen.frequency(
    8 -> Gen.choose(-1000000000L, 1000000000L).map(m => Some(tsOfMicros(m))),
    1 -> Gen.oneOf(0L, 253402300799999999L, -62135596800000000L)
      .map(m => Some(tsOfMicros(m))),
    1 -> Gen.const(None))

  private def bandsGen[T](bound: Gen[Option[T]]): Gen[List[(Option[T], Option[T])]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.zip(bound, bound)))

  private def draw[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val factDoubles: Seq[Option[Double]] =
    (0 until 300).map(i => Some((i * 37 % 600 - 300).toDouble)) ++
      Seq(Some(Double.NaN), Some(Double.PositiveInfinity),
        Some(Double.NegativeInfinity), Some(1.0e300), Some(-1.0e300),
        Some(0.0), Some(-0.0), None)

  private val factLongs: Seq[Option[Long]] =
    (0 until 300).map(i => Some((i * 37 % 600 - 300).toLong)) ++
      Seq(Some(Long.MinValue), Some(Long.MaxValue),
        Some(4000000000000000123L), Some(0L), None)

  private val factTimestamps: Seq[Option[java.sql.Timestamp]] =
    (0 until 300).map(i => Some(tsOfMicros((i * 37 % 600 - 300) * 3333337L))) ++
      Seq(Some(tsOfMicros(0L)), Some(tsOfMicros(253402300799999999L)),
        Some(tsOfMicros(-62135596800000000L)), None)

  private def df[T](s: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    s.createDataFrame(rows.asJava, schema)

  /** Grouped variant: every fact row and band row carries a group key
    * (g = id % 3 / hash of the band index) and the join adds `g = bg`
    * to the bounds — exercising the composite equi+bin rewrite path
    * against the control's plain hash join with residual bounds.
    */
  private def runGrouped[T](
      s: SparkSession,
      dt: DataType,
      facts: Seq[Option[T]],
      bands: List[(Option[T], Option[T])]): Seq[(Long, String)] = {
    val factSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("g", LongType, nullable = false),
      StructField("v", dt, nullable = true)))
    val bandSchema = StructType(Seq(
      StructField("band", StringType, nullable = false),
      StructField("bg", LongType, nullable = false),
      StructField("lo", dt, nullable = true),
      StructField("hi", dt, nullable = true)))
    val factRows = facts.zipWithIndex.map { case (v, i) =>
      Row(i.toLong, (i % 3).toLong, v.orNull)
    }
    val bandRows = bands.zipWithIndex.map { case ((l, h), i) =>
      Row(s"b$i", (i % 3).toLong, l.orNull, h.orNull)
    }
    df(s, factRows, factSchema)
      .join(df(s, bandRows, bandSchema),
        col("g") === col("bg") && col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("id"), col("band"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
  }

  private def run[T](
      s: SparkSession,
      dt: DataType,
      facts: Seq[Option[T]],
      bands: List[(Option[T], Option[T])]): Seq[(Long, String)] = {
    val factSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", dt, nullable = true)))
    val bandSchema = StructType(Seq(
      StructField("band", StringType, nullable = false),
      StructField("lo", dt, nullable = true),
      StructField("hi", dt, nullable = true)))
    val factRows = facts.zipWithIndex.map { case (v, i) => Row(i.toLong, v.orNull) }
    val bandRows = bands.zipWithIndex.map { case ((l, h), i) =>
      Row(s"b$i", l.orNull, h.orNull)
    }
    df(s, factRows, factSchema)
      .join(df(s, bandRows, bandSchema), col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("id"), col("band"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
  }

  for (seed <- 0 until nCases) {
    test(s"double bands case $seed: rewrite ≡ nested loop") {
      val bands = draw(bandsGen(dblBound), seed.toLong)
      val got = run(ext, DoubleType, factDoubles, bands)
      val want = run(spark, DoubleType, factDoubles, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"long bands case $seed: rewrite ≡ nested loop") {
      val bands = draw(bandsGen(lngBound), 1000L + seed)
      val got = run(ext, LongType, factLongs, bands)
      val want = run(spark, LongType, factLongs, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"timestamp bands case $seed: rewrite ≡ nested loop") {
      val bands = draw(bandsGen(tsBound), 2000L + seed)
      val got = run(ext, TimestampType, factTimestamps, bands)
      val want = run(spark, TimestampType, factTimestamps, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"grouped double bands case $seed: composite rewrite ≡ control") {
      val bands = draw(bandsGen(dblBound), 3000L + seed)
      val got = runGrouped(ext, DoubleType, factDoubles, bands)
      val want = runGrouped(spark, DoubleType, factDoubles, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"grouped long bands case $seed: composite rewrite ≡ control") {
      val bands = draw(bandsGen(lngBound), 4000L + seed)
      val got = runGrouped(ext, LongType, factLongs, bands)
      val want = runGrouped(spark, LongType, factLongs, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"large-band fallback, long case $seed: distributed rewrite ≡ control") {
      val bands = draw(bandsGen(lngBound), 5000L + seed)
      val got = run(extLarge, LongType, factLongs, bands)
      val want = run(spark, LongType, factLongs, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"large-band fallback, timestamp case $seed: distributed rewrite ≡ control") {
      val bands = draw(bandsGen(tsBound), 6000L + seed)
      val got = run(extLarge, TimestampType, factTimestamps, bands)
      val want = run(spark, TimestampType, factTimestamps, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"large-band fallback, grouped long case $seed: distributed rewrite ≡ control") {
      val bands = draw(bandsGen(lngBound), 7000L + seed)
      val got = runGrouped(extLarge, LongType, factLongs, bands)
      val want = runGrouped(spark, LongType, factLongs, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"large-band fallback, double case $seed: distributed rewrite ≡ control") {
      val bands = draw(bandsGen(dblBound), 8000L + seed)
      val got = run(extLarge, DoubleType, factDoubles, bands)
      val want = run(spark, DoubleType, factDoubles, bands)
      assert(got == want, s"bands=$bands")
    }
    test(s"large-band fallback, grouped double case $seed: distributed rewrite ≡ control") {
      val bands = draw(bandsGen(dblBound), 9000L + seed)
      val got = runGrouped(extLarge, DoubleType, factDoubles, bands)
      val want = runGrouped(spark, DoubleType, factDoubles, bands)
      assert(got == want, s"bands=$bands")
    }
  }

  test("double fallback fires on clean finite bands: Generate + no nested loop (plan-asserted)") {
    val bands = List(
      (Some(0.0), Some(100.0)), (Some(50.0), Some(250.5)),
      (Some(-300.25), Some(-10.0)), (Some(400.0), Some(401.0)))
    val factSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    val bandSchema = StructType(Seq(
      StructField("band", StringType, nullable = false),
      StructField("lo", DoubleType, nullable = true),
      StructField("hi", DoubleType, nullable = true)))
    val facts = factDoubles.zipWithIndex.map { case (v, i) => Row(i.toLong, v.orNull) }
    val bandRows = bands.zipWithIndex.map { case ((l, h), i) =>
      Row(s"b$i", l.orNull, h.orNull)
    }
    val joined = df(extLarge, facts, factSchema)
      .join(df(extLarge, bandRows, bandSchema),
        col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("id"), col("band"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"floating fallback must not plan a nested loop:\n$plan")
    assert(plan.contains("graft_band_bin"), s"bin key missing from plan:\n$plan")
    // NaN/Inf screen: one poisoned bound declines the WHOLE rewrite
    val poisoned = bands :+ (Some(Double.NaN), Some(1.0))
    val poisonedRows = poisoned.zipWithIndex.map { case ((l, h), i) =>
      Row(s"b$i", l.orNull, h.orNull)
    }
    val declined = df(extLarge, facts, factSchema)
      .join(df(extLarge, poisonedRows, bandSchema),
        col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("id"), col("band"))
    assert(!declined.queryExecution.executedPlan.toString.contains("graft_band_bin"),
      "a NaN band bound must decline the floating fallback")
  }
}
