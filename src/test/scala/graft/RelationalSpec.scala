package graft

import org.apache.spark.sql.functions._

/** Unit tests for the relational families (SURVEY §2.2/§2.4/§2.6/§2.7/
  * §2.9) on tiny literal DataFrames with hand-computed expectations.
  */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  test("set ops: union/intersect/except SQL semantics with duplicates") {
    val a = Seq(1, 1, 2, 3).toDF("x")
    val b = Seq(2, 2, 4).toDF("x")
    // Dataset.union is UNION ALL; SQL UNION dedups
    assert(a.union(b).count() === 7)
    assert(a.union(b).distinct().as[Int].collect().sorted === Array(1, 2, 3, 4))
    assert(a.intersect(b).as[Int].collect() === Array(2))
    assert(a.except(b).as[Int].collect().sorted === Array(1, 3))
  }

  test("rollup emits per-group, subtotal, and grand-total rows with grouping ids") {
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3)).toDF("g1", "g2", "v")
    val out = df.rollup($"g1", $"g2")
      .agg(sum($"v").as("s"),
        grouping($"g1").cast("int").as("i1"),
        grouping($"g2").cast("int").as("i2"))
      .collect()
    assert(out.length === 6) // 3 leaves + 2 subtotals + 1 grand total
    val grand = out.find(r => r.getInt(3) == 1 && r.getInt(4) == 1).get
    assert(grand.getLong(2) === 6L)
    val aSub = out.find(r => r.getString(0) == "a" && r.getInt(4) == 1).get
    assert(aSub.getLong(2) === 3L)
  }

  test("cube adds the per-g2 slices rollup lacks") {
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3)).toDF("g1", "g2", "v")
    val cube = df.cube($"g1", $"g2").agg(sum($"v").as("s")).collect()
    assert(cube.length === 8) // 3 leaves + 2 g1 subtotals + 2 g2 slices + 1 grand
    val xSlice = cube.find(r => r.isNullAt(0) && !r.isNullAt(1) && r.getString(1) == "x").get
    assert(xSlice.getLong(2) === 4L)
  }

  test("q2 rounding regression: half-way products round in exact decimal, not IEEE") {
    // 123.25 * (1 - 0.06) = 115.855 exactly in decimal; the IEEE double
    // product is 115.85499999999999 and would round DOWN. The decimal
    // path (used by q2/q1) must round HALF_UP to 115.86.
    val out = Seq((123.25, 0.06)).toDF("price", "disc")
      .select(round($"price".cast("decimal(12,2)") *
        (lit(1) - $"disc".cast("decimal(3,2)")), 2).cast("double").as("p"))
      .head().getDouble(0)
    assert(out === 115.86)
    val naive = Seq((123.25, 0.06)).toDF("price", "disc")
      .select(round($"price" * (lit(1.0) - $"disc"), 2).as("p"))
      .head().getDouble(0)
    assert(naive === 115.85) // documents exactly why the decimal path exists
  }

  test("approx_percentile at max accuracy returns exact quartiles (A3, VERDICT item 9)") {
    val df = (1 to 100).toDF("v")
    val Array(p25, p50, p75) = df
      .select(percentile_approx($"v", array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)))
      .head().getSeq[Int](0).toArray
    assert(p25 === 25 && p50 === 50 && p75 === 75)
  }

  test("JSON extraction returns null on malformed and missing keys") {
    val df = Seq("""{"k": 7}""", """not json""", """{"other": 1}""", null)
      .toDF("props")
      .select(get_json_object($"props", "$.k").cast("int").as("k"))
    assert(df.as[Option[Int]].collect().toSeq === Seq(Some(7), None, None, None))
  }

  test("date functions: year/quarter/datediff edge cases") {
    val df = Seq("2024-12-31", "2024-01-01").toDF("d")
      .select($"d".cast("date").as("d"))
      .select(year($"d").as("y"), quarter($"d").as("q"),
        datediff(lit("2025-01-01").cast("date"), $"d").as("dd"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.contains((2024, 4, 1)))
    assert(rows.contains((2024, 1, 366))) // 2024 is a leap year
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = ops.Relational.q6TopK(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q1 pushes the shipdate filter to the parquet scan") {
    val plan = ops.Relational.q1Pricing(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q54 approx quantiles bound the exact per-group quartiles (A3 scale path)") {
    val dir = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) = r.getString(0)
    val exact = ops.Relational.q48GroupPercentiles(spark, dir).collect()
      .map(r => key(r) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val approx = ops.Relational.q54ApproxQuantiles(spark, dir).collect()
      .map(r => key(r) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (a25, a50, a75, ap)) =>
      val (e25, e50, e75, ep) = exact(k)
      // GK rank error ≤ n/accuracy; quantity is integer-valued 1..50 so
      // a 1-unit value band is generous, price within 2% relative
      assert(math.abs(a25 - e25) <= 1.0 && math.abs(a50 - e50) <= 1.0 &&
        math.abs(a75 - e75) <= 1.0, s"group $k quantity quartiles drifted")
      assert(math.abs(ap - ep) / ep <= 0.02, s"group $k price median drifted")
    }
  }
}
