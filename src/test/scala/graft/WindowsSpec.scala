package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-family unit tests (SURVEY §2.5) with hand-computed frames. */
class WindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    ("u1", 1, 10.0), ("u1", 2, 20.0), ("u1", 3, 30.0),
    ("u2", 1, 5.0), ("u2", 2, 15.0)).toDF("u", "seq", "v")

  test("row_number / rank / dense_rank with ties") {
    val t = Seq(("u", 1, 10.0), ("u", 2, 10.0), ("u", 3, 20.0)).toDF("u", "seq", "v")
    val w = Window.partitionBy($"u").orderBy($"v")
    val out = t.select($"seq",
      row_number().over(w.orderBy($"v", $"seq")).as("rn"),
      rank().over(w).as("rk"),
      dense_rank().over(w).as("dr"))
      .orderBy($"seq").as[(Int, Int, Int, Int)].collect()
    assert(out === Array((1, 1, 1, 1), (2, 2, 1, 1), (3, 3, 3, 2)))
  }

  test("lag/lead are null at partition edges") {
    val w = Window.partitionBy($"u").orderBy($"seq")
    val out = df.select($"u", $"seq",
      lag($"v", 1).over(w).as("prev"), lead($"v", 1).over(w).as("next"))
      .orderBy($"u", $"seq")
      .as[(String, Int, Option[Double], Option[Double])].collect()
    assert(out(0) === ("u1", 1, None, Some(20.0)))
    assert(out(2) === ("u1", 3, Some(20.0), None))
    assert(out(4) === ("u2", 2, Some(5.0), None))
  }

  test("running sum over rowsBetween unboundedPreceding") {
    val w = Window.partitionBy($"u").orderBy($"seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.select($"u", $"seq", sum($"v").over(w).as("rs"))
      .orderBy($"u", $"seq").as[(String, Int, Double)].collect()
    assert(out.map(_._3).toSeq === Seq(10.0, 30.0, 60.0, 5.0, 20.0))
  }

  test("rangeBetween frames group by value distance, not row distance") {
    val w = Window.partitionBy($"u").orderBy($"seq").rangeBetween(-1, 0)
    val out = df.select($"u", $"seq", sum($"v").over(w).as("rs"))
      .orderBy($"u", $"seq").as[(String, Int, Double)].collect()
    // u1: seq1=10, seq2=10+20, seq3=20+30
    assert(out.map(_._3).toSeq === Seq(10.0, 30.0, 50.0, 5.0, 20.0))
  }

  test("top-k per group returns exactly min(k, group size) rows") {
    val out = ops.Windows.q20TopKGroup(spark, "/root/testdata/sf0.001")
    val counts = out.groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    // sf0.001 has >=3 orders in every priority class
    assert(counts.values.forall(_ === 3))
  }

  test("distribution ranks: dense_rank collapses year ties; percent_rank/cume_dist bounded; nth_value runs") {
    val out = ops.Windows.q65WindowDist(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Int, Double, Double, Option[Long])].collect()
    val byPrio = out.groupBy(_._2)
    byPrio.values.foreach { rows =>
      val n = rows.length
      // dense ranks are contiguous 1..#distinct-years, far fewer than rows
      val drks = rows.map(_._3).distinct.sorted.toSeq
      assert(drks.head === 1 && drks === (1 to drks.max))
      assert(drks.max < n, "ordering by year must actually tie")
      // rank-based distributions stay in their defined ranges
      assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
      assert(rows.forall(r => r._5 > 0.0 && r._5 <= 1.0))
      // running nth_value: null only while fewer than 2 rows seen; the
      // global 2nd-by-price key eventually appears for every later row
      assert(rows.count(_._6.isEmpty) === 1)
    }
  }
}
