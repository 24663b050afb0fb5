package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Time-series gap fill + trailing range-frame tests on handcrafted
  * frames where every expected value is known by construction.
  */
class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("gap fill emits every hour slot and zero-counts the gaps") {
    // user 1: events at 00h and 03h -> 01h/02h are gaps
    // user 2: one event at 01h -> 00h leading gap, 02h/03h trailing gaps
    val ev = Seq(
      (1L, ts("2024-01-01 00:10:00"), 2.0),
      (1L, ts("2024-01-01 00:20:00"), 3.0),
      (1L, ts("2024-01-01 03:05:00"), 7.0),
      (2L, ts("2024-01-01 01:30:00"), 11.0))
      .toDF("user_id", "ts", "value")
    val out = ops.TimeSeries.hourlyGapFill(ev)
      .select($"user_id", hour($"hour").as("h"), $"n", $"ffill_value")
      .as[(Long, Int, Long, Option[Double])].collect()
      .map { case (u, h, n, f) => (u, h) -> ((n, f)) }.toMap
    assert(out.size === 8) // 2 users x 4 hour slots (00..03)
    assert(out((1L, 0)) === ((2L, Some(5.0))))   // 2 events, sum 5
    assert(out((1L, 1)) === ((0L, Some(5.0))))   // gap: forward-filled
    assert(out((1L, 2)) === ((0L, Some(5.0))))
    assert(out((1L, 3)) === ((1L, Some(7.0))))   // new observation wins
    assert(out((2L, 0)) === ((0L, None)))        // before first event: null
    assert(out((2L, 1)) === ((1L, Some(11.0))))
    assert(out((2L, 3)) === ((0L, Some(11.0))))  // trailing fill persists
  }

  test("trailing hour frame is inclusive at exactly -1h and drops beyond") {
    val ev = Seq(
      (10L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (11L, 1L, ts("2024-01-01 01:00:00"), 2.0),  // exactly 1h later: peer kept
      (12L, 1L, ts("2024-01-01 02:00:01"), 4.0),  // 1h+1s after #11: both #10 and #11 aged out
      (13L, 2L, ts("2024-01-01 00:30:00"), 8.0))  // other user: isolated
      .toDF("event_id", "user_id", "ts", "value")
    val out = ops.TimeSeries.trailingHour(ev)
      .select($"event_id", $"n_1h", $"sum_1h")
      .as[(Long, Long, Double)].collect()
      .map { case (e, n, s) => e -> ((n, s)) }.toMap
    assert(out(10L) === ((1L, 1.0)))
    assert(out(11L) === ((2L, 3.0))) // -1h boundary inclusive: #10 is exactly 1h back
    assert(out(12L) === ((1L, 4.0))) // 1s beyond the boundary: frame holds only itself
    assert(out(13L) === ((1L, 8.0))) // partitioned per user
  }

  test("trailing frame counts identical-timestamp peers symmetrically") {
    val t = ts("2024-01-01 00:00:00")
    val ev = Seq(
      (1L, 1L, t, 1.0), (2L, 1L, t, 2.0), (3L, 1L, t, 4.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = ops.TimeSeries.trailingHour(ev)
      .select($"event_id", $"n_1h", $"sum_1h")
      .as[(Long, Long, Double)].collect()
    // RANGE frame: all three are peers of each other — every row sees all
    assert(out.forall { case (_, n, s) => n === 3L && s === 7.0 })
  }

  test("q68 output covers users x observed hour range exactly") {
    val dir = "/root/testdata/sf0.001"
    val ev = ops.Sources.events(spark, dir)
    val nUsers = ev.select($"user_id").distinct().count()
    val hours = ev.agg(
      (floor(unix_micros(date_trunc("hour", max($"ts"))) / 3600e6) -
        floor(unix_micros(date_trunc("hour", min($"ts"))) / 3600e6) + 1)
        .cast("long")).head().getLong(0)
    val out = ops.TimeSeries.q68GapFill(spark, dir)
    assert(out.count() === nUsers * hours)
    // total event count is preserved through the fill
    assert(out.agg(sum($"n")).head().getLong(0) === ev.count())
  }
}
