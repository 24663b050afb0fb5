package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completion operators over `events` — gap filling against a
  * generated spine and trailing time-range window frames. [N]
  * driver-contract surface (the reference has no event-time data at all;
  * its closest analogue is the positional batch iteration at
  * /root/reference/main.py:330-341).
  *
  * 100 TB posture:
  *  - Gap fill joins the hourly PRE-AGGREGATE (map-side combined, one
  *    shuffle on (user_id, hour)) against a spine that is |users| ×
  *    |hours| rows — the spine is generated distributed (explode of a
  *    bounded `sequence` per user row, never a driver loop) and is the
  *    inherent output size of the operator, not a blow-up. The
  *    forward-fill is ONE additional window pass sharing the user_id
  *    partitioning.
  *  - The trailing window uses a RANGE frame on epoch-µs longs: Spark
  *    keeps a sliding aggregate buffer per partition — cost is O(rows),
  *    never O(rows × frame width) — and the DECIMAL sum makes the
  *    result independent of the within-frame accumulation order.
  */
object TimeSeries {

  /** Hourly per-user gap fill: every (user, hour) slot in the observed
    * global range gets a row; missing slots carry n=0 and the
    * forward-filled last known hourly sum. Core of [[q68GapFill]],
    * parameterized over any (user_id, ts, value) frame for tests.
    */
  def hourlyGapFill(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val hourly = events
      .groupBy($"user_id", date_trunc("hour", $"ts").as("hour"))
      .agg(
        count(lit(1)).as("n"),
        sum($"value".cast("decimal(14,6)")).cast("double").as("sum_value"))
    // Global observed range (2-value aggregate, broadcast as 1 row) ×
    // distinct users → the spine. sequence() explodes per user row on
    // executors; the driver never materializes the hour list.
    val bounds = events.agg(
      date_trunc("hour", min($"ts")).as("lo"),
      date_trunc("hour", max($"ts")).as("hi"))
    val spine = events.select($"user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select($"user_id",
        explode(sequence($"lo", $"hi", expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy($"user_id").orderBy($"hour")
    spine.join(hourly, Seq("user_id", "hour"), "left")
      .select(
        $"user_id", $"hour",
        coalesce($"n", lit(0L)).as("n"),
        last($"sum_value", ignoreNulls = true).over(w).as("ffill_value"))
  }

  /** Gap-fill + forward-fill, ORACLED: hour slots as epoch µs, filled
    * counts exact, forward-filled hourly sums from DECIMAL accumulation
    * (round 6 on the identical IEEE double both engines carry).
    */
  def q68GapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hourlyGapFill(Sources.events(spark, dir))
      .select(
        $"user_id",
        unix_micros($"hour").as("hour_us"),
        $"n",
        round($"ffill_value", 6).as("ffill_value"))
      .orderBy($"user_id", $"hour_us")
  }

  /** Trailing-hour window per event: how many events (and how much
    * value) the same user produced in `[ts − 1h, ts]`, inclusive. RANGE
    * frame on epoch-µs longs — peers with the identical timestamp are in
    * each other's frame on every engine, so ties cannot break parity.
    * Core of [[q70TrailingWindow]].
    */
  def trailingHour(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-3600000000L, 0L)
    events
      .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"), $"value")
      .select(
        $"event_id", $"user_id", $"ts_us",
        count(lit(1)).over(w).as("n_1h"),
        sum($"value".cast("decimal(14,6)")).over(w)
          .cast("double").as("sum_1h"))
  }

  /** Trailing time-range frame, ORACLED (W3 time-based completion: q19's
    * running frames are ROWS-based; this is the event-time RANGE form
    * real rate/velocity features use).
    */
  def q70TrailingWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    trailingHour(Sources.events(spark, dir))
      .select($"event_id", $"user_id", $"ts_us", $"n_1h",
        round($"sum_1h", 6).as("sum_1h"))
      .orderBy($"event_id")
  }
}
