package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming operators — SURVEY.md §2.10 (T1–T6) over `events`.
  *
  * Nothing in the reference is streaming (its closest analogue is the
  * out-of-core IncrementalPCA batching, /root/reference/main.py:279); this
  * family is [N] driver-contract surface.
  *
  * Design: each event-time transform is written once against a plain
  * DataFrame, so the SAME code runs on the static `events` parquet (where
  * it is DuckDB-oracle-checkable, q29/q30) and on `Sources.eventsStream`
  * / MemoryStream inputs (where watermark/late-data semantics are
  * verified by ScalaTest). That is the Structured Streaming contract:
  * batch and stream share one logical plan language.
  *
  * 100 TB posture: tumbling/session windows aggregate with partial
  * map-side combine and shuffle on (window, key); the watermark bounds
  * state. Sums accumulate in DECIMAL for order-independence.
  */
object Streaming {

  /** T1 — tumbling 1-hour windows per event type (works on batch and
    * streaming inputs alike).
    */
  def hourlyTypeAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"value".cast("decimal(14,6)")).cast("double").as("sum_value"))
  }

  /** T2 — sliding windows: 1-hour window advancing every 15 minutes. */
  def slidingTypeAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
  }

  /** T3 — session windows: per-user sessions closed by a 30-minute gap. */
  def sessionAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
  }

  /** T4 — watermarked stream variant of [[hourlyTypeAgg]]: late rows
    * beyond 10 minutes are dropped, state is bounded.
    */
  def hourlyTypeAggStream(events: DataFrame): DataFrame =
    hourlyTypeAgg(events.withWatermark("ts", "10 minutes"))

  /** T5 — streaming exact dedup on event_id within the watermark horizon.
    * MUST be dropDuplicatesWithinWatermark: plain dropDuplicates("event_id")
    * only evicts state when the event-time column is part of the dedup
    * key, so its per-key state would grow unboundedly forever despite
    * the watermark — an OOM at stream scale, not a semantics choice.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** T5 — arbitrary stateful processing: running per-user event counts
    * via flatMapGroupsWithState (update mode, unbounded keys kept —
    * production would add a timeout to bound state).
    */
  def runningUserCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }.toDF("user_id", "n_events")
  }

  /** T6 — stream-static join: enrich events with a broadcastable static
    * dimension on user_id.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim(key), "inner")

  /** J7 (streaming variant, SURVEY §2.3) — stream-stream interval join:
    * each click matches the same user's views within
    * `[click_ts − lookback, click_ts]`, watermarked on BOTH sides.
    *
    * State posture: the interval condition plus the two watermarks give
    * Spark a state watermark for each side — buffered views older than
    * `watermark` and clicks that can no longer match are evicted, so
    * join state is bounded by (rate × (delay + lookback)), not by the
    * stream length. Inner matches emit immediately (append mode).
    */
  def clickViewIntervalJoin(clicks: DataFrame, views: DataFrame,
      lookback: String = "10 minutes", delay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.select(
        col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val v = views.select(
        col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
      .withWatermark("view_ts", delay)
    // joinType "left_outer" emits unmatched clicks null-padded once
    // both watermarks close their match window (outer results cannot
    // emit earlier — a matching view might still arrive)
    c.join(v,
        c("user_id") === v("v_user_id") &&
        v("view_ts") >= c("click_ts") - expr(s"INTERVAL $lookback") &&
        v("view_ts") <= c("click_ts"),
        joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"), col("view_value"))
  }

  /** J7-streaming batch-oracle query — the SAME [[clickViewIntervalJoin]]
    * code on the static events table (`withWatermark` is a no-op in
    * batch), so the interval-join semantics the streaming tests pin are
    * ALSO hash-checked against a plain SQL join oracle. Timestamps
    * emitted as epoch µs.
    */
  def q44IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Sources.events(spark, dir)
    val out = clickViewIntervalJoin(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "view"))
    out.select(
        $"click_id", $"user_id",
        unix_micros($"click_ts").as("click_ts_us"),
        $"view_id",
        unix_micros($"view_ts").as("view_ts_us"),
        round($"view_value", 6).as("view_value"))
      .orderBy($"click_id", $"view_id")
  }

  /** T1 batch-oracle query — hourly tumbling windows on the static
    * events table, window start emitted as epoch µs so the DuckDB
    * time_bucket oracle compares exactly.
    */
  def q29TimeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hourlyTypeAgg(Sources.events(spark, dir))
      .select(
        unix_micros($"window.start").as("hour_start_us"),
        $"event_type", $"n", round($"sum_value", 6).as("sum_value"))
      .orderBy($"hour_start_us", $"event_type")
  }

  /** T2 batch-oracle query — sliding 1-hour windows advancing every 15
    * minutes: each event lands in 4 windows. The oracle reproduces the
    * window assignment by generating the 4 candidate starts per event.
    */
  def q41Sliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    slidingTypeAgg(Sources.events(spark, dir))
      .select(
        unix_micros($"window.start").as("win_start_us"),
        $"event_type", $"n")
      .orderBy($"win_start_us", $"event_type")
  }

  /** T3 batch-oracle query — per-user 30-minute-gap sessions on the
    * static events table; the oracle reproduces session semantics with a
    * gaps-and-islands window SQL. Emits session start/end as epoch µs.
    */
  def q30Session(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.events(spark, dir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(14,6)")).cast("double").as("sum_value"))
      .select(
        $"user_id",
        unix_micros($"session_window.start").as("sess_start_us"),
        $"n_events", round($"sum_value", 6).as("sum_value"))
      .orderBy($"user_id", $"sess_start_us")
  }
}
