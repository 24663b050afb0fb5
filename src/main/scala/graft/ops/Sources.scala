package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8 parquet loaders for the driver testdata star schema (TESTDATA.md).
  *
  * Design note (100 TB posture): loads are plain `spark.read.parquet` —
  * the vectorized reader gives predicate pushdown + column pruning for
  * free, so every downstream filter/projection reaches the scan. No
  * schema inference cost: parquet footers self-describe; the streaming
  * source (S9) probes the footer once for its mandatory explicit schema.
  *
  * Reference analogue: the reference stages everything through driver
  * RAM (np.vstack, /root/reference/main.py:169); here every table is a
  * distributed scan from the first operator.
  */
object Sources {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The events fixture's `ts` physical type has changed across driver
    * regenerations (parquet timestamp[ns] originally, timestamp[us] /
    * TIMESTAMP_NTZ now), so the loader dispatches on the type that
    * actually arrives rather than assuming one encoding. All downstream
    * event-time logic (windows, watermarks, as-of joins, oracle SQL)
    * operates on the normalized µs [[TimestampType]] column.
    */
  def events(spark: SparkSession, d: String): DataFrame =
    normalizeEventTime(table(spark, d, "events"))

  /** Dtype-adaptive `ts` normalization to session-zone `TimestampType`:
    *
    *  - `LongType`: raw nanoseconds — either a plain int64 column, or a
    *    parquet timestamp[ns] read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (without that conf a
    *    ns-typed file fails at analysis with [PARQUET_TYPE_ILLEGAL], so
    *    reaching LongType means the session was already configured).
    *    Converted via the exact floored ns→µs division.
    *  - `TimestampNTZType`: parquet timestamp[us] without UTC adjustment
    *    (the current fixture). Cast to `TimestampType`; sessions run with
    *    `spark.sql.session.timeZone=UTC` (Bench/Verify), so the cast is
    *    instant-preserving and matches DuckDB's naive-timestamp oracle.
    *  - `TimestampType`: already the engine's event-time type — passthrough.
    */
  def normalizeEventTime(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType           => df.withColumn("ts", nanosToTimestamp(col("ts")))
      case TimestampNTZType   => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType      => df
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported type $other; expected int64 nanos, " +
          "timestamp_ntz, or timestamp")
    }

  /** Floored ns→µs conversion, exact on longs. `pmod` makes the value an
    * exact multiple of 1000 (floor semantics even pre-epoch), and integer
    * `div` keeps the math in longs — Column `/` is DOUBLE division, whose
    * 53-bit mantissa cannot represent epoch nanoseconds (~1.7e18) and
    * silently rounds the low microsecond digit.
    */
  def nanosToTimestamp(ns: Column): Column =
    timestamp_micros(call_function("div", ns - pmod(ns, lit(1000L)), lit(1000L)))

  /** Typed row for the `events` table — the `Dataset[T]` boundary from
    * SURVEY §1.4 (rows are self-describing; no positional alignment like
    * the reference's parallel label array, /root/reference/main.py:168-171).
    */
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Typed events view. Note the trade-off documented in SURVEY §1.4:
    * typed lambdas (`ds.filter(_.event_type == ...)`) are opaque to
    * Catalyst (no pushdown), so the DataFrame surface stays the default;
    * the typed boundary is for case-class-shaped application logic.
    */
  def eventsDs(spark: SparkSession, d: String): org.apache.spark.sql.Dataset[Event] = {
    import spark.implicits._
    events(spark, d).as[Event]
  }

  /** S9: events as an unbounded stream (file source), ts normalized to
    * TimestampType so watermarks/windows work unchanged.
    *
    * `readStream` requires an explicit schema; rather than hardcoding one
    * (which silently rotted when the fixture's physical type changed),
    * probe the on-disk schema from the parquet footer — a driver-side
    * metadata read, no data scan — and normalize through the same
    * dtype dispatch as the batch loader.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val onDisk = spark.read.parquet(s"$dir/events.parquet").schema
    // The streaming file source monitors a DIRECTORY; events.parquet is a
    // single file, so stream the sf dir with a glob pinned to it.
    normalizeEventTime(
      spark.readStream.schema(onDisk)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir))
  }
}
