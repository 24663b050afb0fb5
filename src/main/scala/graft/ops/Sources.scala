package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S8 parquet loaders for the driver testdata star schema (TESTDATA.md).
  *
  * Design note (100 TB posture): loads are plain `spark.read.parquet` —
  * the vectorized reader gives predicate pushdown + column pruning for
  * free, so every downstream filter/projection reaches the scan. No
  * schema inference cost: parquet footers self-describe; `eventsSchema`
  * is declared explicitly only for the streaming source (S9), which
  * requires a user-supplied schema.
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

  /** The events fixture stores `ts` as parquet timestamp[ns], which
    * Spark 4.x rejects at analysis time ([PARQUET_TYPE_ILLEGAL]) unless
    * `spark.sql.legacy.parquet.nanosAsLong=true` — under that conf the
    * column arrives as LongType nanoseconds. The conf must be set at
    * session construction (a table loader silently flipping a
    * session-wide legacy flag would change how every later parquet read
    * treats ns timestamps); [[requireNanosConf]] fails fast if it isn't.
    * Nanos convert to a proper µs TimestampType via floored division
    * (`pmod` keeps it exact on longs and correct for pre-epoch values,
    * where `div` would round up). All downstream event-time logic
    * (windows, watermarks, oracle SQL at date_trunc granularity)
    * operates at µs or coarser, so the truncation is lossless for every
    * query in the inventory.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    requireNanosConf(spark)
    table(spark, d, "events").withColumn("ts", nanosToTimestamp(col("ts")))
  }

  /** Floored ns→µs conversion, exact on longs. `pmod` makes the value an
    * exact multiple of 1000 (floor semantics even pre-epoch), and integer
    * `div` keeps the math in longs — Column `/` is DOUBLE division, whose
    * 53-bit mantissa cannot represent epoch nanoseconds (~1.7e18) and
    * silently rounds the low microsecond digit.
    */
  def nanosToTimestamp(ns: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros(call_function("div", ns - pmod(ns, lit(1000L)), lit(1000L)))

  private def requireNanosConf(spark: SparkSession): Unit =
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet stores ts as timestamp[ns]: set " +
        "spark.sql.legacy.parquet.nanosAsLong=true at SparkSession build " +
        "(see Verify/Bench) before loading the events table")

  /** Explicit schema for the `events` table as stored on disk — required
    * by the streaming file source (S9): `spark.readStream` cannot infer
    * schemas. `ts` is LongType (raw nanos, see [[events]]); callers get
    * the converted µs timestamp from [[eventsStream]].
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

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

  /** S9: events as an unbounded stream (file source), ts converted to
    * TimestampType so watermarks/windows work unchanged.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    requireNanosConf(spark)
    // The streaming file source monitors a DIRECTORY; events.parquet is a
    // single file, so stream the sf dir with a glob pinned to it.
    spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", nanosToTimestamp(col("ts")))
  }
}
