package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Explicit schema for the `events` table — required by the streaming
    * file source (S9): `spark.readStream` cannot infer schemas.
    * NB: parquet stores ts as timestamp[ns]; Spark reads µs precision.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** S9: events as an unbounded stream (file source). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .parquet(s"$dir/events.parquet")
}
