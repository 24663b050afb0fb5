package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) table layout — the co-located-join story at
  * 100 TB, promoted from test-only (`BucketingSpec`) to an oracled query.
  *
  * A fact⋈fact join on a high-cardinality key shuffles BOTH sides every
  * time it runs. Bucketing pays that shuffle ONCE at write time: both
  * tables hash-partitioned into the same bucket count on the join key
  * (plus in-bucket sort), after which every join on that key is
  * Exchange-free — each task zips bucket i with bucket i. On a
  * 1000-executor cluster this turns the recurring O(data) network cost
  * of the orders⋈lineitem backbone into a one-time layout decision;
  * it is the same trade Hive/Iceberg bucketed tables and Spark's own
  * `spark.sql.sources.bucketing` make.
  *
  * No reference analogue (the reference has no joins at all) — this is
  * SURVEY §2 scale posture surface.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted EXTERNAL table (explicit parquet
    * location) in the session catalog, replacing any previous version.
    * `saveAsTable` is required — bucket metadata lives in the catalog,
    * plain `parquet(path)` writes would lose it.
    *
    * The pre-write `repartition(buckets, key)` kills write
    * amplification: bucket id and HashPartitioning use the SAME
    * murmur3-pmod function, so partition i holds exactly bucket i and
    * each task writes ONE file — without it every input task writes a
    * sliver of every bucket (tasks × buckets small files; 512 here,
    * arbitrarily many at 100 TB).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.repartition(buckets, col(key))
      .write
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** ORACLED exercise (q101): bucket orders and lineitem by the join key
    * (16 buckets), then run the revenue-per-priority backbone join over
    * the BUCKETED tables. The merge hint pins sort-merge (so the plan is
    * the bucketed no-Exchange SMJ at every scale factor, never a
    * broadcast that would mask the layout); `BucketingSpec` asserts the
    * Exchange-free plan, the oracle checks the numbers. Bucket files go
    * to a fresh temp dir per invocation; the catalog entry is replaced.
    */
  def q101BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-q101")
    writeBucketed(graft.ops.Sources.orders(spark, dir), "graft_q101_orders",
      s"$base/orders", "o_orderkey", 16)
    writeBucketed(graft.ops.Sources.lineitem(spark, dir), "graft_q101_lineitem",
      s"$base/lineitem", "l_orderkey", 16)
    val price = $"l_extendedprice".cast("decimal(12,2)")
    val disc  = $"l_discount".cast("decimal(3,2)")
    spark.table("graft_q101_lineitem").hint("merge")
      .join(spark.table("graft_q101_orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        round(sum(price * (lit(1) - disc)), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }
}
