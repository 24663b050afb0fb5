package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation — the salting pattern from the builder brief's 100 TB
  * posture (AQE's skew-join split handles sort-merge joins
  * automatically; explicit salting is the tool when a hot key must be
  * spread BEFORE an aggregation or a shuffled join).
  */
object Skew {

  /** Skew-resilient equi-join: the large side is salted with a seeded
    * uniform salt in [0, salts); the small side is replicated across all
    * salt values (explode of a literal range — rows × salts, acceptable
    * when `small` is dimension-sized). The hot key's rows then spread
    * over `salts` reducers instead of one.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int,
      seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = large.withColumn("__salt", (rand(seed) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Phase 1 of [[saltedCount]]: per-(key, salt) partial counts — the
    * spread stage, exposed so tests can assert the implementation
    * actually splits a hot key (not a re-derived copy of the salting).
    */
  def saltedPartials(df: DataFrame, key: String, salts: Int, seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__salt", (rand(seed) * salts).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
  }

  /** Two-phase skew-resilient aggregation: count per (key, salt) first
    * (spreading a hot key over `salts` partial groups), then combine the
    * partials. Identical result to a direct groupBy-count.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int, seed: Long = 42L): DataFrame =
    saltedPartials(df, key, salts, seed)
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))

  /** Skew demo query (ORACLED) — [[saltedCount]] over `l_returnflag`,
    * a GENUINELY hot key (3 distinct values across all of lineitem: at
    * 100 TB a plain groupBy funnels ~33 TB through single reducers; the
    * salt spreads each flag over 32 partial groups first). The salt is
    * internal, so the result — and therefore the DuckDB oracle — is the
    * plain GROUP BY count.
    */
  def q50SaltedAgg(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    saltedCount(graft.ops.Sources.lineitem(spark, dir), "l_returnflag", salts = 32)
      .orderBy($"l_returnflag")
  }

  /** Skew demo query (ORACLED) — [[saltedJoin]] of orders against the
    * customer dimension on custkey, aggregated to revenue per market
    * segment. The dimension is replicated `salts`× (dimension-sized, so
    * cheap) while each hot custkey's fact rows spread over `salts`
    * reducers. Result is identical to the unsalted join — the oracle is
    * the plain SQL join. Money sums in DECIMAL for hash stability.
    */
  def q51SaltedJoin(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = graft.ops.Sources.orders(spark, dir)
      .select($"o_custkey".as("custkey"), $"o_totalprice")
    val cust = graft.ops.Sources.customer(spark, dir)
      .select($"c_custkey".as("custkey"), $"c_mktsegment")
    saltedJoin(orders, cust, "custkey", salts = 8)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("revenue"))
      .orderBy($"c_mktsegment")
  }
}
