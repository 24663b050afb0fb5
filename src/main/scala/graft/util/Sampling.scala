package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators — SURVEY.md §2.2 P5/P6.
  *
  * P5 mirrors the reference's balanced per-class load
  * (/root/reference/main.py:157-165: `random.sample(files, limit)` with
  * limit = min class count); P6 mirrors the shuffled 85/15 split
  * (main.py:201-202).
  */
object Sampling {

  /** P5 — exact-k uniform sample per group: rank rows by a seeded
    * uniform draw within each group and keep the first k. One window
    * shuffle on the label; groups smaller than k are kept whole.
    * (`df.stat.sampleBy` is fraction-based and inexact — not sufficient
    * for the reference's balanced-load semantics.)
    */
  def stratifiedExactSample(df: DataFrame, labelCol: String, k: Int, seed: Long): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(col("__strat_r"))
    df.withColumn("__strat_r", rand(seed))
      .withColumn("__strat_rn", row_number().over(w))
      .filter(col("__strat_rn") <= k)
      .drop("__strat_r", "__strat_rn")
  }

  /** P5 composed with A2 — balance every class down to the global
    * minimum class size, the reference's exact balancing rule
    * (main.py:157-158).
    */
  def balanceToMinClass(df: DataFrame, labelCol: String, seed: Long): DataFrame = {
    val minCount = df.groupBy(col(labelCol)).count()
      .agg(min("count")).head().getLong(0)
    stratifiedExactSample(df, labelCol, minCount.toInt, seed)
  }

  /** P6 — seeded shuffled 85/15 split (Bernoulli per-partition sampling,
    * same semantics class as dask-ml's per-block split).
    */
  def split8515(df: DataFrame, seed: Long): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(0.85, 0.15), seed)
    (train, test)
  }

  /** P5 oracle query — exact-k sample per priority class, reduced to
    * per-group counts: WHICH rows are kept is seed/partitioning-local,
    * but the exact-k contract (`least(group size, k)` rows per group) is
    * engine-independent and DuckDB-checkable.
    */
  def q33StratSample(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val sampled = stratifiedExactSample(
      graft.ops.Sources.orders(spark, dir), "o_orderpriority", 10, 42L)
    sampled.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }
}
