package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function inventory — SURVEY.md §2.5 (W1–W4).
  *
  * No window functions exist in the reference; its closest analogues are
  * the per-class exact-k sample (/root/reference/main.py:157-165) and the
  * cumulative-variance scan (main.py:288-320), both of which this family
  * generalizes.
  *
  * 100 TB posture: one shuffle on the partition key per window spec; all
  * specs in a query share the same (partitionBy, orderBy) so Catalyst
  * plans a single Window node after a single sort. Ordering always
  * carries a unique tie-break column (event_id / o_orderkey) — without
  * it, row_number/lag are nondeterministic across runs and partitions.
  */
object Windows {

  /** W1+W2+W3 — ranking (row_number/rank/dense_rank/ntile), analytic
    * (lag/lead), and a running frame-spec sum per user over event time.
    * The running sum accumulates in DECIMAL so the result is
    * order-exact and engine-independent (IEEE association varies).
    */
  def q19Window(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.events(spark, dir)
      .select(
        $"event_id", $"user_id",
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("quartile"),
        round(lag($"value", 1).over(w), 6).as("prev_value"),
        round(lead($"value", 1).over(w), 6).as("next_value"),
        sum($"value".cast("decimal(14,6)")).over(running)
          .cast("double").as("running_value"))
      .orderBy($"event_id")
  }

  /** W1/W2 completion — the distribution-rank family (dense_rank,
    * percent_rank, cume_dist) plus nth_value, the members q19/q20 don't
    * touch. Two window specs over the SAME partition key:
    *
    *  - the rank spec orders by a low-cardinality key (order year) ON
    *    PURPOSE, so ties exist and dense_rank genuinely collapses them
    *    (with a unique ordering it degenerates to row_number); rank
    *    functions are tie-deterministic, so the oracle hash still holds.
    *  - the nth_value spec orders uniquely (totalprice desc, orderkey)
    *    with an explicit ROWS running frame — nth_value READS a row, so
    *    under ties its result would be engine-dependent.
    *
    * percent_rank/cume_dist emit unrounded doubles: both engines divide
    * the same small integers ((rank−1)/(n−1), rows≤current/n), which is
    * IEEE-identical — no rounding needed, no tie risk.
    *
    * 100 TB posture: same partition key for both specs → ONE exchange,
    * two sorts (Catalyst cannot share the sort across different
    * orderings; the exchange is the expensive part).
    */
  def q65WindowDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byYear = Window.partitionBy($"o_orderpriority")
      .orderBy(year($"o_orderdate"))
    val byPrice = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Sources.orders(spark, dir)
      .select(
        $"o_orderkey", $"o_orderpriority",
        dense_rank().over(byYear).cast("int").as("drk"),
        percent_rank().over(byYear).as("prk"),
        cume_dist().over(byYear).as("cd"),
        nth_value($"o_orderkey", 2).over(byPrice).as("second_key"))
      .orderBy($"o_orderkey")
  }

  /** W4 — top-k per group: 3 highest-value orders per priority class,
    * deterministically tie-broken on the key. The filter on row_number
    * keeps the shuffle bounded to one window pass — never a self-join
    * against a per-group max.
    */
  def q20TopKGroup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Sources.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_orderpriority", $"rn", $"o_orderkey",
        round($"o_totalprice", 2).as("o_totalprice"))
      .orderBy($"o_orderpriority", $"rn")
  }
}
