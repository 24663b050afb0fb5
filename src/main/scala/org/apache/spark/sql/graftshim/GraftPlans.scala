package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Plan-level helpers for graft's optimizer rules.
  *
  * Lives under `org.apache.spark.sql` solely because
  * `SessionState.executePlan` is `private[sql]` — the standard shim
  * pattern for third-party optimizer extensions. No Spark internals are
  * modified.
  */
object GraftPlans {

  /** Execute an (analyzed) logical plan and return up to `n` rows.
    *
    * Used by [[graft.plans.BandJoinToBinned]] to materialize a SMALL
    * non-literal band side at planning time — the bounded-driver-read
    * equivalent of how broadcast joins materialize their build side,
    * moved to plan time so the band bounds are readable for bin-width
    * selection. `executeTake` fetches partitions incrementally, so the
    * cost is bounded by `n` rows even against a large input.
    */
  def executeTake(spark: SparkSession, plan: LogicalPlan, n: Int): Array[InternalRow] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.executePlan(plan).executedPlan.executeTake(n)
  }
}
