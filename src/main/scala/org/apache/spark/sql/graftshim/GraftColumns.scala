package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import graft.expressions.{CosineSimilarity, WinnowFingerprints}

/** Column wrappers for graft's custom Catalyst expressions.
  *
  * Lives under `org.apache.spark.sql` solely because Spark 4's
  * Column↔Expression bridge (`classic.ExpressionUtils`) is
  * `private[sql]` — the standard shim pattern for third-party
  * expression libraries. No Spark internals are modified.
  */
object GraftColumns {

  /** Fused single-pass cosine similarity of two array<double> columns
    * (see [[graft.expressions.CosineSimilarity]]).
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Winnowing fingerprints of a string column — sorted distinct
    * window-minima of a rolling k-gram hash (see
    * [[graft.expressions.WinnowFingerprints]]).
    */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(c), k, w))

  /** True when the session's CacheManager holds no cached plans — the
    * test probe for "no persist outlives its query" (the CacheManager is
    * `private[sql]`, hence exposed through this shim).
    */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
