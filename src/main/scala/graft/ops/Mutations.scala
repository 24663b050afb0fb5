package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-style frame mutations — the maintenance half of a warehouse:
  * upsert (update-else-insert) for dimension refresh. The reference has
  * no mutation story (its pipeline is read-only), but no user can
  * switch an end-to-end workload without one; Delta/Iceberg spell it
  * `MERGE INTO`, and on plain frames the same semantics are ONE
  * full-outer join on the key — a single shuffle, no driver loop, which
  * is the 100 TB shape (broadcast the updates side instead when it is
  * dim-sized; the planner picks that up from AQE stats or a
  * `broadcast()` hint on `updates`).
  */
object Mutations {

  /** Row-wise upsert: rows of `updates` whose key matches a `base` row
    * REPLACE it column-wise (MERGE's `UPDATE SET *` — an intentional
    * null in the update row wins, which per-column `coalesce` would
    * silently un-update); unmatched update rows insert; unmatched base
    * rows persist. Both frames must share `base`'s schema. Null-safe
    * key comparison, so null-keyed rows pair instead of duplicating.
    *
    * `updates` must hold at most one row per key — enforce upstream
    * (e.g. latest-wins dedup) — otherwise a matched base row fans out,
    * which is the same constraint Delta's MERGE errors on.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(base.columns.toSeq == updates.columns.toSeq,
      s"schemas must match: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val b = base.alias("b")
    // the presence flag decides row-wise which side wins; lit(1) is
    // never null, so isNotNull == "an update row matched"
    val u = updates.withColumn("__upd", lit(1)).alias("u")
    val cond = keys.map(k => col(s"b.$k") <=> col(s"u.$k")).reduce(_ && _)
    val merged = b.join(u, cond, "full_outer")
    val out = base.columns.toSeq.map { c =>
      when(col("u.__upd").isNotNull, col(s"u.$c"))
        .otherwise(col(s"b.$c")).as(c)
    }
    merged.select(out: _*)
  }

  /** ORACLED exercise (q81): refresh the customer dim — every 10th
    * customer gets a balance bump + segment reclass (update arm), and
    * every 97th spawns a shifted-key clone (insert arm) — then roll up
    * the merged dim per segment. DuckDB reproduces the merge with the
    * same full-outer-join + presence-flag CASE.
    */
  def q81Upsert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = Sources.customer(spark, dir)
    val cols = base.columns.map(col).toSeq
    val updArm = base.filter($"c_custkey" % 10 === 0)
      .withColumn("c_acctbal", $"c_acctbal" + 1000.0)
      .withColumn("c_mktsegment", lit("UPGRADED"))
    val insArm = base.filter($"c_custkey" % 97 === 0)
      .withColumn("c_custkey", $"c_custkey" + 1000000)
      .withColumn("c_mktsegment", lit("NEW"))
    val updates = updArm.unionByName(insArm).select(cols: _*)
    upsert(base, updates, Seq("c_custkey"))
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"c_acctbal".cast("decimal(12,2)")), 2)
          .cast("double").as("segment_bal"))
      .orderBy($"c_mktsegment")
  }
}
