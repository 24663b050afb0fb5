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

  /** Streaming CDC-apply sink: maintain a parquet dimension under a
    * change-data stream by upserting each micro-batch (`foreachBatch` +
    * [[upsert]]). Within a batch, the LAST change per key wins
    * (micro-batches arrive ordered, rows inside one are deduped here by
    * the stream's `seqCol`), satisfying upsert's one-row-per-key
    * precondition.
    *
    * Write protocol: stage the merged dim next to the target, then
    * swap directories. The swap is not atomic across failures — a
    * crash between delete and rename loses the window (the checkpoint
    * replays the batch on restart, which re-merges idempotently
    * because upsert is idempotent for identical input). Production
    * targets a transactional table format; the ENGINE pattern — batch
    * mutation operators reused verbatim under Structured Streaming —
    * is what this sink demonstrates.
    */
  def streamingUpsertSink(changes: DataFrame, dimPath: String,
      keys: Seq[String], seqCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(seqCol).desc)
        val latest = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", seqCol)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val target = new org.apache.hadoop.fs.Path(dimPath)
        val staging = new org.apache.hadoop.fs.Path(dimPath + ".staging")
        val merged =
          if (fs.exists(target)) upsert(spark.read.parquet(dimPath), latest, keys)
          else latest
        merged.write.mode("overwrite").parquet(staging.toString)
        if (fs.exists(target)) fs.delete(target, true)
        fs.rename(staging, target)
        ()
      }
      .start()
  }

  /** SCD type-2 apply: fold a change feed into a validity-window dim.
    *
    * `dim` rows carry `(key, attrs…, valid_from, valid_to)` with
    * `valid_to` NULL for the open (current) version; `changes` carry
    * `(key, attrs…, tsCol)` — a full attribute snapshot per change.
    * Each change becomes a new version valid from its timestamp until
    * the key's NEXT change (`lead` over the change feed); the dim's
    * open version closes at the key's FIRST change. Keys without
    * changes persist untouched. Precondition (documented, same as any
    * warehouse SCD-2 loader): change timestamps are later than the open
    * version's `valid_from`; at most one change per (key, ts).
    *
    * Shuffle shape at 100 TB: one window pass over `changes`
    * partitioned by key, one left join of `dim` against the per-key
    * first-change (aggregated — dim-sized, broadcastable), one union.
    * No driver loop, no per-version iteration.
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, key: String,
      tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val attrs = dim.columns.filterNot(c =>
      c == key || c == "valid_from" || c == "valid_to").toSeq
    require(changes.columns.toSet == (Set(key, tsCol) ++ attrs),
      s"changes must carry ($key, $tsCol, ${attrs.mkString(", ")})")
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol))
    val newVersions = changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .drop(tsCol)
      .select(dim.columns.map(col).toSeq: _*)
    val firstChange = changes.groupBy(col(key))
      .agg(min(col(tsCol)).as("__first_change"))
    val closed = dim.join(firstChange, Seq(key), "left")
      .withColumn("valid_to",
        when(col("__first_change").isNotNull && col("valid_to").isNull,
          col("__first_change")).otherwise(col("valid_to")))
      .drop("__first_change")
      .select(dim.columns.map(col).toSeq: _*)
    closed.unionByName(newVersions)
  }

  /** ORACLED exercise (q82): SCD-2 customer-segment history. The base
    * dim opens every customer in its parquet segment at 1990-01-01;
    * the change feed reclassifies every 7th customer once per order
    * year (first order date of that year, a deterministic per-key
    * series). The merged history is rolled up per segment with
    * version/open counts and validity edges — DuckDB reproduces the
    * whole fold with the same lead()/min() formulation.
    */
  def q82Scd2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = Sources.customer(spark, dir).select(
      $"c_custkey",
      $"c_mktsegment".as("segment"),
      lit("1990-01-01").cast("date").as("valid_from"),
      lit(null).cast("date").as("valid_to"))
    val changes = Sources.orders(spark, dir)
      .filter($"o_custkey" % 7 === 0)
      .groupBy($"o_custkey".as("c_custkey"),
        year($"o_orderdate").as("yr"))
      .agg(min($"o_orderdate").as("ts"))
      .select($"c_custkey",
        concat(lit("Y"), $"yr".cast("string")).as("segment"), $"ts")
    scd2Apply(dim, changes, "c_custkey", "ts")
      .groupBy($"segment")
      .agg(
        count(lit(1)).as("n_versions"),
        count(when($"valid_to".isNull, 1)).as("n_open"),
        min($"valid_from").as("first_from"),
        max($"valid_from").as("last_from"))
      .orderBy($"segment")
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
