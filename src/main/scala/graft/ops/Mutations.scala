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
    * Write protocol: VERSIONED-DIRECTORY commit. The dim lives at
    * `dimPath/_v=N` (underscore-prefixed so a naive
    * `spark.read.parquet(dimPath)` fails fast instead of silently
    * unioning every version) with a one-line `_CURRENT` manifest naming
    * the committed N; readers go through [[readVersionedDim]]. Each
    * batch merges against the manifested version, writes `_v=N+1` in
    * full, then flips the manifest with an atomic overwrite-rename
    * (`FileContext.rename(OVERWRITE)`) and deletes superseded versions.
    * Crash anywhere leaves the committed version intact: before the
    * flip, `_CURRENT` still names N and checkpoint replay re-merges
    * into a fresh `_v=N+1` (mode=overwrite clobbers the stale staged
    * copy); after the flip, replay of an already-applied batch is the
    * one non-idempotent window every file-based CDC sink shares —
    * avoid it by making `upsert` idempotent per key (it is: identical
    * input yields identical output). The previous delete-then-rename
    * protocol could lose the ENTIRE dim to a crash between delete and
    * rename; versioning removes that window without a table format.
    */
  def streamingUpsertSink(changes: DataFrame, dimPath: String,
      keys: Seq[String], seqCol: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyCdcBatch(batch, dimPath, keys, seqCol)
      }
      .start()

  /** One CDC micro-batch applied to the versioned dim at `dimPath` —
    * the `foreachBatch` body of [[streamingUpsertSink]], factored out
    * so crash/replay states can be driven directly in tests.
    */
  def applyCdcBatch(batch: DataFrame, dimPath: String, keys: Seq[String],
      seqCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(dimPath)
    // resolve the PATH's filesystem, not the default one — dimPath may
    // live on s3a:///hdfs:// while fs.defaultFS points elsewhere
    val fs = dir.getFileSystem(conf)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", seqCol)
    val cur = committedVersion(fs, dir)
    val merged = cur match {
      case Some(n) =>
        upsert(spark.read.parquet(versionDir(dir, n).toString), latest, keys)
      case None => latest
    }
    val next = cur.getOrElse(0L) + 1
    merged.write.mode("overwrite").parquet(versionDir(dir, next).toString)
    // the manifest-loss fallback in committedVersion keys on _SUCCESS;
    // if the committer was configured not to write one
    // (mapreduce.fileoutputcommitter.marksuccessfuljobs=false), record
    // completeness ourselves — the write above has already returned, so
    // the version IS complete at this point
    val success = new org.apache.hadoop.fs.Path(versionDir(dir, next), "_SUCCESS")
    if (!fs.exists(success)) fs.create(success, true).close()
    commitVersion(fs, dir, next)
    // GC superseded versions — crash mid-GC is harmless (stale dirs are
    // below the manifest and re-collected on the next batch). The
    // IMMEDIATELY preceding version is retained for one batch: a reader
    // that resolved version next-1 before this commit may still have an
    // unexecuted lazy scan against it, and deleting it here would fail
    // that read mid-flight. Readers lagging by 2+ batches are out of
    // contract (single-writer, promptly-consumed readers).
    listVersions(fs, dir).filter(_ < next - 1)
      .foreach(n => fs.delete(versionDir(dir, n), true))
    // sweep manifest tmps leaked by a crash between create and rename
    // in commitVersion — each attempt uses a fresh name, so nothing
    // else ever collects them (this batch's own tmp is already renamed
    // away; single-writer, so no live tmp can exist here)
    fs.listStatus(dir).iterator
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n.startsWith("._CURRENT.") && n.endsWith(".tmp")
      }
      .foreach(p => fs.delete(p, false))
  }

  /** The committed state of a versioned dim directory maintained by
    * [[streamingUpsertSink]]: the `_CURRENT`-manifested version, or —
    * if a crash landed exactly between manifest delete and rename on a
    * filesystem without atomic overwrite-rename — the highest fully
    * written (`_SUCCESS`-marked) version, which at that crash point is
    * the one the lost manifest was about to name.
    *
    * Concurrency contract: the returned frame's scan is LAZY, and the
    * sink GCs versions older than the previous one each batch — so a
    * read must execute within one batch of being planned. A reader
    * that resolves version N is safe through the commit of N+1
    * (N is retained one extra batch) but not past the commit of N+2.
    */
  def readVersionedDim(spark: SparkSession, dimPath: String): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(dimPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = committedVersion(fs, dir).getOrElse(
      throw new IllegalStateException(s"no committed version under $dimPath"))
    spark.read.parquet(versionDir(dir, v).toString)
  }

  private def versionDir(dir: org.apache.hadoop.fs.Path, n: Long) =
    new org.apache.hadoop.fs.Path(dir, s"_v=$n")

  private def manifest(dir: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(dir, "_CURRENT")

  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("_v="))
      .map(_.stripPrefix("_v=").toLong)

  private def committedVersion(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Option[Long] = {
    val m = manifest(dir)
    if (fs.exists(m)) {
      val in = fs.open(m)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    } else {
      // manifest missing (fresh dim, or a non-atomic-rename FS crashed
      // mid-flip): fall back to the highest COMPLETE version — versions
      // are written in full (with _SUCCESS) before any flip is attempted
      listVersions(fs, dir)
        .filter(n => fs.exists(
          new org.apache.hadoop.fs.Path(versionDir(dir, n), "_SUCCESS")))
        .sorted.lastOption
    }
  }

  private def commitVersion(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, n: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dir, s"._CURRENT.$n.tmp")
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // atomic overwrite-rename where the FS supports it (HDFS, local);
    // on an object store without it the readVersionedDim fallback covers
    // the delete+rename window
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(dir.toUri, fs.getConf)
        .rename(tmp, manifest(dir), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException =>
        if (fs.exists(manifest(dir))) fs.delete(manifest(dir), false)
        fs.rename(tmp, manifest(dir))
    }
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

  /** ORACLED exercise (q95): the CDC versioned-dim sink round trip —
    * the one subsystem that was test-only until round 12. Two
    * deterministic change batches run through [[applyCdcBatch]] against
    * a fresh versioned directory: batch 1 snapshots the customer dim;
    * batch 2 carries an update arm (every 13th customer re-segmented,
    * balance −500) plus an intra-batch seq conflict (every 13th ALSO
    * gets a seq=2 'STALE' row that the seq=3 'FRESH' row must beat) and
    * an insert arm (every 89th customer cloned onto a shifted key). The
    * dim is then read back through [[readVersionedDim]] — i.e. through
    * the `_CURRENT` manifest — and rolled up per segment. DuckDB
    * reproduces the merge relationally (base LEFT-hit CASE + inserts),
    * so a hash match proves the file protocol (version write, _SUCCESS,
    * manifest flip, GC, manifest read) preserved MERGE semantics
    * end-to-end, not just that some parquet appeared. Version/GC
    * invariants ride along as oracled booleans: `version_ok` (manifest
    * names version 2) and `gc_ok` (exactly versions {1,2} on disk — the
    * previous version is retained one batch for lagging readers).
    *
    * 100 TB posture: each batch is ONE full-outer-join shuffle
    * ([[upsert]]) plus a full rewrite of the dim — the plain-parquet
    * cost model this sink documents (a table format would rewrite only
    * changed files); no driver loop, no per-key I/O.
    */
  def q95CdcVersioned(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dimPath = java.nio.file.Files
      .createTempDirectory("graft-q95").resolve("dim").toString
    val base = Sources.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment".as("segment"),
        $"c_acctbal".cast("decimal(12,2)").as("bal"))
    applyCdcBatch(base.withColumn("__seq", lit(1L)),
      dimPath, Seq("c_custkey"), "__seq")
    val upd = base.filter($"c_custkey" % 13 === 0)
      .select($"c_custkey", lit("FRESH").as("segment"),
        ($"bal" - 500.0).cast("decimal(12,2)").as("bal"), lit(3L).as("__seq"))
    val stale = base.filter($"c_custkey" % 13 === 0)
      .select($"c_custkey", lit("STALE").as("segment"), $"bal",
        lit(2L).as("__seq"))
    val ins = base.filter($"c_custkey" % 89 === 0)
      .select(($"c_custkey" + 2000000).as("c_custkey"),
        lit("CLONED").as("segment"), $"bal", lit(2L).as("__seq"))
    applyCdcBatch(upd.unionByName(stale).unionByName(ins),
      dimPath, Seq("c_custkey"), "__seq")
    val dim = readVersionedDim(spark, dimPath)
    val p = new org.apache.hadoop.fs.Path(dimPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versionOk = committedVersion(fs, p).contains(2L)
    val gcOk = listVersions(fs, p).sorted == Seq(1L, 2L)
    dim.groupBy($"segment")
      .agg(count(lit(1)).as("n"),
        round(sum($"bal"), 2).cast("double").as("segment_bal"))
      .withColumn("version_ok", lit(versionOk))
      .withColumn("gc_ok", lit(gcOk))
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
