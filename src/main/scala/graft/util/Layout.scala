package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for writes — the multi-dimensional
  * file-clustering story at 100 TB.
  *
  * A table sorted by ONE column prunes files only for predicates on that
  * column; a 2-D predicate (price band × quantity band, lat × lon,
  * timestamp × tenant) reads everything. Z-ordering sorts the write by
  * the bit-interleave of the columns' RANK buckets, so every file covers
  * a small rectangle of the 2-D space and parquet min/max stats stay
  * tight on BOTH columns — the same layout trick Delta/Iceberg expose as
  * Z-ORDER clustering. Pure write-side: readers are unchanged, pruning
  * comes from the ordinary stats-based file/row-group skipping.
  *
  * Buckets are equi-depth (approxQuantile splits, one small driver-side
  * array broadcast with the plan), not linear min/max scaling — linear
  * buckets collapse under skew and the whole curve degenerates to a
  * 1-D sort on the dominant column.
  */
object Layout {

  /** Equi-depth bucket rank of `col` as a 0-based long, using splits
    * from `approxQuantile` (relative error 1/(4·buckets)). Duplicate
    * quantiles (heavy skew) merge — fewer, still-ordered buckets.
    */
  private def rankBucket(df: DataFrame, colName: String, buckets: Int): Column = {
    val probes = (0 to buckets).map(_.toDouble / buckets).toArray
    val splits = df.stat
      .approxQuantile(colName, probes, 1.0 / (4.0 * buckets))
      .distinct.sorted
    // interior boundaries only: values at/below the first split or
    // above the last fall into the edge buckets
    val interior = splits.drop(1).dropRight(1)
    val v = col(colName).cast("double")
    // binary-search-free form: sum of (v > boundary) over the ≤1023
    // interior boundaries stays codegen'd; fine for write-side layout
    interior.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(v > lit(b), 1L).otherwise(0L)
    }
  }

  /** `df` with a `__z` column: interleave of the two columns'
    * equi-depth bucket ranks (default 256 buckets ⇒ 16 z bits).
    *
    * Buckets cap at 1024: the rank expression is a linear chain of
    * `when` terms over the interior boundaries, which whole-stage
    * codegen tolerates at ~1k terms but not at 64k (JVM method-size
    * limits); past 1024 buckets the z-cells are finer than any
    * realistic file count resolves anyway.
    */
  def withZValue(df: DataFrame, c1: String, c2: String,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= 1024,
      s"buckets must be in [2, 1024], got $buckets")
    df.withColumn("__z", org.apache.spark.sql.graftshim.GraftColumns
      .interleaveBits(rankBucket(df, c1, buckets), rankBucket(df, c2, buckets)))
  }

  /** Write `df` as `numFiles` parquet files z-ordered on (c1, c2):
    * range-partition by the z key (balanced files), sort within each
    * partition (tight row-group stats), drop the key, write.
    */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
      numFiles: Int, buckets: Int = 256): Unit =
    withZValue(df, c1, c2, buckets)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet directory to ~`targetRowsPerFile` rows per file —
    * the small-files housekeeping every long-lived 100 TB table needs
    * (streaming sinks and incremental loads accrete KB-sized files;
    * scan cost then tracks FILE COUNT, not bytes, through per-file open
    * + footer + task overhead). Output sizing comes from the parquet
    * FOOTERS (each file's row count is in its metadata) — a driver-side
    * footer read per file, NOT a `count()` scan: at 100 TB a sizing
    * scan would read the whole table once before the real rewrite
    * (asserted job-free in LayoutSpec). One round-robin shuffle, staged
    * write + directory swap; a crash between delete and rename is
    * recovered at the next compact's entry (complete staging + missing
    * target ⇒ adopt staging), mirroring the versioned-commit recovery
    * in [[graft.ops.Mutations.streamingUpsertSink]].
    * Content-preserving, layout-destroying: a z-ordered table should be
    * re-written with [[writeZOrdered]] instead to keep its clustering.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    // the PATH's filesystem, not the default one — path may be s3a://
    // etc. while fs.defaultFS differs
    val fs = target.getFileSystem(conf)
    val staging = new org.apache.hadoop.fs.Path(path + ".compacting")
    // recover a previous compaction that crashed between delete and
    // rename: the staged directory holds the only complete copy
    if (!fs.exists(target) && fs.exists(staging) &&
        fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) {
      fs.rename(staging, target)
      return
    }
    if (fs.exists(staging)) fs.delete(staging, true) // stale partial stage
    val n = footerRowCount(fs, target)
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    spark.read.parquet(path)
      .repartition(files).write.mode("overwrite").parquet(staging.toString)
    fs.delete(target, true)
    fs.rename(staging, target)
  }

  /** Total row count of a parquet directory from file footers only —
    * no Spark job, no data pages read. The listing is RECURSIVE: a
    * partitioned table keeps its data files under `part=value`
    * subdirectories, and a top-level-only listing would see zero files,
    * size the rewrite at n = 0, and collapse the whole table into one
    * writer task. Files under hidden (`_`/`.`-prefixed) directories —
    * `_temporary`, checkpoint metadata — are skipped at any depth,
    * matching what a parquet read would load.
    */
  private[graft] def footerRowCount(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Long = {
    val root = fs.makeQualified(dir)
    def hidden(p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      while (cur != null && cur != root) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val it = fs.listFiles(root, true)
    var sum = 0L
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !hidden(st.getPath)) {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, fs.getConf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try sum += r.getRecordCount finally r.close()
      }
    }
    sum
  }

  /** MAINTENANCE path end-to-end (ORACLED, q90): splinter the
    * documents table into small files (flat AND lang-partitioned
    * layouts), [[compact]] both, and emit the invariants the oracle
    * can state from the source table alone — row and key preservation,
    * file-count reduction, and nested-layout row preservation (the
    * regression this query exists to catch: a top-level-only footer
    * listing sized a partitioned rewrite at n = 0 and collapsed it to
    * one file; see [[footerRowCount]]). File counts come from the same
    * recursive metadata listing compact itself uses — no data job.
    */
  def q90Compact(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.ops.Sources.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft-q90").toString
    val flat = tmp + "/flat"
    val nested = tmp + "/nested"
    docs.repartition(16).write.mode("overwrite").parquet(flat)
    docs.write.partitionBy("lang").mode("overwrite").parquet(nested)
    val fs = new org.apache.hadoop.fs.Path(flat)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFileCount(p: String): Long = {
      val root = fs.makeQualified(new org.apache.hadoop.fs.Path(p))
      val it = fs.listFiles(root, true)
      var n = 0L
      while (it.hasNext) {
        val st = it.next()
        val leaf = st.getPath.getName
        if (st.isFile && !leaf.startsWith("_") && !leaf.startsWith(".")) n += 1
      }
      n
    }
    val filesBefore = dataFileCount(flat)
    compact(spark, flat, targetRowsPerFile = 1000L)
    val filesAfter = dataFileCount(flat)
    compact(spark, nested, targetRowsPerFile = 1000L)
    val flatAgg = spark.read.parquet(flat).agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("doc_id")).as("n_docs"))
    val nestedAgg = spark.read.parquet(nested).agg(
      count(lit(1)).as("nested_rows"))
    flatAgg.crossJoin(nestedAgg)
      .select(col("n_rows"), col("n_docs"),
        lit(filesAfter < filesBefore).as("files_reduced"),
        (col("nested_rows") === col("n_rows")).as("nested_preserved"))
  }

  /** ORACLED exercise of the interleave kernel (q79): occupancy of the
    * 8-bit × 8-bit z-cell grid over (l_partkey, l_suppkey) mod 256 —
    * the key distribution a z-ordered write of lineitem would range-
    * partition on. Buckets are modular (not equi-depth) HERE so DuckDB
    * can reproduce the key bit-for-bit with shift/mask arithmetic; the
    * equi-depth path stays engine-side (LayoutSpec). Top cells with a
    * total (n, z_cell) order so the limit is deterministic.
    */
  def q79ZorderCells(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val li = graft.ops.Sources.lineitem(spark, dir)
    val x = (col("l_partkey") % 256).cast("long")
    val y = (col("l_suppkey") % 256).cast("long")
    li.select(org.apache.spark.sql.graftshim.GraftColumns
        .interleaveBits(x, y).as("z_cell"))
      .groupBy("z_cell").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("z_cell")).limit(20)
  }
}
