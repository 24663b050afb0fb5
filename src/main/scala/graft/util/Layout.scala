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
    // binary-search-free form: sum of (v > boundary) over the ≤255
    // interior boundaries stays codegen'd; fine for write-side layout
    interior.foldLeft(lit(0L)) { (acc, b) =>
      acc + when(v > lit(b), 1L).otherwise(0L)
    }
  }

  /** `df` with a `__z` column: interleave of the two columns'
    * equi-depth bucket ranks (default 256 buckets ⇒ 16 z bits).
    */
  def withZValue(df: DataFrame, c1: String, c2: String,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
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
    * + footer + task overhead). One count, one round-robin shuffle,
    * staged write + directory swap (same protocol and non-atomicity
    * caveat as [[graft.ops.Mutations.streamingUpsertSink]]).
    * Content-preserving, layout-destroying: a z-ordered table should be
    * re-written with [[writeZOrdered]] instead to keep its clustering.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetRowsPerFile: Long): Unit = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile must be positive")
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + ".compacting")
    df.repartition(files).write.mode("overwrite").parquet(staging.toString)
    fs.delete(target, true)
    fs.rename(staging, target)
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
