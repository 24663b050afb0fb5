package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.expressions.InterleaveBits
import graft.util.Layout

/** Z-order write layout: the Morton interleave kernel bit-for-bit, the
  * SQL-function registration, and the actual 100 TB claim — that a
  * 2-D box predicate over a z-ordered write touches FEWER files than
  * over a single-column-sorted write of the same data, via ordinary
  * parquet min/max file skipping, with identical query results.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave kernel: known bit patterns") {
    // x=0b101 -> even positions 10001, y=0b011 -> odd positions 0101(0)
    assert(InterleaveBits.compute(5L, 3L) === (17L | 10L))
    assert(InterleaveBits.compute(0L, 0L) === 0L)
    assert(InterleaveBits.compute(0xFFFFFFFFL, 0L) === 0x5555555555555555L)
    assert(InterleaveBits.compute(0L, 0xFFFFFFFFL) === 0xAAAAAAAAAAAAAAAAL)
    assert(InterleaveBits.compute(0xFFFFFFFFL, 0xFFFFFFFFL) === -1L)
    // bits above 32 are ignored
    assert(InterleaveBits.compute(0x100000001L, 0L) ===
      InterleaveBits.compute(1L, 0L))
  }

  test("interleave is monotone in each dimension at fixed other") {
    val zs = (0L until 64L).map(InterleaveBits.compute(_, 7L))
    assert(zs === zs.sorted)
    val zs2 = (0L until 64L).map(InterleaveBits.compute(7L, _))
    assert(zs2 === zs2.sorted)
  }

  test("interleave_bits is a registered SQL function under the extensions") {
    val s = spark.newSession()
    graft.plans.GraftExtensions.install(s)
    assert(s.sql("SELECT interleave_bits(5L, 3L) AS z").head().getLong(0) === 27L)
  }

  test("compact coalesces a splintered directory, content-preserving") {
    val base = Files.createTempDirectory("graft-compact").toString + "/t"
    spark.range(10000L).select($"id", ($"id" % 7).as("g"))
      .repartition(64).write.parquet(base)
    val before = spark.read.parquet(base)
    assert(before.select(input_file_name()).distinct().count() === 64)
    val want = before.select($"id").as[Long].collect().sorted.toSeq
    Layout.compact(spark, base, targetRowsPerFile = 2500L)
    val after = spark.read.parquet(base)
    assert(after.select(input_file_name()).distinct().count() === 4)
    assert(after.select($"id").as[Long].collect().sorted.toSeq === want)
  }

  test("compact sizes from parquet footers — no counting scan before the write") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    def jobsDuring(f: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger
      val l = new SparkListener {
        override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try f finally {
        // the listener bus is async — wait for the count to go quiet
        var last = -1; var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val c = counter.get
          if (c == last) stable += 1 else { stable = 0; last = c }
        }
        spark.sparkContext.removeSparkListener(l)
      }
      counter.get
    }
    def splintered(): String = {
      val p = Files.createTempDirectory("graft-compact-jobs").toString + "/t"
      spark.range(8000L).repartition(32).write.parquet(p)
      p
    }
    // footer sizing agrees with the scan it replaces
    val p0 = splintered()
    val fs = new org.apache.hadoop.fs.Path(p0)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(Layout.footerRowCount(fs, new org.apache.hadoop.fs.Path(p0)) === 8000L)
    // compact must launch exactly the jobs of the bare rewrite — the
    // old df.count() sizing added a full-scan job on top
    val pBare = splintered()
    val bare = jobsDuring {
      spark.read.parquet(pBare).repartition(4)
        .write.mode("overwrite").parquet(pBare + ".rewrite")
    }
    val pCompact = splintered()
    val compacted = jobsDuring(Layout.compact(spark, pCompact, 2000L))
    assert(compacted === bare,
      s"compact ran $compacted jobs vs $bare for the bare rewrite — sizing must not scan")
  }

  test("compact sizes a partitioned (nested) table correctly — no collapse to one file") {
    // regression: footerRowCount listed only the top level, saw zero
    // data files under the part=value subdirectories, and compact
    // rewrote the whole table through repartition(1)
    val base = Files.createTempDirectory("graft-compact-nested").toString + "/t"
    spark.range(8000L).select($"id", ($"id" % 4).cast("string").as("p"))
      .repartition(8).write.partitionBy("p").parquet(base)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(Layout.footerRowCount(fs, new org.apache.hadoop.fs.Path(base)) === 8000L,
      "footer sizing must see nested data files")
    Layout.compact(spark, base, targetRowsPerFile = 2000L)
    val after = spark.read.parquet(base)
    assert(after.select(input_file_name()).distinct().count() === 4,
      "8000 rows at 2000/file must compact to 4 files, not 1")
    // content preserved, including the former partition column's values
    assert(after.groupBy($"p").count().as[(String, Long)].collect().toSet ===
      (0 until 4).map(i => (i.toString, 2000L)).toSet)
  }

  test("compact recovers a crash between delete and rename from the staged copy") {
    val base = Files.createTempDirectory("graft-compact-crash").toString + "/t"
    spark.range(1000L).repartition(8).write.parquet(base)
    // simulate the crash window: a complete staged compaction exists,
    // the target directory is already gone
    spark.read.parquet(base).repartition(1)
      .write.parquet(base + ".compacting")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(base), true))
    Layout.compact(spark, base, 2000L)
    val restored = spark.read.parquet(base)
    assert(restored.count() === 1000L)
    assert(restored.select(input_file_name()).distinct().count() === 1)
  }

  test("z-ordered write prunes a 2-D box predicate better than a linear sort") {
    // Deterministic pseudo-random 2-D points: both dims uniform-ish and
    // INDEPENDENT, the case where a 1-D sort cannot help the other dim.
    val n = 65536
    val df = spark.range(n.toLong).select(
      (xxhash64($"id") % 100000L).as("x"),
      (xxhash64($"id", lit(1)) % 100000L).as("y"))
      .persist()
    val base = Files.createTempDirectory("graft-layout").toString
    val zPath = s"$base/zorder"
    val linPath = s"$base/linear"
    val files = 64
    Layout.writeZOrdered(df, "x", "y", zPath, numFiles = files, buckets = 64)
    df.repartitionByRange(files, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(linPath)
    df.unpersist()

    // 20% box in each dim => ~4% selectivity. Deliberately OFF-center:
    // hash outputs span [-100000, 100000) and a box straddling the
    // space's midpoint is the z-curve's worst case (it touches all four
    // top-level quadrants) — a fair layout comparison uses a generic
    // box, not the adversarial one.
    val lo = 10000L; val hi = 50000L
    def run(path: String): (Long, Long) = {
      val out = spark.read.parquet(path)
        .filter($"x" >= lo && $"x" < hi && $"y" >= lo && $"y" < hi)
      val rows = out.count()
      val touched = out.select(input_file_name()).distinct().count()
      (rows, touched)
    }
    val (zRows, zFiles) = run(zPath)
    val (lRows, lFiles) = run(linPath)
    assert(zRows === lRows, "layouts must return identical results")
    assert(zRows > 0L, "box predicate must be non-vacuous")
    // The linear layout's x-sort prunes x but every surviving file spans
    // all of y; the z layout prunes both. Strict improvement, not a tie.
    assert(zFiles < lFiles,
      s"z-order touched $zFiles files vs linear $lFiles — expected fewer")
    // Balanced output: range partitioning keeps files within 3x of mean.
    val sizes = spark.read.parquet(zPath)
      .groupBy(input_file_name()).count().select("count").as[Long].collect()
    assert(sizes.length === files)
    assert(sizes.max.toDouble / (n.toDouble / files) < 3.0,
      s"z files unbalanced: max ${sizes.max} of mean ${n / files}")
  }
}
