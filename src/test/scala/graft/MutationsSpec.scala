package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Mutations

/** MERGE-style upsert (q81): row-wise replace semantics, the insert and
  * persist arms, null handling in both keys and values, and the
  * schema-mismatch guard.
  */
class MutationsSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("a", StringType, nullable = true),
    StructField("b", IntegerType, nullable = true)))

  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  test("matched rows are replaced row-wise, unmatched insert and persist") {
    val base = frame(Row(1L, "one", 10), Row(2L, "two", 20), Row(3L, "three", 30))
    val updates = frame(Row(2L, "TWO", 22), Row(9L, "nine", 90))
    val got = Mutations.upsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    assert(got === Seq((1L, "one", 10), (2L, "TWO", 22), (3L, "three", 30),
      (9L, "nine", 90)))
  }

  test("an intentional null in the update row WINS (row-wise, not coalesce)") {
    val base = frame(Row(1L, "one", 10))
    val updates = frame(Row(1L, null, 11))
    val got = Mutations.upsert(base, updates, Seq("k")).head()
    // per-column coalesce would resurrect "one" — MERGE semantics must not
    assert(got.isNullAt(1) && got.getInt(2) === 11)
  }

  test("null keys pair null-safely instead of duplicating") {
    val base = frame(Row(null, "base-null", 1))
    val updates = frame(Row(null, "upd-null", 2))
    val got = Mutations.upsert(base, updates, Seq("k")).collect()
    assert(got.length === 1 && got.head.getString(1) === "upd-null")
  }

  test("mismatched schemas are rejected") {
    val base = frame(Row(1L, "one", 10))
    intercept[IllegalArgumentException] {
      Mutations.upsert(base, base.withColumnRenamed("b", "c"), Seq("k"))
    }
  }

  test("scd2Apply closes open versions, chains changes, persists untouched keys") {
    import java.sql.Date
    val dim = Seq(
      (1L, "A", Date.valueOf("1990-01-01"), null.asInstanceOf[Date]),
      (2L, "B", Date.valueOf("1990-01-01"), null.asInstanceOf[Date]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val changes = Seq(
      (1L, "A2", Date.valueOf("1995-06-01")),
      (1L, "A3", Date.valueOf("1998-01-15")))
      .toDF("k", "seg", "ts")
    val got = Mutations.scd2Apply(dim, changes, "k", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toString, Option(r.getDate(3)).map(_.toString)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(got === Seq(
      (1L, "A", "1990-01-01", Some("1995-06-01")),  // closed at first change
      (1L, "A2", "1995-06-01", Some("1998-01-15")), // chained to next change
      (1L, "A3", "1998-01-15", None),               // new open version
      (2L, "B", "1990-01-01", None)))               // untouched key persists
    // validity windows tile: per key, each close equals the next open
    val k1 = got.filter(_._1 == 1L)
    assert(k1.init.map(_._4.get) === k1.tail.map(_._3))
  }

  test("q82 history keeps exactly one open version per key") {
    val out = Mutations.q82Scd2(spark, "/root/testdata/sf0.001").collect()
    val nOpen = out.map(_.getLong(2)).sum
    val nCustomers = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert(nOpen === nCustomers, "every key must end with exactly one open version")
    // the change feed produced year segments alongside the originals
    assert(out.map(_.getString(0)).count(_.startsWith("Y")) > 3)
  }

  test("streaming CDC-apply maintains the dim across micro-batches, last-in-batch wins") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val q = ops.Mutations.streamingUpsertSink(
      input.toDF().toDF("k", "v", "seq"),
      s"$dir/dim", Seq("k"), "seq", s"$dir/ckpt")
    try {
      // batch 1: two keys, plus an in-batch overwrite of k=1 (seq 2 wins)
      input.addData((1L, "one", 1L), (2L, "two", 1L), (1L, "one-v2", 2L))
      q.processAllAvailable()
      val after1 = Mutations.readVersionedDim(spark, s"$dir/dim")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(after1 === Map(1L -> "one-v2", 2L -> "two"))
      // batch 2: update k=2, insert k=3; k=1 persists from batch 1
      input.addData((2L, "two-v2", 3L), (3L, "three", 3L))
      q.processAllAvailable()
      val after2 = Mutations.readVersionedDim(spark, s"$dir/dim")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(after2 === Map(1L -> "one-v2", 2L -> "two-v2", 3L -> "three"))
      // GC retains the immediately-preceding version for one batch (a
      // reader that resolved it pre-commit may still hold a lazy scan)
      def vdirs() = new java.io.File(s"$dir/dim").listFiles()
        .map(_.getName).filter(_.startsWith("_v=")).sorted.toSeq
      assert(vdirs() === Seq("_v=1", "_v=2"))
      // plant a leaked manifest tmp (crash between create and rename):
      // the next batch's sweep must collect it
      val leaked = new java.io.File(s"$dir/dim/._CURRENT.9.tmp")
      assert(leaked.createNewFile())
      // batch 3: _v=1 ages out of retention, the tmp is swept
      input.addData((3L, "three-v2", 4L))
      q.processAllAvailable()
      assert(vdirs() === Seq("_v=2", "_v=3"))
      assert(!leaked.exists(), "stale ._CURRENT.*.tmp must be swept")
      val after3 = Mutations.readVersionedDim(spark, s"$dir/dim")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(after3 === Map(1L -> "one-v2", 2L -> "two-v2", 3L -> "three-v2"))
    } finally q.stop()
  }

  test("versioned commit: a crash between stage and manifest flip recovers on replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-crash").toString
    val dim = s"$dir/dim"
    def batch(rows: (Long, String, Long)*) = frame(rows.map(t =>
      Row(t._1, t._2, t._3.toInt)): _*).toDF("k", "v", "seq")
    // batch 1 commits _v=1
    Mutations.applyCdcBatch(batch((1L, "one", 1)), dim, Seq("k"), "seq")
    // simulate batch 2 crashing AFTER staging _v=2 but BEFORE the flip:
    // a fully-written staged version with stale (even wrong) content,
    // manifest still naming version 1
    frame(Row(9L, "garbage", 0)).toDF("k", "v", "seq").drop("seq")
      .withColumn("v", lit("garbage"))
      .write.mode("overwrite").parquet(s"$dim/_v=2")
    val committed = Mutations.readVersionedDim(spark, dim)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(committed === Map(1L -> "one"),
      "a staged-but-unflipped version must be invisible to readers")
    // checkpoint replay of batch 2: must clobber the stale stage,
    // merge against _v=1, and flip
    Mutations.applyCdcBatch(
      batch((1L, "one-v2", 2), (2L, "two", 2)), dim, Seq("k"), "seq")
    val after = Mutations.readVersionedDim(spark, dim)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === Map(1L -> "one-v2", 2L -> "two"))
  }

  test("versioned commit: a lost manifest falls back to the highest complete version") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-manifest").toString
    val dim = s"$dir/dim"
    def batch(rows: (Long, String, Long)*) = frame(rows.map(t =>
      Row(t._1, t._2, t._3.toInt)): _*).toDF("k", "v", "seq")
    Mutations.applyCdcBatch(batch((1L, "one", 1)), dim, Seq("k"), "seq")
    Mutations.applyCdcBatch(batch((2L, "two", 2)), dim, Seq("k"), "seq")
    // simulate a mid-flip crash on a FS without atomic overwrite-rename:
    // the manifest is gone but _v=2 is complete (_SUCCESS present)
    assert(new java.io.File(s"$dim/_CURRENT").delete())
    val got = Mutations.readVersionedDim(spark, dim)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "one", 2L -> "two"))
    // and the next batch re-establishes the manifest on top of it
    Mutations.applyCdcBatch(batch((3L, "three", 3)), dim, Seq("k"), "seq")
    val after = Mutations.readVersionedDim(spark, dim)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after === Map(1L -> "one", 2L -> "two", 3L -> "three"))
  }

  test("upsert equals a reference map-merge on randomized inputs (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      k <- Gen.choose(0L, 30L)
      a <- Gen.oneOf("x", "y", "z")
      b <- Gen.choose(0, 99)
    } yield (k, a, b)
    val caseGen = for {
      nb <- Gen.choose(0, 40)
      nu <- Gen.choose(0, 40)
      baseRows <- Gen.listOfN(nb, rowGen)
      updRows <- Gen.listOfN(nu, rowGen)
    } yield (baseRows.groupBy(_._1).values.map(_.head).toList, // unique keys
      updRows.groupBy(_._1).values.map(_.head).toList)
    (0 until 8).foreach { i =>
      val (baseRows, updRows) =
        caseGen.apply(Gen.Parameters.default, Seed(77L + i)).get
      val base = frame(baseRows.map(t => Row(t._1, t._2, t._3)): _*)
      val upd = frame(updRows.map(t => Row(t._1, t._2, t._3)): _*)
      val got = Mutations.upsert(base, upd, Seq("k"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .sorted.toSeq
      val want = (baseRows.map(t => t._1 -> t).toMap ++
        updRows.map(t => t._1 -> t).toMap).values.toSeq.sorted
      assert(got === want, s"case $i: base=$baseRows upd=$updRows")
    }
  }

  test("scd2Apply invariants hold on randomized change feeds (property)") {
    import java.sql.Date
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val dimKeys = (1L to 12L)
    val dim = dimKeys.map(k =>
      (k, "base", Date.valueOf("1990-01-01"), null.asInstanceOf[Date]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val changeGen = for {
      k <- Gen.choose(1L, 12L)
      day <- Gen.choose(1, 2000)
      seg <- Gen.oneOf("a", "b", "c")
    } yield (k, seg, Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(day).toString))
    val feedGen = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, changeGen))
      .map(_.groupBy(t => (t._1, t._3)).values.map(_.head).toList) // one change per (key, ts)
    (0 until 6).foreach { i =>
      val feed = feedGen.apply(Gen.Parameters.default, Seed(500L + i)).get
      val changes = feed.toDF("k", "seg", "ts")
      val hist = Mutations.scd2Apply(dim, changes, "k", "ts")
        .collect()
        .map(r => (r.getLong(0), r.getDate(2), Option(r.getDate(3))))
      // row count: every original + every change is one version
      assert(hist.length === dimKeys.size + feed.length, s"case $i")
      // exactly one open version per key
      val open = hist.filter(_._3.isEmpty)
      assert(open.map(_._1).sorted.toSeq === dimKeys.toSeq, s"case $i")
      // windows tile per key: sorted valid_froms chain through valid_tos
      hist.groupBy(_._1).foreach { case (k, vs) =>
        val sorted = vs.sortBy(_._2.getTime)
        sorted.sliding(2).foreach {
          case Array(prev, next) =>
            assert(prev._3.contains(next._2),
              s"case $i key $k: ${prev._3} does not chain to ${next._2}")
          case _ =>
        }
      }
    }
  }

  test("q81 merges both arms on real testdata") {
    val rows = Mutations.q81Upsert(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // update arm reclassifies every 10th customer, insert arm adds NEW
    assert(rows.contains("UPGRADED") && rows.contains("NEW"))
    val base = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val nBase = base.count()
    val nNew = base.filter($"c_custkey" % 97 === 0).count()
    assert(rows.values.sum === nBase + nNew,
      "merged row count must be base + inserted")
  }
}
