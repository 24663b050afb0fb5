package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink tests (SURVEY §2.1 S5–S8). */
class SourcesSpec extends SparkTestBase {
  import spark.implicits._

  test("S5 in-memory rows to DataFrame with explicit schema") {
    val schema = StructType(Seq(
      StructField("label", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("A", Seq(1f, 2f)),
      org.apache.spark.sql.Row("B", Seq(3f, 4f)))
    val df = spark.createDataFrame(rows, schema)
    assert(df.schema === schema)
    assert(df.count() === 2)
  }

  test("S6+S7 parquet sink/source round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val out = ops.Relational.q1Pricing(spark, "/root/testdata/sf0.001")
    out.write.mode("overwrite").parquet(s"$dir/q1")
    val back = spark.read.parquet(s"$dir/q1")
    // parquet reload relaxes nullability; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      out.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy($"l_returnflag", $"l_linestatus").collect().toSeq ===
      out.collect().toSeq)
  }

  test("S8 all ten testdata tables load with their expected columns") {
    val expected = Map(
      "region" -> "r_regionkey", "nation" -> "n_nationkey",
      "customer" -> "c_custkey", "supplier" -> "s_suppkey",
      "part" -> "p_partkey", "orders" -> "o_orderkey",
      "lineitem" -> "l_orderkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")
    expected.foreach { case (name, keyCol) =>
      val df =
        if (name == "events") ops.Sources.events(spark, "/root/testdata/sf0.001")
        else ops.Sources.table(spark, "/root/testdata/sf0.001", name)
      assert(df.columns.contains(keyCol), name)
      assert(df.limit(1).count() === 1, name)
    }
  }

  test("partition pruning: a partition-column filter prunes the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    ops.Sources.orders(spark, "/root/testdata/sf0.001")
      .withColumn("yr", year($"o_orderdate"))
      .write.partitionBy("yr").mode("overwrite").parquet(s"$dir/orders_by_year")
    val pruned = spark.read.parquet(s"$dir/orders_by_year").filter($"yr" === 1995)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(yr"), scan)
    // only 1995's directory is read
    val files = pruned.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains("yr=1995")))
  }

  test("column pruning: a 2-column projection reads a 2-column schema") {
    val plan = ops.Sources.lineitem(spark, "/root/testdata/sf0.001")
      .select($"l_orderkey", $"l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("typed Dataset[Event] boundary agrees with the DataFrame surface") {
    val d = "/root/testdata/sf0.001"
    val typed = ops.Sources.eventsDs(spark, d)
      .filter(_.event_type == "click") // typed lambda (no pushdown, by design)
      .map(_.user_id).distinct().count()
    val untyped = ops.Sources.events(spark, d)
      .filter($"event_type" === "click")
      .select($"user_id").distinct().count()
    assert(typed === untyped)
  }

  test("S6/S7 format breadth: csv and json round-trips with explicit schemas") {
    // The engine's sources are plain Spark DataSources, so every format
    // Spark ships works; explicit schemas on read (inference costs a
    // full extra scan at 100 TB — and csv/json would widen types).
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25), (3L, null, 0.0))
      .toDF("id", "name", "score")
    for (fmt <- Seq("csv", "json")) {
      val path = s"$base/$fmt"
      df.write.mode("overwrite").option("header", "true").format(fmt).save(path)
      val back = spark.read.schema(df.schema)
        .option("header", "true").format(fmt).load(path)
      // file-source reads are always nullable (Spark can't trust text
      // files), so compare name+type, not nullability
      assert(back.schema.map(f => (f.name, f.dataType)) ===
        df.schema.map(f => (f.name, f.dataType)), s"$fmt schema drift")
      assert(back.orderBy($"id").collect().toSeq ===
        df.orderBy($"id").collect().toSeq, s"$fmt values drift")
    }
  }

  test("fixture-dtype canary: events loads under ns, us-NTZ, and us-UTC encodings") {
    // The driver fixture's physical ts type has already shifted once
    // (timestamp[ns] through round 10, timestamp[us]/NTZ from round 11).
    // Three committed 5-row fixtures — one per encoding Sources.events
    // dispatches on — pin every branch: a future regeneration degrades
    // to THIS test going red, not ten dead queries.
    def load(arm: String) = {
      val dir = getClass.getResource(s"/fixtures/events_$arm").getPath
      val df = ops.Sources.events(spark, dir)
      assert(df.schema("ts").dataType === TimestampType, s"$arm: ts dtype")
      df.orderBy($"event_id")
        .select($"event_id", $"ts".cast("string"), $"user_id", $"event_type", $"value", $"props")
        .collect().toSeq
    }
    val Seq(nsRows, usRows, tzRows) = Seq("ns", "us", "tz").map(load)
    // identical logical content: the ns fixture carries sub-µs residue that
    // the floored ns→µs conversion must drop to agree with the µs arms
    assert(nsRows === usRows, "ns arm != us-NTZ arm after normalization")
    assert(usRows === tzRows, "us-NTZ arm != us-UTC arm after normalization")
    assert(nsRows.size === 5)
  }

  test("events ts converts ns to us by flooring, losslessly for query granularity") {
    val df = ops.Sources.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType === TimestampType)
    val (lo, hi) = df.agg(min($"ts").cast("string"), max($"ts").cast("string"))
      .as[(String, String)].head()
    // matches DuckDB's CAST(ts AS TIMESTAMP) on the same fixture
    assert(lo === "2024-01-01 00:09:58.778549")
    assert(hi === "2024-01-30 23:26:16.220708")
  }
}
