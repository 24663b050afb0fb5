package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The IVF partitioned-layout claim, ASSERTED (`ops/Similarity.scala`
  * `writeIvfIndex`/`ivfIndexTopK`): writing the assigned corpus
  * `partitionBy("ivf_list")` makes a probed query's scan statically
  * partition-pruned — only the probed cells' files are ever touched.
  * The files-touched pattern is LayoutSpec's z-order proof applied to
  * the ANN index layout.
  */
class IvfLayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("probed IVF query touches ONLY the probed cells' files, and is exact within them") {
    val emb = ops.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val base = Files.createTempDirectory("graft-ivf").toString
    val nLists = 8
    ops.Similarity.writeIvfIndex(emb, base, nLists)

    val qv = emb.filter($"vec_id" === 0L)
      .select(transform($"embedding", _.cast("double")))
      .head().getSeq[Double](0)
    val nProbe = 2
    val probed = ops.Similarity.probedCells(spark, base, qv, nProbe)
    assert(probed.length === nProbe)

    // 1. the layout is real: one directory per non-empty cell, more
    //    cell dirs than the probe set (pruning has something to skip)
    val cellDirs = new java.io.File(s"$base/cells").listFiles()
      .filter(_.getName.startsWith("ivf_list=")).map(_.getName).toSet
    assert(cellDirs.size > nProbe, s"fixture clustered into $cellDirs")

    // 2. files-touched: every file the probed scan reads lives under a
    //    probed ivf_list= directory — the partition filter pruned the
    //    rest at listing time, not post-scan
    val touched = spark.read.parquet(s"$base/cells")
      .filter($"ivf_list".isin(probed: _*))
      .select(input_file_name().as("f")).distinct().as[String].collect()
    assert(touched.nonEmpty)
    val allowed = probed.map(c => s"/ivf_list=$c/").toSet
    assert(touched.forall(f => allowed.exists(f.contains)),
      s"scan touched non-probed files: ${touched.mkString("\n")}")
    val allFiles = spark.read.parquet(s"$base/cells")
      .select(input_file_name()).distinct().count()
    assert(touched.length < allFiles,
      "pruned scan must touch strictly fewer files than the full table")

    // 3. the plan prunes STATICALLY: the ivf_list predicate is a
    //    PartitionFilter on the scan, not a data filter
    val plan = spark.read.parquet(s"$base/cells")
      .filter($"ivf_list".isin(probed: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_list"),
      s"expected a partition filter on ivf_list:\n$plan")

    // 4. exact within the probed cells: the top-k equals brute force
    //    over the SAME cells read without the pruned path
    val got = ops.Similarity.ivfIndexTopK(spark, base, qv, k = 10, nProbe)
      .select($"vec_id", $"cosine").as[(Long, Double)].collect().toSeq
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val brute = spark.read.parquet(s"$base/cells")
      .where($"ivf_list".cast("int").isin(probed: _*))
      .select($"vec_id", $"unit").as[(Long, Seq[Double])].collect()
      .map { case (id, u) =>
        (id, u.zip(qv).map { case (a, b) => a * b }.sum / qn)
      }
      .sortBy { case (id, c) => (-c, id) }.take(10)
      .map { case (id, c) =>
        (id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
      .sortBy(_._1).toSeq
    assert(got === brute)
  }

  test("batch serving off the serve index: scan touches only the " +
      "UNION of the batch's probed cells, ranks match per-query " +
      "brute force over those cells, self excluded, meta guarded") {
    val emb = ops.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val base = Files.createTempDirectory("graft-ivf-serve").toString
    ops.Similarity.writeIvfServeIndex(emb, base, nLists = 8)
    val queries = emb.filter($"vec_id" % 31 === 0L)
      .select($"vec_id".as("query_id"),
        transform($"embedding", _.cast("double")).as("qvec"))
    val out = ops.Similarity
      .ivfIndexTopKBatch(spark, base, queries, k = 5, nProbe = 2)
      .cache()
    val got = out.select($"query_id", $"rank", $"vec_id", $"cosine")
      .as[(Long, Int, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(got.nonEmpty && got.values.forall(_.nonEmpty))
    // no self-match anywhere
    assert(got.forall { case (q, rs) => rs.forall(_._3 != q) })
    // per-query brute force over that query's OWN probed cells — the
    // replayable micro-cos probe rule, recomputed independently here
    val cents = spark.read.parquet(s"$base/centroids")
      .select($"cell".cast("int"), $"centroid").as[(Int, Seq[Double])]
      .collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def microProbe(qv: Seq[Double], n: Int): Seq[Int] =
      cents.map { case (i, c) =>
        (math.floor(cos(qv, c) * 1e6 + 0.5).toLong, i)
      }.sortBy { case (m, i) => (-m, i) }.take(n).map(_._2).toSeq
    val all = spark.read.parquet(s"$base/cells")
      .select($"vec_id", $"vec", $"ivf_list".cast("int").as("cell"))
      .as[(Long, Seq[Double], Int)].collect()
    val qvs = queries.as[(Long, Seq[Double])].collect()
    qvs.foreach { case (qid, qv) =>
      val probed = microProbe(qv, 2).toSet
      val brute = all.filter(r => probed(r._3) && r._1 != qid)
        .map(r => (r._1, cos(qv, r._2)))
        .sortBy { case (id, c) => (-c, id) }.take(5).zipWithIndex
        .map { case ((id, c), i) => (i + 1, id,
          BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .toSeq
      val o = got.getOrElse(qid, Seq.empty).map(r => (r._2, r._3, r._4))
      assert(o === brute, s"query $qid: got $o vs brute $brute")
    }
    // files-touched: only the UNION of probed cells is ever read by
    // the pruned scan the serve path issues
    val union = qvs.flatMap { case (_, qv) => microProbe(qv, 2) }.toSet
    val touched = spark.read.parquet(s"$base/cells")
      .filter($"ivf_list".isin(union.toSeq: _*))
      .select(input_file_name().as("f")).distinct().as[String].collect()
    val allowed = union.map(c => s"/ivf_list=$c/")
    assert(touched.forall(f => allowed.exists(f.contains)))
    out.unpersist()
    // a non-serve directory (no marker) is refused loudly
    val plain = Files.createTempDirectory("graft-ivf-plain").toString
    ops.Similarity.writeIvfIndex(emb, plain, 8)
    intercept[Exception] {
      ops.Similarity.ivfIndexTopKBatch(spark, plain, queries, 5, 2).collect()
    }
  }

  test("incremental append: new vectors land in the cell queries probe, " +
      "become findable without refit, and pruning is preserved") {
    val emb = ops.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val base = Files.createTempDirectory("graft-ivf-app").toString
    ops.Similarity.writeIvfIndex(emb.filter($"vec_id" =!= 7L), base, 8)
    val qv = emb.filter($"vec_id" === 7L)
      .select(transform($"embedding", _.cast("double")))
      .head().getSeq[Double](0)
    // before the append, the held-out twin cannot be found
    val before = ops.Similarity.ivfIndexTopK(spark, base, qv, 5, nProbe = 2)
      .select($"vec_id").as[Long].collect()
    assert(!before.contains(999999L))
    // append the twin (vec 7's embedding under a fresh id)
    ops.Similarity.appendToIvfIndex(spark, base,
      emb.filter($"vec_id" === 7L).select(lit(999999L).as("vec_id"),
        lit(42).as("label"), $"embedding"))
    val after = ops.Similarity.ivfIndexTopK(spark, base, qv, 5, nProbe = 2)
      .select($"vec_id", $"cosine", $"ivf_list")
      .as[(Long, Double, Int)].collect()
    val hit = after.find(_._1 == 999999L)
    assert(hit.isDefined, s"appended twin must be probed and found: ${after.toSeq}")
    assert(hit.get._2 === 1.0, "identical vector scores cosine 1")
    // insert/query consistency: the twin sits in the query's TOP cell
    assert(hit.get._3 === ops.Similarity.probedCells(spark, base, qv, 1).head)
    // pruning preserved after the append
    val probed = ops.Similarity.probedCells(spark, base, qv, 2)
    val plan = spark.read.parquet(s"$base/cells")
      .filter($"ivf_list".isin(probed: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("ivf_list"))
  }
}
