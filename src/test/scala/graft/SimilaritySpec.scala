package graft

import org.apache.spark.sql.functions._

/** Similarity-op unit tests (SURVEY §2.11 L2/L3). */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("HOF dot product matches hand computation") {
    val out = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(dot($"a", $"b")).as[Double].head()
    assert(out === 32.0)
  }

  test("cosine similarity: parallel=1, orthogonal=0, antiparallel=-1") {
    val df = Seq(
      ("par", Seq(2.0, 0.0), Seq(1.0, 0.0)),
      ("orth", Seq(0.0, 3.0), Seq(1.0, 0.0)),
      ("anti", Seq(-1.0, 0.0), Seq(1.0, 0.0))).toDF("k", "a", "b")
    val out = df.select($"k",
      (dot($"a", $"b") / (sqrt(dot($"a", $"a")) * sqrt(dot($"b", $"b")))).as("c"))
      .as[(String, Double)].collect().toMap
    assert(out("par") === 1.0)
    assert(out("orth") === 0.0)
    assert(out("anti") === -1.0)
  }

  test("exact cosine top-k excludes the query vector and returns k rows") {
    val out = ops.Similarity.q22CosineTopK(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 10)
    assert(!out.map(_.getLong(0)).contains(0L))
    val cosines = out.map(_.getDouble(2))
    assert(cosines.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("ANN and exact top-k agree on most neighbors at this scale") {
    val exact = ops.Similarity.q22CosineTopK(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSet
    val ann = ops.Similarity.q26AnnLsh(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSet
    // LSH is approximate: require substantial overlap, not equality.
    assert((exact intersect ann).size >= 5, s"overlap too low: $exact vs $ann")
  }

  test("minhash near-dup pairs are symmetric-deduped and self-free") {
    val pairs = ops.Similarity.q25NearDup(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect()
    assert(pairs.forall { case (a, b, _) => a < b })
    assert(pairs.map(p => (p._1, p._2)).distinct.length === pairs.length)
  }
}
