package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns.cosineSimilarity

/** Custom codegen'd CosineSimilarity expression vs the HOF composition:
  * bit-identical results, null semantics, and codegen participation.
  */
class CosineExprSpec extends SparkTestBase {
  import spark.implicits._

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private lazy val vecs = ops.Sources.embeddings(spark, "/root/testdata/sf0.001")
    .withColumn("vec", transform($"embedding", _.cast("double")))
    .withColumn("qv", reverse($"vec"))

  test("expression is bit-identical to the HOF composition on real embeddings") {
    val diff = vecs
      .select(cosineSimilarity($"vec", $"qv").as("fast"),
        hofCosine($"vec", $"qv").as("slow"))
      // null-safe inequality: a plain =!= is NULL when either side is
      // NULL, which would DROP rows where the custom expression
      // regressed to null — exactly the bug this test exists to catch
      .filter(!($"fast" <=> $"slow"))
      .count()
    assert(diff === 0)
  }

  test("axioms: parallel 1, orthogonal 0, antiparallel -1, zero-norm null") {
    val df = Seq(
      ("par", Seq(2.0, 0.0), Seq(1.0, 0.0)),
      ("orth", Seq(0.0, 3.0), Seq(1.0, 0.0)),
      ("anti", Seq(-1.0, 0.0), Seq(1.0, 0.0)),
      ("zero", Seq(0.0, 0.0), Seq(1.0, 0.0))).toDF("k", "a", "b")
    val out = df.select($"k", cosineSimilarity($"a", $"b").as("c"))
      .as[(String, Option[Double])].collect().toMap
    assert(out("par") === Some(1.0))
    assert(out("orth") === Some(0.0))
    assert(out("anti") === Some(-1.0))
    assert(out("zero") === None)
  }

  test("null input propagates null") {
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val out = df.select(cosineSimilarity($"a", $"b")).collect()
    assert(out.head.isNullAt(0))
  }

  test("expression runs inside WholeStageCodegen") {
    val plan = vecs.select(cosineSimilarity($"vec", $"qv"))
      .queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator"; the cosine projection must
    // be starred (the HOF transform projection, notably, is not)
    assert(plan.linesIterator.exists(l =>
      l.trim.matches("""\*\(\d+\) Project \[cosine_similarity.*""")), plan)
  }
}
