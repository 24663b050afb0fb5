package graft

import org.apache.spark.sql.functions._

/** Typed vector-mean Aggregator tests (SURVEY §2.4 A5, §2.12 UDAF). */
class VectorAggsSpec extends SparkTestBase {
  import spark.implicits._

  test("grouped vector mean matches hand computation") {
    val df = Seq(
      ("a", Seq(1.0, 2.0)), ("a", Seq(3.0, 4.0)), ("b", Seq(10.0, 20.0)))
      .toDF("label", "vec")
    val out = df.groupBy($"label")
      .agg(ops.VectorAggs.vectorMean($"vec").as("m"))
      .as[(String, Seq[Double])].collect().toMap
    assert(out("a") === Seq(2.0, 3.0))
    assert(out("b") === Seq(10.0, 20.0))
  }

  test("vector mean recovers the fixture class template within the noise band") {
    val df = ml.EmnistFixture.df(spark, dim = 64)
    val means = df.filter($"label" === "A")
      .select(ops.VectorAggs.vectorMean($"features").as("m"))
      .as[Seq[Double]].head()
    assert(means.length === 64)
    // Inactive dims are structural zeros; active dims are ~[100,200)±10.
    assert(means.count(_ == 0.0) > 32) // ~80% sparsity
    assert(means.filter(_ != 0.0).forall(v => v > 85.0 && v < 215.0))
  }

  test("single-partition and multi-partition aggregation agree (merge path)") {
    val df = Seq.tabulate(100)(i => ("g", Seq(i.toDouble, (2 * i).toDouble)))
      .toDF("label", "vec")
    val one = df.coalesce(1).groupBy($"label")
      .agg(ops.VectorAggs.vectorMean($"vec")).as[(String, Seq[Double])].head()._2
    val many = df.repartition(7).groupBy($"label")
      .agg(ops.VectorAggs.vectorMean($"vec")).as[(String, Seq[Double])].head()._2
    assert(one === Seq(49.5, 99.0))
    assert(many === one)
  }
}
