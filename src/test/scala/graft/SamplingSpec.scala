package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for sampling (SURVEY §2.2 P5/P6, §5.2). ScalaCheck
  * generators drive the cases with a pinned seed (the scalatest-plus
  * bridge artifact is not in the offline cache, so cases are drawn
  * explicitly rather than via forAll).
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(sizes: Map[String, Int]) =
    sizes.toSeq.flatMap { case (l, n) => (0 until n).map(i => (l, s"$l-$i")) }
      .toDF("label", "id")

  test("stratified sample returns exactly min(k, group size) rows per class") {
    val gen = Gen.zip(
      Gen.mapOfN(3, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(1, 30))),
      Gen.choose(1, 15))
    val cases = (0 until 8).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.nonEmpty)
    cases.filter(_._1.nonEmpty).foreach { case (sizes, k) =>
      val df = corpus(sizes)
      val out = util.Sampling.stratifiedExactSample(df, "label", k, 7L)
      val counts = out.groupBy("label").count().as[(String, Long)].collect().toMap
      sizes.foreach { case (l, n) =>
        assert(counts.getOrElse(l, 0L) === math.min(n, k).toLong,
          s"sizes=$sizes k=$k label=$l")
      }
    }
  }

  test("stratified sample is a subset of the input and seed-deterministic") {
    val df = corpus(Map("a" -> 20, "b" -> 5))
    val s1 = util.Sampling.stratifiedExactSample(df, "label", 3, 11L)
      .as[(String, String)].collect().toSet
    val s2 = util.Sampling.stratifiedExactSample(df, "label", 3, 11L)
      .as[(String, String)].collect().toSet
    val all = df.as[(String, String)].collect().toSet
    assert(s1 === s2)
    assert(s1.subsetOf(all))
  }

  test("balanceToMinClass equalizes every class to the global minimum") {
    val df = corpus(Map("a" -> 17, "b" -> 4, "c" -> 9))
    val out = util.Sampling.balanceToMinClass(df, "label", 5L)
    val counts = out.groupBy("label").count().as[(String, Long)].collect().toMap
    assert(counts === Map("a" -> 4L, "b" -> 4L, "c" -> 4L))
  }

  test("85/15 split partitions the input without overlap") {
    val df = corpus(Map("a" -> 200))
    val (train, test) = util.Sampling.split8515(df, 42L)
    val t = train.as[(String, String)].collect().toSet
    val v = test.as[(String, String)].collect().toSet
    assert((t intersect v).isEmpty)
    assert(t.size + v.size === 200)
    assert(t.size > 140) // loose: Bernoulli split targets 85%
  }
}
