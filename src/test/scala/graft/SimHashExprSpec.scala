package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftColumns.simHash64

/** The fused [[graft.expressions.SimHash64]] kernel vs the relational
  * explode → xxhash64 → 64-bit-vote formulation it replaced on the q38
  * path ([[graft.ops.Text.simhashViaAggregation]]).
  */
class SimHashExprSpec extends SparkTestBase {
  import spark.implicits._

  test("kernel fingerprints are bit-identical to the aggregation formulation on the fixture corpus") {
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val viaAgg = ops.Text.simhashViaAggregation(docs)
      .as[(Long, Long)].collect().toMap
    val viaKernel = docs.select($"doc_id", simHash64($"text").as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(viaKernel.nonEmpty)
    assert(viaKernel === viaAgg)
  }

  test("kernel matches the aggregation on split edge cases (empty, repeated, multi-space tokens)") {
    val docs = Seq(
      (1L, ""),                 // split -> [""]
      (2L, "a  b"),             // consecutive separators -> empty middle token
      (3L, "a b a b a"),        // duplicates dedup before voting
      (4L, "trailing space "),  // Java split limit -1 keeps the trailing empty
      (5L, "x")).toDF("doc_id", "text")
    val viaAgg = ops.Text.simhashViaAggregation(docs)
      .as[(Long, Long)].collect().toMap
    val viaKernel = docs.select($"doc_id", simHash64($"text").as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(viaKernel === viaAgg)
  }

  test("property: kernel == aggregation on random token soup (spaces, empties, repeats, unicode)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // scalatest-plus bridge absent offline -> draw cases explicitly
    val token = Gen.oneOf(
      Gen.stringOfN(3, Gen.alphaLowerChar),
      Gen.oneOf("", " ", "  "),          // separator pile-ups -> empty tokens
      Gen.oneOf("a", "ab", "naïve", "日本語", "x9!"))
    val docGen = Gen.listOfN(12, token).map(_.mkString(" "))
    val docs = (0 until 40).flatMap(i => docGen(Gen.Parameters.default, Seed(i.toLong)))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    assert(docs.size === 40)
    val df = docs.toDF("doc_id", "text")
    val viaAgg = ops.Text.simhashViaAggregation(df).as[(Long, Long)].collect().toMap
    val viaKernel = df.select($"doc_id", simHash64($"text").as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(viaKernel === viaAgg)
  }

  test("fingerprinting is a map-only stage: no shuffle below the fingerprint projection") {
    val fp = ops.Sources.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", simHash64($"text").as("simhash"))
    // String-match the plan (q58-test pattern): a typed collect for
    // ShuffleExchangeLike cannot descend into AdaptiveSparkPlanExec
    // (a leaf), so with AQE on it would pass VACUOUSLY if a shuffle
    // were ever reintroduced — the printed plan always shows it.
    val plan = fp.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected zero exchanges under the fingerprint projection, got:\n$plan")
  }

  test("identical docs collide; hamming respects single-token edits") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val fp = docs.select($"doc_id", simHash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L))
    val hamming = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(hamming > 0 && hamming <= 32, s"one-token edit at hamming $hamming")
  }
}
