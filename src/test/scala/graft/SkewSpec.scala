package graft

import org.apache.spark.sql.functions._

/** Salting correctness (100 TB skew posture): salted plans must return
  * exactly what the unsalted plans return.
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // hot key: 900 of 1000 rows share key 1
  private lazy val skewed = ((1 to 900).map(_ => 1L) ++ (1 to 100).map(_.toLong + 1))
    .toDF("k").withColumn("payload", monotonically_increasing_id())
  private lazy val dim = (1L to 101L).map(k => (k, s"name$k")).toDF("k", "name")

  test("saltedJoin equals the plain join") {
    val plain = skewed.join(dim, "k").groupBy($"k").count()
    val salted = util.Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy($"k").count()
    assert(salted.as[(Long, Long)].collect().toMap ===
      plain.as[(Long, Long)].collect().toMap)
  }

  test("saltedCount equals the plain groupBy count and spreads the hot key") {
    val out = util.Skew.saltedCount(skewed, "k", salts = 8)
      .as[(Long, Long)].collect().toMap
    assert(out(1L) === 900L)
    assert(out.size === 101)
    // the IMPLEMENTATION's intermediate really splits key 1 into
    // multiple partials (asserting on a locally rebuilt salt column
    // would pass even if saltedCount stopped salting)
    val partials = util.Skew.saltedPartials(skewed, "k", salts = 8)
      .filter($"k" === 1).count()
    assert(partials > 1)
  }
}
