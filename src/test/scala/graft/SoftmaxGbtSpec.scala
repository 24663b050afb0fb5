package graft

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

import graft.ml.{EmnistFixture, SoftmaxGbt}

/** M5 true multiclass boosting — Friedman multinomial GBM on MLlib's
  * distributed regression trees (`ml/SoftmaxGbt.scala`).
  */
class SoftmaxGbtSpec extends SparkTestBase {
  import spark.implicits._

  // Six-class slice of the separable fixture, raw 64-dim features —
  // small enough that 5 rounds × 6 trees fit in seconds.
  private lazy val data = {
    val keep = EmnistFixture.classes.take(6)
    EmnistFixture.df(spark, dim = 64)
      .filter($"label".isInCollection(keep))
      .withColumn("label_idx",
        array_position(
          array(keep.map(lit): _*), $"label").cast("double") - 1)
      .withColumn("pca", array_to_vector($"features"))
      .select($"label_idx", $"pca")
      .cache()
  }

  private lazy val model =
    SoftmaxGbt.fit(data, numClasses = 6, maxIter = 5, maxDepth = 3,
      seed = 7L)

  test("fits the separable fixture to high accuracy") {
    val pred = model.transform(data)
    val acc = pred.filter($"prediction" === $"label_idx").count().toDouble /
      data.count()
    assert(acc >= 0.95, s"softmax-GBT accuracy $acc on separable data")
  }

  test("boosting rounds monotonically decrease train deviance") {
    // Truncated models reuse the fitted trees — deviance after m rounds
    // must strictly improve on m-1 (the objective the residuals descend).
    val devs = (0 to model.rounds.length).map { m =>
      SoftmaxGbt.deviance(model.copy(rounds = model.rounds.take(m)), data)
    }
    assert(devs.zip(devs.tail).forall { case (a, b) => b < a },
      s"deviance not monotone: $devs")
  }

  test("single-pass devianceByRound equals the truncated-model sweep") {
    // q97's one-pass trajectory must reproduce the O(rounds²) sweep
    // bit-for-bit: same priors-then-round-order score accumulation per
    // row, same NLL algebra, same avg over the same rows.
    val sweep = (0 to model.rounds.length).map { m =>
      SoftmaxGbt.deviance(model.copy(rounds = model.rounds.take(m)), data)
    }
    val onePass = SoftmaxGbt.devianceByRound(model, data)
    assert(onePass.size === sweep.size)
    sweep.zip(onePass).zipWithIndex.foreach { case ((a, b), m) =>
      assert(a === b, s"prefix $m: sweep $a vs one-pass $b")
    }
  }

  test("beats the priors-only model by a wide margin") {
    val priorsOnly = model.copy(rounds = Vector.empty)
    val accP = priorsOnly.transform(data)
      .filter($"prediction" === $"label_idx").count().toDouble / data.count()
    val accB = model.transform(data)
      .filter($"prediction" === $"label_idx").count().toDouble / data.count()
    // priors-only predicts the majority class everywhere
    assert(accP < 0.5 && accB > accP + 0.4, s"priors $accP vs boosted $accB")
  }

  test("same seed reproduces identical predictions") {
    val again =
      SoftmaxGbt.fit(data, numClasses = 6, maxIter = 5, maxDepth = 3,
        seed = 7L)
    val a = model.transform(data).select($"label_idx", $"prediction")
      .orderBy($"label_idx", $"prediction").collect().toSeq
    val b = again.transform(data).select($"label_idx", $"prediction")
      .orderBy($"label_idx", $"prediction").collect().toSeq
    assert(a === b)
  }
}
