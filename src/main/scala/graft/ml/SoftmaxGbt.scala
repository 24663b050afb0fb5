package graft.ml

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.ml.regression.{DecisionTreeRegressionModel, DecisionTreeRegressor}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M5, closed-form: TRUE distributed multiclass gradient boosting.
  *
  * The reference trains a 39-class distributed LightGBM with
  * `tree_learner='data'` (/root/reference/main.py:409-419) — data-parallel
  * histogram tree learning. MLlib's `GBTClassifier` is binary-only, so
  * prior rounds shipped RandomForest (default) and OneVsRest(GBT)
  * (true boosting at #classes × cost) as measured stand-ins. This is
  * the real thing: Friedman's multinomial gradient boosting
  * ("Greedy Function Approximation", Annals of Statistics 2001, §4.6,
  * algorithm 6) — per round, the softmax residual `y_onehot − p` is
  * computed for every class and K regression trees are fit to it, each
  * via MLlib's `DecisionTreeRegressor`, whose per-node statistics are
  * distributed treeAggregate jobs — exactly the data-parallel posture
  * of `tree_learner='data'` (every executor holds a row slice; node
  * stats are merged, rows never move).
  *
  * Differences from LightGBM, stated honestly: leaf values are the
  * tree's mean residual scaled by the learning rate (plain gradient
  * step) rather than the per-leaf Newton step, and trees are depth-wise
  * (MLlib) rather than leaf-wise. Both affect constants, not the
  * algorithm class — this IS K-class boosting in one model, not K
  * independent binary problems.
  *
  * Scale posture (100 TB): per round, ONE pass computes all K
  * residuals (a single array-typed column — no per-class scan), the K
  * tree fits run concurrently as independent Spark jobs (bounded pool,
  * OvR's pattern), and the score update applies the round's K trees in
  * ONE broadcast-models map stage. Scores are `localCheckpoint`ed each
  * round so plan lineage stays O(1) in rounds, the same discipline as
  * the connected-components loop. Nothing ever collects rows to the
  * driver; driver state is the fitted trees themselves (as for every
  * tree ensemble).
  */
object SoftmaxGbt {

  /** A fitted model: initial per-class log-prior scores plus
    * `learningRate`-scaled correction trees, `rounds(m)(k)` = round m's
    * tree for class k.
    */
  case class Model(priors: Array[Double],
      rounds: Vector[Array[DecisionTreeRegressionModel]],
      learningRate: Double) {

    def numClasses: Int = priors.length

    /** Raw (pre-softmax) scores for one feature vector. */
    private def rawScores(f: MlVector): Array[Double] = {
      val s = priors.clone()
      var m = 0
      while (m < rounds.length) {
        val trees = rounds(m)
        var k = 0
        while (k < s.length) {
          s(k) += learningRate * trees(k).predict(f); k += 1
        }
        m += 1
      }
      s
    }

    /** Argmax-class prediction column (ties to the lowest class index,
      * matching MLlib's argmax convention).
      */
    def predictionCol(features: Column): Column = {
      val pred = udf { f: MlVector =>
        val s = rawScores(f)
        var best = 0; var k = 1
        while (k < s.length) { if (s(k) > s(best)) best = k; k += 1 }
        best.toDouble
      }
      pred(features)
    }

    def transform(df: DataFrame, featuresCol: String = "pca"): DataFrame =
      df.withColumn("prediction", predictionCol(col(featuresCol)))
  }

  /** Fit `maxIter` rounds of K-class boosting on `(featuresCol,
    * labelCol)` where labels are `0.0 … numClasses-1` doubles
    * (StringIndexer output). `treeParallelism` bounds concurrent tree
    * fits per round (jobs contend on the DAGScheduler event loop, not
    * cores — the measured q32 OvR finding).
    */
  def fit(train: DataFrame, numClasses: Int, featuresCol: String = "pca",
      labelCol: String = "label_idx", maxIter: Int = 10, maxDepth: Int = 4,
      learningRate: Double = 0.3, treeParallelism: Int = 8,
      seed: Long = 42L): Model = {
    val spark = train.sparkSession
    require(maxIter >= 1 && numClasses >= 2)

    // Initial scores = log class priors (LightGBM's multiclass init),
    // +1 smoothing so a class absent from a small train split stays
    // finite. One tiny grouped aggregate — numClasses rows to driver.
    val counts = train.groupBy(col(labelCol).cast("int").as("y")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble + numClasses
    val priors = Array.tabulate(numClasses)(k =>
      math.log((counts.getOrElse(k, 0L) + 1L) / total))

    val kLits = array(priors.toSeq.map(lit): _*)
    var cur = train
      .select(col(featuresCol).as("f"), col(labelCol).cast("int").as("y"))
      .withColumn("s", kLits)
      .localCheckpoint(true)

    val pool = Executors.newFixedThreadPool(math.max(1, treeParallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val rounds = Vector.newBuilder[Array[DecisionTreeRegressionModel]]
      for (m <- 0 until maxIter) {
        // One pass, all K residuals: r_k = 1{y=k} − softmax(s)_k.
        val residuals = udf { (y: Int, s: Seq[Double]) =>
          val mx = s.max
          val ex = s.map(v => math.exp(v - mx))
          val z = ex.sum
          Array.tabulate(s.length)(k =>
            (if (k == y) 1.0 else 0.0) - ex(k) / z)
        }
        val withRes = cur.withColumn("r", residuals(col("y"), col("s")))
          .localCheckpoint(true)
        val fits = (0 until numClasses).map { k =>
          Future {
            new DecisionTreeRegressor()
              .setFeaturesCol("f").setLabelCol("rk")
              .setMaxDepth(maxDepth).setMinInstancesPerNode(2)
              .setSeed(seed + m.toLong * numClasses + k)
              .fit(withRes.select(col("f"),
                element_at(col("r"), k + 1).as("rk")))
          }
        }
        val trees = Await.result(Future.sequence(fits), Duration.Inf).toArray
        rounds += trees
        // One broadcast-models map stage updates all K scores.
        val bTrees = spark.sparkContext.broadcast(trees)
        val lr = learningRate
        val update = udf { (f: MlVector, s: Seq[Double]) =>
          val t = bTrees.value
          Array.tabulate(s.length)(k => s(k) + lr * t(k).predict(f))
        }
        cur = cur.select(col("f"), col("y"),
          update(col("f"), col("s")).as("s")).localCheckpoint(true)
      }
      Model(priors, rounds.result(), learningRate)
    } finally pool.shutdown()
  }

  /** ORACLED exercise (q97): true multiclass boosting end-to-end on a
    * ten-class slice of the EMNIST-analog fixture — 85/15 split, 5
    * boosting rounds of 10 depth-3 trees on raw 64-dim features (the
    * feature stack is q32's subject; here the boosting is). The oracle
    * pins the invariant booleans: holdout accuracy ≥ 0.9 on the
    * separable fixture, the boosted model beats the priors-only
    * predictor, and train deviance decreases monotonically with rounds
    * (the objective the residuals descend — the signature of boosting
    * actually boosting, not K independent fits). Fit numerics are
    * engine-specific but fully seeded, so the booleans are stable.
    */
  def q97SoftmaxGbt(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val data = EmnistFixture.tenClassFrame(spark).cache()
    val (train, test) = graft.util.Sampling.split8515(data, 42L)
    val model = fit(train, numClasses = 10, maxIter = 5, maxDepth = 3,
      seed = 42L)
    // ONE aggregate over the holdout computes nTest and both match
    // counts (boosted model + priors-only predictor): the three
    // separate count() actions each re-ran the split filter and the
    // model UDF's job machinery. Same counts, one pass.
    val accRow = test
      .select(model.predictionCol(col("pca")).as("p"),
        model.copy(rounds = Vector.empty).predictionCol(col("pca")).as("p0"),
        col("label_idx"))
      .agg(count(lit(1)).as("n"),
        count(when(col("p") === col("label_idx"), lit(1))).as("hit"),
        count(when(col("p0") === col("label_idx"), lit(1))).as("hit0"))
      .head()
    val nTest = accRow.getLong(0).toDouble
    val acc = accRow.getLong(1) / nTest
    val accPriors = accRow.getLong(2) / nTest
    val devs = devianceByRound(model, train)
    data.unpersist(false)
    Seq((
      "softmax_gbt", 10, acc >= 0.9, acc > accPriors,
      devs.zip(devs.tail).forall { case (a, b) => b < a }))
      .toDF("model", "n_classes", "acc_ok", "beats_priors",
        "deviance_monotone")
  }

  /** Mean multinomial deviance (−log-likelihood) of a fitted model on
    * `df` — the boosting objective itself; tests assert it decreases
    * with rounds.
    */
  def deviance(model: Model, df: DataFrame, featuresCol: String = "pca",
      labelCol: String = "label_idx"): Double = {
    val nll = udf { (f: MlVector, y: Int) =>
      val s = model.priors.clone()
      model.rounds.foreach { trees =>
        var k = 0
        while (k < s.length) {
          s(k) += model.learningRate * trees(k).predict(f); k += 1
        }
      }
      val mx = s.max
      val z = s.map(v => math.exp(v - mx)).sum
      -(s(y) - mx - math.log(z))
    }
    df.select(avg(nll(col(featuresCol), col(labelCol).cast("int"))))
      .head().getDouble(0)
  }

  /** Train-deviance trajectory [d₀ … d_rounds] (d_m = [[deviance]] of
    * the model truncated to m rounds) in ONE pass: the per-row UDF
    * accumulates raw scores round by round — the same priors-then-
    * round-order accumulation the truncated-model sweep performs — and
    * emits the NLL after every prefix, so each row applies each tree
    * exactly once (the old 0..rounds sweep re-applied every accumulated
    * tree per prefix: O(rounds²) tree applications and rounds+1 Spark
    * jobs). Per-row values are bit-identical to the sweep's (identical
    * accumulation order and NLL algebra); the per-prefix `avg`s
    * aggregate the same rows under the same partitioning, so the
    * trajectory — and q97's monotonicity boolean — is unchanged.
    */
  def devianceByRound(model: Model, df: DataFrame,
      featuresCol: String = "pca",
      labelCol: String = "label_idx"): Seq[Double] = {
    val nRounds = model.rounds.length
    val nlls = udf { (f: MlVector, y: Int) =>
      val s = model.priors.clone()
      val out = new Array[Double](nRounds + 1)
      def nll(): Double = {
        val mx = s.max
        val z = s.map(v => math.exp(v - mx)).sum
        -(s(y) - mx - math.log(z))
      }
      out(0) = nll()
      var m = 0
      while (m < nRounds) {
        val trees = model.rounds(m)
        var k = 0
        while (k < s.length) {
          s(k) += model.learningRate * trees(k).predict(f); k += 1
        }
        out(m + 1) = nll()
        m += 1
      }
      out
    }
    val aggs = (0 to nRounds).map(m =>
      avg(element_at(col("nll"), m + 1)).as(s"d$m"))
    val row = df
      .select(nlls(col(featuresCol), col(labelCol).cast("int")).as("nll"))
      .agg(aggs.head, aggs.tail: _*)
      .head()
    (0 to nRounds).map(row.getDouble)
  }
}
