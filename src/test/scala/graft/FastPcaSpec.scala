package graft

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** [[ml.FastPCA]] vs stock `PCA.fit` — the ARPACK top-k eigensolve must
  * agree with the full LAPACK SVD it replaces (same covariance, same
  * eigenspace; vectors may differ by sign).
  */
class FastPcaSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = ml.EmnistFixture.df(spark, dim = 64)
    .select(array_to_vector(transform($"features", _.cast("double"))).as("v"))
    .cache()

  test("matches stock PCA: explained variance and principal directions (k=16, d=64)") {
    val fast = new ml.FastPCA().setInputCol("v").setOutputCol("p").setK(16).fit(vecs)
    val stock = new PCA().setInputCol("v").setOutputCol("p").setK(16).fit(vecs)
    val evF = fast.explainedVariance.toArray
    val evS = stock.explainedVariance.toArray
    assert(evF.length === 16)
    evF.zip(evS).foreach { case (f, s) => assert(math.abs(f - s) < 1e-9) }
    // descending eigenvalues
    assert(evF.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // each fast component is the stock component up to sign:
    // |<pcF_i, pcS_i>| = 1 for unit vectors
    val d = 64
    val pf = fast.pc.toArray; val ps = stock.pc.toArray
    (0 until 16).foreach { c =>
      val dot = (0 until d).map(r => pf(c * d + r) * ps(c * d + r)).sum
      assert(math.abs(math.abs(dot) - 1.0) < 1e-6,
        s"component $c not collinear with stock PCA (|dot|=${math.abs(dot)})")
    }
  }

  test("model is a stock PCAModel: getK, transform width, save/load round-trip") {
    val fast = new ml.FastPCA().setInputCol("v").setOutputCol("p").setK(8).fit(vecs)
    assert(fast.getK === 8)
    val out = fast.transform(vecs)
    val first = out.select("p").head.getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(first.size === 8)
    val dir = java.nio.file.Files.createTempDirectory("fastpca").toString
    fast.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.feature.PCAModel.load(dir)
    assert(loaded.pc.toArray.sameElements(fast.pc.toArray))
    val reOut = loaded.transform(vecs).select("p").head
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(reOut.toArray.sameElements(first.toArray))
  }

  test("k >= d-1 falls back to the full decomposition (ARPACK bound)") {
    val fast = new ml.FastPCA().setInputCol("v").setOutputCol("p").setK(64).fit(vecs)
    assert(fast.getK === 64)
    assert(fast.explainedVariance.toArray.length === 64)
    // full-rank projection preserves the total variance ratio = 1
    assert(math.abs(fast.explainedVariance.toArray.sum - 1.0) < 1e-9)
  }
}
