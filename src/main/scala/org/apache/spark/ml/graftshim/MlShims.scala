package org.apache.spark.ml.graftshim

import org.apache.spark.ml.feature.PCAModel
import org.apache.spark.ml.linalg.{DenseMatrix, DenseVector}

/** Constructors for fitted MLlib models whose primary constructors are
  * `private[ml]`. Same shim pattern as
  * [[org.apache.spark.sql.graftshim.GraftColumns]]: lives under
  * `org.apache.spark.ml` solely for access; no Spark internals are
  * modified. Used by [[graft.ml.FastPCA]] to wrap an independently
  * computed eigendecomposition in the STANDARD `PCAModel`, so
  * transform/persistence/load are the stock implementations.
  */
object Models {

  /** A real `PCAModel` from precomputed principal components +
    * explained-variance ratios, with `k`/`inputCol`/`outputCol` set so
    * downstream `getK`/`transformSchema` behave exactly like a model
    * from `PCA.fit`.
    */
  def pcaModel(uid: String, pc: DenseMatrix, explainedVariance: DenseVector,
      inputCol: String, outputCol: String): PCAModel = {
    val m = new PCAModel(uid, pc, explainedVariance)
    m.set(m.k, pc.numCols)
    m.setInputCol(inputCol).setOutputCol(outputCol)
  }
}
