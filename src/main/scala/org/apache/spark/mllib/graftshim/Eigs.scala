package org.apache.spark.mllib.graftshim

import breeze.linalg.{DenseMatrix => BDM, DenseVector => BDV}

import org.apache.spark.mllib.linalg.EigenValueDecomposition

/** Bridge to MLlib's ARPACK driver (`private[mllib]`) — the symmetric
  * top-k eigensolver behind `RowMatrix.computeSVD`'s ARPACK modes.
  * Exposed for [[graft.ml.FastPCA]], which needs top-k eigenpairs of a
  * LOCAL covariance matrix without the full-spectrum LAPACK SVD that
  * `PCA.fit` hardcodes.
  */
object Eigs {

  /** Top-k eigenvalues (descending) and eigenvectors (n×k, column per
    * eigenpair) of the symmetric operator `mul`. Requires k < n.
    */
  def symmetricEigs(mul: BDV[Double] => BDV[Double], n: Int, k: Int,
      tol: Double, maxIterations: Int): (BDV[Double], BDM[Double]) =
    EigenValueDecomposition.symmetricEigs(mul, n, k, tol, maxIterations)
}
