package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.feature.{PCAModel, StandardScalerModel}
import org.apache.spark.ml.linalg.{DenseVector, Vector => MlVector, Vectors}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.StructType

/** M3 — inverse of the scaler∘PCA feature pipeline, for reconstructing
  * (misclassified) rows in original feature space. The reference calls
  * `ss.inverse_transform(ipca.inverse_transform(X))`
  * (/root/reference/main.py:443-446); MLlib has no built-in inverse, so
  * this small Transformer computes
  *
  *   x ≈ (P · y) ∘ σ + μ
  *
  * with P = `PCAModel.pc` (nFeatures × k, column-major principal
  * components), σ/μ from the `StandardScalerModel`. Runs as a plain
  * projection per row (distributed, no collect — the reference only ever
  * inverts 15 rows, main.py:445, but this scales to all of them).
  */
class InversePca(
    override val uid: String,
    pca: PCAModel,
    scaler: StandardScalerModel,
    inputCol: String,
    outputCol: String) extends Transformer {

  def this(pca: PCAModel, scaler: StandardScalerModel, inputCol: String, outputCol: String) =
    this(Identifiable.randomUID("inversePca"), pca, scaler, inputCol, outputCol)

  override def transform(ds: Dataset[_]): DataFrame = {
    val pc = pca.pc // nFeatures x k
    val mean = scaler.mean.toArray
    val std = scaler.std.toArray
    val withStd = scaler.getWithStd
    val withMean = scaler.getWithMean
    val invert = udf { y: MlVector =>
      val ya = y.toArray
      val n = pc.numRows
      val k = pc.numCols
      val out = new Array[Double](n)
      // out = P * y; pc is column-major
      var j = 0
      while (j < k) {
        val yj = ya(j)
        val off = j * n
        var i = 0
        while (i < n) { out(i) += pc.values(off + i) * yj; i += 1 }
        j += 1
      }
      var i = 0
      while (i < n) {
        if (withStd) out(i) *= std(i)
        if (withMean) out(i) += mean(i)
        i += 1
      }
      new DenseVector(out): MlVector
    }
    ds.withColumn(outputCol, invert(ds(inputCol)))
  }

  override def copy(extra: ParamMap): InversePca =
    new InversePca(uid, pca, scaler, inputCol, outputCol)

  override def transformSchema(schema: StructType): StructType =
    schema.add(outputCol, org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
}
