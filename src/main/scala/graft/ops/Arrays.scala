package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Array / higher-order-function family — SURVEY.md §2.9 (array row) and
  * the P2/A4 elementwise idiom.
  *
  * The reference's NumPy elementwise ops (`X == 0` sparsity at
  * /root/reference/main.py:229-235) map to Catalyst higher-order
  * functions over the array column — transform/filter/aggregate/zip_with/
  * slice — which stay inside codegen and never explode rows.
  */
object Arrays {

  /** P2/A4 + §2.9 array HOFs — per-vector statistics over the 64-d
    * embedding: dimensionality (size), negative-element count (filter),
    * L1 norm (transform+aggregate), prefix sum (slice+aggregate).
    * Everything computed in double after an explicit float→double cast so
    * accumulation matches the oracle exactly.
    */
  def q28Hof(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sum0 = (c: org.apache.spark.sql.Column) =>
      aggregate(c, lit(0.0), (acc, x) => acc + x)
    Sources.embeddings(spark, dir)
      .withColumn("vec", transform($"embedding", _.cast("double")))
      .select(
        $"vec_id",
        size($"vec").as("n_dims"),
        size(filter($"vec", _ < 0.0)).as("n_neg"),
        round(sum0(transform($"vec", abs(_))), 6).as("l1"),
        round(sum0(slice($"vec", 1, 8)), 6).as("first8_sum"))
      .orderBy($"vec_id")
  }

  /** A4 corpus-level sparsity — the direct analogue of the reference's
    * `(X == 0).sum() / X.size` (main.py:229-235), over embeddings:
    * fraction of near-zero cells across the whole matrix, from exact
    * integer counts (order-independent).
    */
  def q31Sparsity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.embeddings(spark, dir)
      .select(
        size(filter(transform($"embedding", _.cast("double")),
          x => abs(x) < 0.1)).as("n_small"),
        size($"embedding").as("n_dims"))
      .agg(
        sum($"n_small").as("n_small_total"),
        sum($"n_dims").as("n_cells"),
        round(sum($"n_small").cast("double") / sum($"n_dims"), 6)
          .as("small_frac"))
  }
}
