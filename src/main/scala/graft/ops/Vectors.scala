package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed vector aggregates — SURVEY.md §2.4 A5 (grouped vector mean) and
  * §2.12 (UDAF surface).
  *
  * The reference computes per-class mean images with a driver-side loop
  * over classes (/root/reference/main.py:238-243, `np.mean(rows, axis=0)`
  * per class). Here it is ONE distributed aggregation: a typed
  * `Aggregator` doing elementwise sum+count with partial (map-side)
  * combine — at 100 TB this shuffles one 1,024-double buffer per
  * (partition × class), never the rows. Preferred over the
  * posexplode-then-avg SQL shape, which multiplies the row count by the
  * vector width before the shuffle (SURVEY §7.4 risk 5).
  */
object VectorAggs {

  /** Accumulator: elementwise sums + row count. `sums` is empty until
    * the first row so the aggregator is dimension-agnostic.
    */
  case class MeanBuf(var sums: Array[Double], var n: Long)

  /** Output wrapper so the result uses the public product encoder; the
    * column comes back as a struct with a single `values` field.
    */
  case class MeanVec(values: Seq[Double])

  /** A5 — elementwise mean of an array column. */
  class VectorMean extends Aggregator[Seq[Double], MeanBuf, MeanVec] {
    override def zero: MeanBuf = MeanBuf(Array.empty, 0L)

    override def reduce(b: MeanBuf, v: Seq[Double]): MeanBuf = {
      if (v == null) return b
      if (b.sums.isEmpty) b.sums = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { b.sums(i) += v(i); i += 1 }
      b.n += 1
      b
    }

    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf = {
      if (a.sums.isEmpty) return b
      if (b.sums.isEmpty) return a
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      a.n += b.n
      a
    }

    override def finish(b: MeanBuf): MeanVec =
      if (b.n == 0) MeanVec(Seq.empty) else MeanVec(b.sums.map(_ / b.n).toSeq)

    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[MeanVec] = Encoders.product[MeanVec]
  }

  /** Column function: elementwise mean of an array<double> column
    * (returned as the `values` field of the result struct).
    */
  def vectorMean(c: Column): Column = udaf(new VectorMean).apply(c).getField("values")

  /** A5 oracle query — grouped vector mean over embeddings, projected to
    * three spot-check dimensions so the DuckDB oracle can recompute them
    * as plain `avg(vec[i])`.
    */
  def q34MeanVec(spark: org.apache.spark.sql.SparkSession, dir: String):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    Sources.embeddings(spark, dir)
      .withColumn("vec", transform($"embedding", _.cast("double")))
      .groupBy($"label")
      .agg(count(lit(1)).as("n"), vectorMean($"vec").as("mean"))
      .select($"label", $"n",
        round(element_at($"mean", 1), 6).as("m0"),
        round(element_at($"mean", 17), 6).as("m16"),
        round(element_at($"mean", 64), 6).as("m63"))
      .orderBy($"label")
  }
}
