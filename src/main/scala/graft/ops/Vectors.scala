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

  /** Accumulator: elementwise Kahan sums (running sum + compensation)
    * + row count. `sums` is sized from the first row; all rows must
    * share that dimension (enforced — silently padding/truncating
    * ragged input would corrupt means nondeterministically).
    */
  case class MeanBuf(var sums: Array[Double], var comps: Array[Double], var n: Long)

  /** Output wrapper so the result uses the public product encoder; the
    * column comes back as a struct with a single `values` field.
    */
  case class MeanVec(values: Seq[Double])

  /** A5 — elementwise mean of an array column.
    *
    * Sums are Kahan-compensated: plain double accumulation depends on
    * the partition merge order (the q1/q12 oracle-hash flake class —
    * a mean within one accumulated ulp of a 0.5e-6 rounding boundary
    * would flip digits run-to-run). Compensation shrinks the error to
    * ~1 ulp of the true sum regardless of row count, which puts
    * boundary flips out of reach at any scale, while keeping the
    * buffer a flat pair of double arrays (the 100 TB shuffle payload).
    */
  class VectorMean extends Aggregator[Seq[Double], MeanBuf, MeanVec] {
    override def zero: MeanBuf = MeanBuf(Array.empty, Array.empty, 0L)

    private def kahanAdd(b: MeanBuf, i: Int, x: Double): Unit = {
      val y = x - b.comps(i)
      val t = b.sums(i) + y
      b.comps(i) = (t - b.sums(i)) - y
      b.sums(i) = t
    }

    override def reduce(b: MeanBuf, v: Seq[Double]): MeanBuf = {
      if (v == null) return b
      if (b.sums.isEmpty) {
        b.sums = new Array[Double](v.length)
        b.comps = new Array[Double](v.length)
      }
      require(v.length == b.sums.length,
        s"VectorMean requires fixed-dimension input: got ${v.length} after ${b.sums.length}")
      var i = 0
      while (i < v.length) { kahanAdd(b, i, v(i)); i += 1 }
      b.n += 1
      b
    }

    override def merge(a: MeanBuf, b: MeanBuf): MeanBuf = {
      if (a.sums.isEmpty) return b
      if (b.sums.isEmpty) return a
      require(a.sums.length == b.sums.length,
        s"VectorMean requires fixed-dimension input: got ${b.sums.length} vs ${a.sums.length}")
      var i = 0
      while (i < a.sums.length) {
        // fold b's compensated total (sum − comp) into a
        kahanAdd(a, i, b.sums(i))
        kahanAdd(a, i, -b.comps(i))
        i += 1
      }
      a.n += b.n
      a
    }

    override def finish(b: MeanBuf): MeanVec =
      if (b.n == 0) MeanVec(Seq.empty)
      else MeanVec(Array.tabulate(b.sums.length)(i => (b.sums(i) - b.comps(i)) / b.n).toSeq)

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
