package graft.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression generating one EMNIST-fixture feature row
  * — BIT-IDENTICAL to the HOF formulation it replaces (asserted in
  * `ImagesSpec`/`MlPipelineSpec` fixture tests and a dedicated equality
  * test): per cell d,
  *
  *   active(label,d)  = pmod(xxhash64(label, d, seed),   5)   == 0
  *   base(label,d)    = pmod(xxhash64(label, d, seed+1), 100) + 100
  *   noise(l,r,d)     = (pmod(xxhash64(label, row, d, seed+2), 2001) − 1000) / 100
  *   cell             = if (active) base + noise else 0
  *
  * using the SAME xxhash64 chain as the builtin (seed 42, fold per
  * argument: string bytes → int → long via `XxHash64Function`).
  *
  * Why: Spark evaluates HOF lambdas interpreted, so the 3 hashes × dim
  * cells per row each paid closure dispatch — generation dominated the
  * rows-only ML queries' wall-clock and the reference-scale probe. Two
  * structural wins besides codegen: the (label, d)-only template terms
  * are computed ONCE per label per JVM (a 39-entry cache) instead of
  * per row, and the per-cell loop is a single JVM pass.
  */
case class EmnistFeatures(left: Expression, right: Expression, dim: Int, seed: Long)
    extends BinaryExpression {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string label, int row_id), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "emnist_features"

  override def nullSafeEval(label: Any, rowId: Any): Any =
    EmnistFeatures.compute(label.asInstanceOf[UTF8String],
      rowId.asInstanceOf[Int], dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.EmnistFeatures$$.MODULE$$" +
        s".compute($l, $r, $dim, ${seed}L);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EmnistFeatures =
    copy(left = newLeft, right = newRight)
}

object EmnistFeatures {

  /** (label, dim, seed) → (active flags, base values) — label-only
    * terms, 39 entries per JVM at the fixture's class count.
    */
  private val templates =
    new ConcurrentHashMap[(String, Int, Long), (Array[Boolean], Array[Double])]

  private def pmod(a: Long, m: Long): Long = { val r = a % m; if (r < 0) r + m else r }

  // InterpretedHashFunction.hash is the public per-value fold the
  // builtin xxhash64 expression applies to each argument in turn
  private def hx(v: Any, dt: DataType, h: Long): Long =
    XxHash64Function.hash(v, dt, h)

  import org.apache.spark.sql.types.LongType

  /** xxhash64(label, d, lit) with the builtin's seed/fold order. */
  private def hashLabelDim(label: UTF8String, d: Int, lit: Long): Long =
    hx(lit, LongType, hx(d, IntegerType, hx(label, StringType, 42L)))

  /** xxhash64(label, row, d, lit) with the builtin's seed/fold order. */
  private def hashCell(label: UTF8String, row: Int, d: Int, lit: Long): Long =
    hx(lit, LongType, hx(d, IntegerType, hx(row, IntegerType, hx(label, StringType, 42L))))

  def compute(label: UTF8String, rowId: Int, dim: Int, seed: Long): ArrayData = {
    val key = (label.toString, dim, seed)
    var tpl = templates.get(key)
    if (tpl == null) {
      val act = new Array[Boolean](dim)
      val base = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        act(d) = pmod(hashLabelDim(label, d, seed), 5L) == 0L
        base(d) = pmod(hashLabelDim(label, d, seed + 1), 100L).toDouble + 100.0
        d += 1
      }
      tpl = (act, base)
      templates.putIfAbsent(key, tpl)
    }
    val (active, base) = tpl
    val out = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (active(d)) {
        val noise =
          (pmod(hashCell(label, rowId, d, seed + 2), 2001L).toDouble - 1000.0) / 100.0
        out(d) = base(d) + noise
      }
      d += 1
    }
    new GenericArrayData(out)
  }
}
