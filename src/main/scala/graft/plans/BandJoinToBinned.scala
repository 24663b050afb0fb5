package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a non-equi "band join" — an inner join whose
  * only cross-side predicates bound one fact-side value between a
  * lower and an upper attribute of a LITERAL band table — into a binned
  * EQUI-join, automatically.
  *
  * This is the (c)-tier escalation of the q67 pattern (see
  * `Joins.q67BinnedBandJoin` for the hand-written shape and its
  * Scaladoc for the algebra): without it a `fact JOIN bands ON lo <= v
  * AND v < hi` can only plan as a nested-loop join, which evaluates
  * |fact| × |bands| predicates — fine for q17's 4 literal rows, fatal
  * when the band table has thousands of rows at 100 TB of fact. The
  * rewrite:
  *
  *  1. picks a bin width `w` so that the band table explodes into at
  *     most ~1k extra rows (driver-side arithmetic over the literal
  *     lo/hi values — the band table is a `LocalRelation`, so the
  *     bounds are known at optimization time);
  *  2. explodes each band row into one copy per overlapped bin
  *     (`floor(lo/w) .. floor(hi/w)`);
  *  3. adds `floor(v/w)` to the fact side as an 8-byte join key;
  *  4. joins on bin EQUALITY, keeping the original range predicate as
  *     a residual filter on the join, and restores the original output.
  *
  * A (fact row, band row) pair can meet in at most one bin — the fact
  * row has exactly one bin value — so the rewrite is duplicate-free
  * even for OVERLAPPING bands, and the residual keeps exact semantics
  * for any bin width. The exploded LocalRelation stays well under the
  * broadcast threshold, so the planner picks `BroadcastHashJoin`
  * (asserted in ExtensionsSpec); with a huge band table the same
  * rewrite would fall back to a keyed shuffle join — still O(rows),
  * never O(rows × bands).
  *
  * Fire conditions (all required — the rule declines anything else):
  *  - inner join, band side is a `LocalRelation` of ≤ `maxBandRows`;
  *  - the condition's cross-side conjuncts are exactly one lower and
  *    one upper bound on the SAME deterministic double-typed fact
  *    expression, each against a double attribute of the band side
  *    (fact-only / band-only conjuncts ride along untouched);
  *  - no cross-side equi conjunct already exists (then the join is
  *    already hash-joinable, and this also makes the rule a fixpoint:
  *    its own output contains the bin equality).
  */
object BandJoinToBinned extends Rule[LogicalPlan] with PredicateHelper {

  private val maxBandRows = 10000
  private val targetBins = 1024

  /** (factValueExpr, bandBoundAttr, isLowerBound) for a single
    * comparison conjunct, if it is a cross-side range bound.
    */
  private def asBound(
      e: Expression,
      fact: LogicalPlan,
      band: LogicalPlan): Option[(Expression, Attribute, Boolean)] = {
    def split(v: Expression, b: Expression, lower: Boolean) = b match {
      case a: Attribute
          if v.references.subsetOf(fact.outputSet) &&
            band.outputSet.contains(a) && v.deterministic &&
            v.dataType == DoubleType && a.dataType == DoubleType =>
        Some((v, a, lower))
      case _ => None
    }
    // which operand is the fact value and which the band bound is
    // decided by attribute ownership, not pattern position: x >= y is a
    // LOWER bound when x is the fact side (v >= lo) and an UPPER bound
    // when y is (hi >= v)
    e match {
      case GreaterThanOrEqual(x, y) =>
        split(x, y, lower = true).orElse(split(y, x, lower = false))
      case GreaterThan(x, y) =>
        split(x, y, lower = true).orElse(split(y, x, lower = false))
      case LessThan(x, y) =>
        split(x, y, lower = false).orElse(split(y, x, lower = true))
      case LessThanOrEqual(x, y) =>
        split(x, y, lower = false).orElse(split(y, x, lower = true))
      case _ => None
    }
  }

  private def crossSide(e: Expression, fact: LogicalPlan, band: LogicalPlan): Boolean =
    e.references.intersect(fact.outputSet).nonEmpty &&
      e.references.intersect(band.outputSet).nonEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(fact, band: LocalRelation, Inner, Some(cond), hint)
        if band.data.length <= maxBandRows =>
      val conjuncts = splitConjunctivePredicates(cond)
      val cross = conjuncts.filter(crossSide(_, fact, band))
      val bounds = cross.map(asBound(_, fact, band))
      // every cross-side conjunct must be a range bound: one lower, one
      // upper, on the same fact expression
      if (cross.size != 2 || bounds.exists(_.isEmpty)) j
      else {
        (bounds(0).get, bounds(1).get) match {
          case ((v1, lo, true), (v2, hi, false)) if v1.semanticEquals(v2) =>
            rewrite(j, fact, band, cond, v1, lo, hi, hint)
          case ((v1, hi, false), (v2, lo, true)) if v1.semanticEquals(v2) =>
            rewrite(j, fact, band, cond, v1, lo, hi, hint)
          case _ => j
        }
      }
  }

  private def rewrite(
      j: Join,
      fact: LogicalPlan,
      band: LocalRelation,
      cond: Expression,
      v: Expression,
      lo: Attribute,
      hi: Attribute,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint): LogicalPlan = {
    val loIdx = band.output.indexWhere(_.exprId == lo.exprId)
    val hiIdx = band.output.indexWhere(_.exprId == hi.exprId)
    val rows = band.data
    def finite(d: Double) = !d.isNaN && !d.isInfinite
    val spans = rows.flatMap { r =>
      if (r.isNullAt(loIdx) || r.isNullAt(hiIdx)) None
      else {
        val l = r.getDouble(loIdx)
        val h = r.getDouble(hiIdx)
        if (finite(l) && finite(h) && h >= l) Some((r, l, h)) else None
      }
    }
    val totalSpan = spans.map { case (_, l, h) => h - l }.sum
    if (totalSpan <= 0.0 || spans.isEmpty) return j
    val w = totalSpan / targetBins
    // driver-side bin math mirrors Catalyst Floor(Divide) on doubles
    // exactly — both are IEEE division + math.floor
    val binAttr = AttributeReference("graft_band_bin", LongType, nullable = false)()
    val binnedRows: Seq[InternalRow] = spans.flatMap { case (r, l, h) =>
      val b0 = math.floor(l / w).toLong
      val b1 = math.floor(h / w).toLong
      (b0 to b1).map(b => InternalRow.fromSeq(r.toSeq(band.schema) :+ b))
    }
    val binnedBand = LocalRelation(band.output :+ binAttr, binnedRows)
    val factBin = Alias(Floor(Divide(v, Literal(w, DoubleType))), "graft_band_bin_f")()
    val factWithBin = Project(fact.output :+ factBin, fact)
    val newJoin = Join(
      factWithBin, binnedBand, Inner,
      Some(And(EqualTo(factBin.toAttribute, binAttr), cond)), hint)
    Project(j.output, newJoin)
  }
}
