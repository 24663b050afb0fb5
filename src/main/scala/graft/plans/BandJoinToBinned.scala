package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, JoinHint, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftshim.GraftPlans
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a non-equi "band join" — an inner join whose
  * only cross-side predicates bound one fact-side value between a
  * lower and an upper expression of a SMALL band table — into a binned
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
  *  1. materializes the band rows at planning time — directly for a
  *     `LocalRelation`, via a bounded driver read (`executeTake`, the
  *     same materialization a broadcast join does at execution) for a
  *     small deterministic non-literal side such as a parquet band dim;
  *  2. picks a bin width `w` so that the band table explodes into at
  *     most ~1k extra rows;
  *  3. explodes each band row into one copy per overlapped bin;
  *  4. adds the same bin function of `v` to the fact side as an 8-byte
  *     join key;
  *  5. joins on bin EQUALITY, keeping the original range predicate as
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
  * Bin function by comparison type — the driver-side enumeration and
  * the fact-side Catalyst expression MUST be the same mapping, which
  * each branch pins to a probed Catalyst identity (ExtensionsSpec +
  * BandJoinPropertySpec assert rewrite ≡ nested-loop over randomized
  * band sets, negatives and extremes included):
  *
  *  - byte/short/int/long: `v div w` (`IntegralDivide`), truncating
  *    toward zero exactly like Scala `Long./` — bins stay in the exact
  *    integral domain, so 64-bit epoch-micros never round through a
  *    double;
  *  - timestamp/date: the SAME integral path over the type's exact
  *    internal 64-bit domain — `unix_micros(v)` (micros) for
  *    timestamps, `unix_date(v)` (days) for dates, matching what a
  *    driver-side `eval` of the band bounds returns. Time ranges are
  *    the most common band shape in practice (calendar rollups, SCD-2
  *    validity windows), and they bin with zero precision loss;
  *  - float/double/decimal: `floor((v cast double) / w)`; decimal and
  *    float go through the SAME cast-to-double both sides, which is
  *    monotone, so a value inside [lo, hi] can never bin outside
  *    [bin(lo), bin(hi)].
  *
  * Fire conditions (all required — the rule declines anything else,
  * leaving the original join untouched):
  *  - inner join; one side's rows are obtainable at planning time and
  *    number ≤ `maxBandRows` (any `LocalRelation`, or a non-streaming
  *    deterministic plan whose stats say ≤ `maxMaterializeBytes`);
  *  - the condition's cross-side conjuncts are exactly one lower and
  *    one upper bound on the SAME deterministic numeric fact
  *    expression, each against a deterministic same-typed expression
  *    over the band side, plus any number of plain cross-side EQUI
  *    conjuncts (the per-group band shape: price tiers per region,
  *    rate schedules per tenant). Equi conjuncts ride along into the
  *    rewritten condition, where the planner extracts them alongside
  *    the bin equality as a composite hash key — without the bin, a
  *    low-cardinality group key hash-joins each fact row against ALL
  *    of its group's bands; with it, against ~1. Fact-only /
  *    band-only conjuncts ride along untouched. Fixpoint guard: the
  *    rule's own output contains an equi conjunct on the synthetic
  *    `graft_band_bin` attribute, which declines re-entry (the name
  *    is reserved to this rule);
  *  - every band bound is orderable under the rewrite: a NaN or ±Inf
  *    bound declines the WHOLE rewrite (such a row matches fact rows
  *    in the original join — e.g. `v < +Inf` is true for all finite v —
  *    so dropping it would silently change results); NULL bounds match
  *    nothing in both shapes and are safely dropped;
  *  - floating bin ids stay below 2^62 in magnitude, far from the
  *    `floor` saturation edge at ±2^63.
  */
object BandJoinToBinned extends Rule[LogicalPlan] with PredicateHelper {

  /** Band sides up to this many rows are materialized at plan time and
    * exploded into a broadcastable LocalRelation; LARGER deterministic
    * batch band sides take the distributed fallback ([[rewriteLarge]])
    * instead of declining to a nested loop. Conf-settable so tests can
    * force the fallback path with small inputs.
    */
  private def maxBandRows: Int =
    conf.getConfString("spark.graft.bandJoin.maxBandRows", "10000").toInt
  private val targetBins = 1024
  /** Decline floating rewrites whose bin ids would approach the Long
    * saturation edge of `(long) Math.floor(x)`.
    */
  private val maxBinMagnitude = math.pow(2, 62)
  /** Largest non-literal band side (by plan stats) we are willing to
    * materialize with a bounded driver read at planning time.
    */
  private val maxMaterializeBytes = BigInt(8L << 20)
  /** Backstop on the exploded band relation — with `w` derived from the
    * total span this sits near `targetBins + 2·|bands|`, but degenerate
    * float spans are declined rather than reasoned about.
    */
  private val maxExplodedRows = 8 * maxBandRows

  private def supportedType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case TimestampType | DateType => true
    case FloatType | DoubleType => true
    case _: DecimalType => true
    case _ => false
  }

  /** (factValueExpr, bandBoundExpr, isLowerBound) for a single
    * comparison conjunct, if it is a cross-side range bound between
    * deterministic same-typed numeric expressions.
    */
  private def asBound(
      e: Expression,
      fact: LogicalPlan,
      band: LogicalPlan): Option[(Expression, Expression, Boolean)] = {
    def split(v: Expression, b: Expression, lower: Boolean) =
      if (v.references.nonEmpty && v.references.subsetOf(fact.outputSet) &&
          b.references.nonEmpty && b.references.subsetOf(band.outputSet) &&
          v.deterministic && b.deterministic &&
          v.dataType == b.dataType && supportedType(v.dataType)) {
        Some((v, b, lower))
      } else None
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

  /** A deterministic cross-side equality — already hash-joinable on its
    * own, and safe to carry into the rewritten join as an extra key.
    */
  private def isEqui(e: Expression, fact: LogicalPlan, band: LogicalPlan): Boolean = {
    def oneSide(v: Expression, side: LogicalPlan) =
      v.references.nonEmpty && v.references.subsetOf(side.outputSet) && v.deterministic
    e match {
      case EqualTo(x, y) =>
        (oneSide(x, fact) && oneSide(y, band)) ||
          (oneSide(y, fact) && oneSide(x, band))
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      // the rewritten join is always Join(fact, binnedBand): when the
      // band side was the LEFT input the per-side hints must swap with
      // it, or a user's broadcast(bands) hint would re-attach to the
      // fact side — exactly the side that must NOT be broadcast
      tryRewrite(j, fact = left, band = right, cond, hint)
        .orElse(tryRewrite(j, fact = right, band = left, cond,
          JoinHint(leftHint = hint.rightHint, rightHint = hint.leftHint)))
        .getOrElse(j)
  }

  private def tryRewrite(
      j: Join,
      fact: LogicalPlan,
      band: LogicalPlan,
      cond: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val cross = conjuncts.filter(crossSide(_, fact, band))
    // fixpoint: the rule's own output joins on the synthetic bin
    // attribute — re-matching it would explode the band side again
    if (cross.exists(_.references.exists(_.name == "graft_band_bin"))) return None
    // cross-side conjuncts: any number of plain equalities (per-group
    // bands; they become extra hash keys) plus EXACTLY one lower and
    // one upper range bound on the same fact expression
    val nonEqui = cross.filterNot(isEqui(_, fact, band))
    if (nonEqui.size != 2) return None
    val bounds = nonEqui.map(asBound(_, fact, band))
    if (bounds.exists(_.isEmpty)) return None
    val (v, loE, hiE) = (bounds(0).get, bounds(1).get) match {
      case ((v1, lo, true), (v2, hi, false)) if v1.semanticEquals(v2) => (v1, lo, hi)
      case ((v1, hi, false), (v2, lo, true)) if v1.semanticEquals(v2) => (v1, lo, hi)
      case _ => return None
    }
    bandSideOf(band) match {
      case Materialized(rows) =>
        rewrite(j, fact, band, rows, cond, v, loE, hiE, hint)
      case TooLarge =>
        rewriteLarge(j, fact, band, cond, v, loE, hiE, hint)
      case Unusable => None
    }
  }

  private sealed trait BandSide
  private case class Materialized(rows: Seq[InternalRow]) extends BandSide
  /** Deterministic batch band side that exceeds the materialization
    * budget — eligible for the distributed fallback.
    */
  private case object TooLarge extends BandSide
  private case object Unusable extends BandSide

  /** The band side's rows, if obtainable at planning time within
    * budget: a `LocalRelation` reads free; a deterministic batch plan
    * whose stats fit `maxMaterializeBytes` is executed with a bounded
    * `executeTake`. Oversized-but-deterministic sides report
    * [[TooLarge]] for the distributed fallback. Non-deterministic
    * plans must not be materialized at plan time — the snapshot would
    * disagree with an execution-time evaluation.
    */
  private def bandSideOf(band: LogicalPlan): BandSide = band match {
    case lr: LocalRelation =>
      if (lr.data.length <= maxBandRows) Materialized(lr.data) else TooLarge
    case p =>
      val deterministic = !p.exists(_.expressions.exists(!_.deterministic))
      val small = p.stats.sizeInBytes <= maxMaterializeBytes ||
        p.stats.rowCount.exists(_ <= maxBandRows)
      if (p.isStreaming || !deterministic) Unusable
      else if (!small) TooLarge
      else {
        try {
          SparkSession.getActiveSession.map { s =>
            val taken = GraftPlans.executeTake(s, p, maxBandRows + 1)
            if (taken.length > maxBandRows) TooLarge
            else Materialized(taken.toSeq)
          }.getOrElse(Unusable)
        } catch { case NonFatal(_) => Unusable }
      }
  }

  /** Bin-domain Long view of a band bound / fact value expression —
    * the SAME mapping [[rewrite]] pins driver-side, expressed in
    * Catalyst so it can run distributed: timestamps through their
    * exact internal micros, dates through days, integrals through a
    * plain widening cast.
    */
  private def asBinLong(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case DateType      => Cast(UnixDate(e), LongType)
    case LongType      => e
    case _             => Cast(e, LongType)
  }

  /** Distributed fallback for a band side TOO LARGE to materialize:
    * instead of declining to a BroadcastNestedLoopJoin — the exact
    * scale-killer this rule exists to remove — explode the band rows
    * into their bins WITH A `Generate` NODE (each band row becomes
    * `span/w + 1` copies, computed executor-side), and shuffle-join
    * fact and band on the 8-byte bin key. Plan shape:
    * SortMergeJoin/ShuffledHashJoin on (bin, equi conjuncts) with the
    * original range predicate as residual — O(|fact| + Σ bins), never
    * O(|fact| × |bands|).
    *
    * The bin width comes from a bounded plan-time AGGREGATE over the
    * band side (min/max/avg/max span — one O(band) job at planning,
    * the price a broadcast join pays at execution, and the result is a
    * single row): `w = max(avg span, max span / 4096)` keeps the
    * explosion near 2× |bands| on even bands and caps the widest row's
    * fan-out under skew. Any w > 0 is CORRECT (the residual re-checks
    * the exact bounds; fact and band bin through the same
    * `IntegralDivide`) — the stats only tune the explosion factor, so
    * double-precision span arithmetic is fine even at int64 extremes.
    *
    * Integral domains (byte/short/int/long/timestamp/date) bin by
    * exact 64-bit division on both sides; float/double/decimal take
    * [[rewriteLargeFloating]], whose NaN/Inf screen rides the same
    * one-row stats job. Inverted / null bands emit zero bins through
    * the guarded `sequence` (`If(hi >= lo, sequence(...), empty)`)
    * exactly like the materialized path drops them.
    */
  private def rewriteLarge(
      j: Join,
      fact: LogicalPlan,
      band: LogicalPlan,
      cond: Expression,
      v: Expression,
      loE: Expression,
      hiE: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    v.dataType match {
      case ByteType | ShortType | IntegerType | LongType | TimestampType | DateType => ()
      case FloatType | DoubleType | _: DecimalType =>
        return rewriteLargeFloating(j, fact, band, cond, v, loE, hiE, hint)
      case _ => return None
    }
    val loL = asBinLong(loE)
    val hiL = asBinLong(hiE)
    // one-row plan-time stats job: min/max bound, span sum/max (double
    // domain — Long subtraction could overflow at epoch extremes, and
    // w only tunes performance, never correctness), row count
    val spanD = Subtract(Cast(hiL, DoubleType), Cast(loL, DoubleType))
    val statsRow = try {
      SparkSession.getActiveSession.map { s =>
        val agg = Aggregate(Nil, Seq(
          Alias(Sum(spanD).toAggregateExpression(), "span_sum")(),
          Alias(Max(spanD).toAggregateExpression(), "span_max")(),
          Alias(Count(Seq(Literal(1))).toAggregateExpression(), "n")()), band)
        GraftPlans.executeTake(s, agg, 1).headOption
      }.flatten
    } catch { case NonFatal(_) => None }
    val row = statsRow.getOrElse(return None)
    if (row.isNullAt(0) || row.isNullAt(1)) return None // no non-null bands
    val spanSum = row.getDouble(0)
    val spanMax = row.getDouble(1)
    val n = row.getLong(2)
    if (n <= 0 || spanSum.isNaN || spanMax.isNaN) return None
    val w = math.max(1.0,
      math.max(spanSum / n, spanMax / maxBinsPerLargeBand))
      .min(Long.MaxValue / 4.0).toLong
    val wLit = Literal(w, LongType)
    // band side: explode each row into its covered bins; inverted or
    // null-bounded bands yield an empty sequence (matches nothing in
    // both shapes)
    val seqExpr = If(
      GreaterThanOrEqual(hiL, loL),
      // timeZoneId must be pinned post-analysis (TimeZoneAwareExpression
      // is unresolved without one), even though Long sequences ignore it
      new Sequence(IntegralDivide(loL, wLit), IntegralDivide(hiL, wLit),
        Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
    val binAttr = AttributeReference("graft_band_bin", LongType, nullable = false)()
    val binnedBand = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binAttr), child = band)
    val factBin = Alias(IntegralDivide(asBinLong(v), wLit), "graft_band_bin_f")()
    val factWithBin = Project(fact.output :+ factBin, fact)
    val newJoin = Join(
      factWithBin, binnedBand, Inner,
      Some(And(EqualTo(factBin.toAttribute, binAttr), cond)), hint)
    Some(Project(j.output, newJoin))
  }

  /** Distributed fallback, FLOATING domains (float/double/decimal,
    * through the same monotone cast-to-double as the materialized
    * path). The blocker the integral fallback documents — a NaN/±Inf
    * band bound is invisible at plan time but matches fact rows in the
    * original join, so mis-binning it would change results — is solved
    * by screening INSIDE the one-row stats job the fallback already
    * runs: `x − x` is NaN exactly for NaN and ±Inf (and 0 for every
    * finite x, null for null), so one `sum(if(isnan(lo−lo) or
    * isnan(hi−hi), 1, 0))` counts the poisoned rows and any hit
    * declines the whole rewrite, same as the materialized path. The
    * job also feeds the bin-magnitude guard (`max(abs(bound)) / w`
    * must stay clear of `floor`'s Long saturation edge) that the
    * driver-side float path applies row-by-row.
    *
    * Both sides bin through the IDENTICAL Catalyst
    * `Floor(Divide(cast-to-double, w))` — the band side inside the
    * `sequence` bounds of the `Generate`, the fact side as the join
    * key — so there is no driver-vs-executor float mirror-math to keep
    * in agreement, and any w > 0 is correct (the original range
    * predicate stays as residual).
    */
  private def rewriteLargeFloating(
      j: Join,
      fact: LogicalPlan,
      band: LogicalPlan,
      cond: Expression,
      v: Expression,
      loE: Expression,
      hiE: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    def asDbl(e: Expression): Expression =
      if (e.dataType == DoubleType) e else Cast(e, DoubleType)
    val loD = asDbl(loE)
    val hiD = asDbl(hiE)
    val spanD = Subtract(hiD, loD)
    val nonFinite = Or(
      IsNaN(Subtract(loD, loD)), IsNaN(Subtract(hiD, hiD)))
    val statsRow = try {
      SparkSession.getActiveSession.map { s =>
        val agg = Aggregate(Nil, Seq(
          Alias(Sum(spanD).toAggregateExpression(), "span_sum")(),
          Alias(Max(spanD).toAggregateExpression(), "span_max")(),
          Alias(Max(Greatest(Seq(Abs(loD), Abs(hiD))))
            .toAggregateExpression(), "max_abs")(),
          Alias(Sum(If(nonFinite, Literal(1L), Literal(0L)))
            .toAggregateExpression(), "n_bad")(),
          Alias(Count(Seq(Literal(1))).toAggregateExpression(), "n")()), band)
        GraftPlans.executeTake(s, agg, 1).headOption
      }.flatten
    } catch { case NonFatal(_) => None }
    val row = statsRow.getOrElse(return None)
    // a NaN/Inf bound matches fact rows in the original join, so it
    // cannot be dropped — decline the whole rewrite (mirrors the
    // materialized float path)
    if (!row.isNullAt(3) && row.getLong(3) > 0) return None
    if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2)) return None
    val spanSum = row.getDouble(0)
    val spanMax = row.getDouble(1)
    val maxAbs = row.getDouble(2)
    val n = row.getLong(4)
    if (n <= 0 || !(spanSum > 0.0) || spanSum.isInfinite) return None
    val w = math.max(spanSum / n, spanMax / maxBinsPerLargeBand)
    if (!(w > 0.0) || maxAbs / w > maxBinMagnitude) return None
    val wLit = Literal(w, DoubleType)
    def bin(e: Expression): Expression = Floor(Divide(asDbl(e), wLit))
    val seqExpr = If(
      GreaterThanOrEqual(hiD, loD),
      new Sequence(bin(loE), bin(hiE),
        Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
    val binAttr = AttributeReference("graft_band_bin", LongType, nullable = false)()
    val binnedBand = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binAttr), child = band)
    val factBin = Alias(bin(v), "graft_band_bin_f")()
    val factWithBin = Project(fact.output :+ factBin, fact)
    val newJoin = Join(
      factWithBin, binnedBand, Inner,
      Some(And(EqualTo(factBin.toAttribute, binAttr), cond)), hint)
    Some(Project(j.output, newJoin))
  }

  /** Fan-out cap for the widest band row in the distributed fallback. */
  private val maxBinsPerLargeBand = 4096.0

  private def rewrite(
      j: Join,
      fact: LogicalPlan,
      band: LogicalPlan,
      rows: Seq[InternalRow],
      cond: Expression,
      v: Expression,
      loE: Expression,
      hiE: Expression,
      hint: JoinHint): Option[LogicalPlan] = {
    val loB = BindReferences.bindReference(loE, band.output)
    val hiB = BindReferences.bindReference(hiE, band.output)
    val fieldTypes = band.output.map(_.dataType)

    def buildJoin(binnedRows: Seq[InternalRow], factBinChild: Expression): Option[LogicalPlan] = {
      if (binnedRows.size > maxExplodedRows) return None
      val binAttr = AttributeReference("graft_band_bin", LongType, nullable = false)()
      val binnedBand = LocalRelation(band.output :+ binAttr, binnedRows)
      val factBin = Alias(factBinChild, "graft_band_bin_f")()
      val factWithBin = Project(fact.output :+ factBin, fact)
      val newJoin = Join(
        factWithBin, binnedBand, Inner,
        Some(And(EqualTo(factBin.toAttribute, binAttr), cond)), hint)
      Some(Project(j.output, newJoin))
    }

    v.dataType match {
      case ByteType | ShortType | IntegerType | LongType | TimestampType | DateType =>
        // timestamp evals to its internal Long micros, date to Int days
        // — the same exact integral domain the fact-side bin expression
        // below computes in
        def toLong(a: Any): Long = a match {
          case b: java.lang.Byte => b.toLong
          case s: java.lang.Short => s.toLong
          case i: java.lang.Integer => i.toLong
          case l: java.lang.Long => l
        }
        val pairs = rows.flatMap { r =>
          val lv = loB.eval(r)
          val hv = hiB.eval(r)
          if (lv == null || hv == null) None // null bound matches nothing in both shapes
          else {
            val l = toLong(lv)
            val h = toLong(hv)
            if (h >= l) Some((r, l, h)) else None
          }
        }
        if (pairs.isEmpty) return None
        // span in BigInt: h-l alone can overflow Long at extreme bounds
        val span = pairs.iterator.map { case (_, l, h) => BigInt(h) - BigInt(l) }.sum
        val w = (span / targetBins).max(1).min(BigInt(Long.MaxValue / 4)).toLong
        val binnedRows = pairs.flatMap { case (r, l, h) =>
          // Scala Long division truncates toward zero — the probed
          // identity of Catalyst's IntegralDivide (`-7 div 2 == -3`),
          // and trunc-div is monotone for w > 0, so bins l/w..h/w cover
          // every v in [l, h]
          (l / w to h / w).map(b => InternalRow.fromSeq(r.toSeq(fieldTypes) :+ b))
        }
        // the fact side must reach the SAME 64-bit domain the bounds
        // eval'd in: unix_micros/unix_date expose the raw internal
        // value (a plain Cast(timestamp, long) would truncate to
        // SECONDS and disagree with the driver-side micros)
        val factLong = v.dataType match {
          case TimestampType => UnixMicros(v)
          case DateType      => Cast(UnixDate(v), LongType)
          case LongType      => v
          case _             => Cast(v, LongType)
        }
        buildJoin(binnedRows, IntegralDivide(factLong, Literal(w, LongType)))

      case FloatType | DoubleType | _: DecimalType =>
        def toDbl(a: Any): Double = a match {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d
          case dec: Decimal => dec.toDouble // same conversion Cast(dec, double) applies
        }
        var nonFinite = false
        val pairs = rows.flatMap { r =>
          val lv = loB.eval(r)
          val hv = hiB.eval(r)
          if (lv == null || hv == null) None // null bound matches nothing in both shapes
          else {
            val l = toDbl(lv)
            val h = toDbl(hv)
            if (l.isNaN || l.isInfinite || h.isNaN || h.isInfinite) {
              nonFinite = true
              None
            } else if (h >= l) Some((r, l, h)) else None
          }
        }
        // a NaN/Inf bound matches fact rows in the original join
        // (v < +Inf is true for finite v; NaN sorts above all doubles),
        // so it cannot be dropped — decline the whole rewrite
        if (nonFinite || pairs.isEmpty) return None
        val totalSpan = pairs.iterator.map { case (_, l, h) => h - l }.sum
        if (!(totalSpan > 0.0) || totalSpan.isInfinite) return None
        val w = totalSpan / targetBins
        if (!(w > 0.0)) return None
        val maxAbs = pairs.iterator
          .flatMap { case (_, l, h) => Iterator(math.abs(l), math.abs(h)) }.max
        if (maxAbs / w > maxBinMagnitude) return None
        // driver-side bin math mirrors Catalyst Floor(Divide) on doubles
        // exactly — both are IEEE division + Math.floor + (long) cast
        val binnedRows = pairs.flatMap { case (r, l, h) =>
          val b0 = math.floor(l / w).toLong
          val b1 = math.floor(h / w).toLong
          (b0 to b1).map(b => InternalRow.fromSeq(r.toSeq(fieldTypes) :+ b))
        }
        val factDbl =
          if (v.dataType == DoubleType) v else Cast(v, DoubleType)
        buildJoin(binnedRows, Floor(Divide(factDbl, Literal(w, DoubleType))))

      case _ => None
    }
  }
}
