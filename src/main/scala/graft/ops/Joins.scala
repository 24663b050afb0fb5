package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operator inventory — SURVEY.md §2.3 (J1–J8).
  *
  * The reference performs no relational joins (its only join-like op is
  * the positional prediction/label zip at /root/reference/main.py:376,415,
  * which Spark dissolves into same-row columns); this whole family is
  * [N] driver-contract surface over the testdata star schema.
  *
  * 100 TB posture per join:
  *  - fact⋈fact (lineitem⋈orders) shuffles on the join key → SortMergeJoin;
  *    AQE converts to shuffled-hash/broadcast when a side turns out small.
  *  - fact⋈dim (nation/region, bands) is explicitly `broadcast()` — a
  *    25-row dim must NEVER shuffle 100 TB of fact rows.
  *  - The non-equi band join broadcasts the literal band table so the plan
  *    is BroadcastNestedLoopJoin over 4 rows, not a cross shuffle.
  *  - The as-of join avoids a range self-join entirely: union + one
  *    window pass (single shuffle on user_id), the standard scalable
  *    as-of shape.
  */
object Joins {

  private def ts(s: String) = lit(s).cast("timestamp")

  /** J1+J2+J3 — multi-way star join: revenue by nation for one region.
    * lineitem⋈orders is the large×large SMJ; customer joins on the
    * shuffled side; nation and region are explicit broadcasts.
    */
  def q14JoinStar(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val price = $"l_extendedprice".cast("decimal(12,2)")
    val disc  = $"l_discount".cast("decimal(3,2)")
    val asia  = Sources.region(spark, dir).filter($"r_name" === "ASIA")
    Sources.lineitem(spark, dir)
      .filter($"l_shipdate" >= ts("1995-01-01"))
      .join(Sources.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .join(Sources.customer(spark, dir), $"o_custkey" === $"c_custkey")
      .join(broadcast(Sources.nation(spark, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(asia), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(
        round(sum(price * (lit(1) - disc)), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  /** J4 — left outer join preserving customers with zero orders; null
    * aggregation semantics (count of null key = 0, sum coalesced).
    */
  def q15Outer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.customer(spark, dir)
      .join(Sources.orders(spark, dir), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(
        count($"o_orderkey").as("n_orders"),
        coalesce(sum($"o_totalprice".cast("decimal(12,2)")), lit(0))
          .cast("double").as("total_spent"))
      .orderBy($"c_custkey")
  }

  /** J5 — left semi (customers WITH orders) and left anti (WITHOUT),
    * tagged into one relation. Semi/anti never duplicate or widen rows —
    * at scale they beat an inner-join+distinct by the whole dedup shuffle.
    */
  def q16SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust   = Sources.customer(spark, dir)
    val orders = Sources.orders(spark, dir)
    val has  = cust.join(orders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey").withColumn("tag", lit("has_orders"))
    val none = cust.join(orders, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey").withColumn("tag", lit("no_orders"))
    has.unionByName(none).orderBy($"tag", $"c_custkey")
  }

  /** J6+J8 — non-equi range (band) join against a broadcast literal dim:
    * each order lands in a price band via `lo <= p < hi`. Plans as
    * BroadcastNestedLoopJoin over 4 rows — the only sane physical shape
    * for a non-equi predicate at scale.
    */
  def q17BandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("1_low", 0.0, 50000.0),
      ("2_mid", 50000.0, 150000.0),
      ("3_high", 150000.0, 300000.0),
      ("4_top", 300000.0, 1e9)).toDF("band", "lo", "hi")
    Sources.orders(spark, dir)
      .join(broadcast(bands), $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"band")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast("decimal(12,2)")), 2)
          .cast("double").as("band_total"))
      .orderBy($"band")
  }

  /** J6 at scale (ORACLED) — the same band-join semantics as [[q17BandJoin]]
    * but executed as an EQUI-join via binning, the shape that survives
    * when the band table is too large to nested-loop: decompose the
    * value domain into fixed-width bins, explode each band into the
    * bins it overlaps (bounded by the observed max, fetched as a 1-row
    * broadcast aggregate), equi-join fact rows on `bin =
    * floor(value/w)`, and re-check the exact `lo <= v < hi` predicate
    * as a residual filter. Each fact row matches at most one band here
    * (bands are disjoint), so no dedup pass is needed; with overlapping
    * bands the residual keeps semantics and a distinct on (row, band)
    * would follow.
    *
    * 100 TB posture: the plan is a hash join on an 8-byte bin key —
    * shuffle-free when the exploded band side broadcasts (asserted in
    * JoinsSpec), a keyed shuffle otherwise — instead of q17's
    * BroadcastNestedLoopJoin, which is only sane while the band table
    * stays tiny. Bin width trades band-side blowup (≤ bands ×
    * domain/w bins) against residual selectivity; result is identical
    * for any w.
    */
  def q67BinnedBandJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = 20000.0
    val bands = Seq(
      ("b1_micro", 0.0, 40000.0),
      ("b2_small", 40000.0, 95000.0),
      ("b3_mid", 95000.0, 180000.0),
      ("b4_large", 180000.0, 320000.0),
      ("b5_jumbo", 320000.0, 2000000.0)).toDF("band", "lo", "hi")
    val orders = Sources.orders(spark, dir)
    // Observed max bounds the bin expansion of the open-topped band —
    // without it the b5 band would explode 2e6/w bins for no matches.
    val maxp = orders.agg(max($"o_totalprice").as("maxp"))
    val binnedBands = bands.crossJoin(broadcast(maxp))
      .select($"band", $"lo", $"hi",
        explode(sequence(
          floor($"lo" / w).cast("long"),
          floor(least($"hi", $"maxp") / w).cast("long"))).as("bin"))
    orders
      .withColumn("bin", floor($"o_totalprice" / w).cast("long"))
      .join(broadcast(binnedBands), Seq("bin"))
      .filter($"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"band")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast("decimal(12,2)")), 2)
          .cast("double").as("band_total"))
      .orderBy($"band")
  }

  /** J6 via the OPTIMIZER (ORACLED) — the same band-join semantics as
    * [[q17BandJoin]]/[[q67BinnedBandJoin]], but written as the PLAIN
    * range join and rewritten into the binned equi-join automatically by
    * [[graft.plans.BandJoinToBinned]] (installed through
    * [[graft.plans.GraftExtensions]]). The query author states `lo <= v
    * < hi`; the rule picks the bin width from the literal band bounds,
    * explodes the band side, and plans a BroadcastHashJoin on an 8-byte
    * bin key (plan-asserted in ExtensionsSpec) — q67's hand-written
    * shape, derived mechanically.
    *
    * 100 TB posture: identical to q67's (hash join on the bin key,
    * residual range filter), with the strategy moved out of user code —
    * every band join in the workload gets the scalable plan, not just
    * the ones whose author knew the trick.
    */
  def q71AutoBandJoin(spark: SparkSession, dir: String): DataFrame = {
    // The install mutates session state (function registry + extra
    // optimizations) — run against an isolated child session so sibling
    // queries' plans never depend on whether q71 ran first. Harness
    // sessions (Verify/Bench) additionally carry the extensions from
    // creation via spark.sql.extensions.
    val s = graftSession(spark)
    import s.implicits._
    val tiers = Seq(
      ("t1_budget", 0.0, 20000.0),
      ("t2_value", 20000.0, 45000.0),
      ("t3_core", 45000.0, 70000.0),
      ("t4_premium", 70000.0, 100000.0),
      ("t5_luxury", 100000.0, 200000.0)).toDF("tier", "lo", "hi")
    Sources.lineitem(s, dir)
      .join(tiers, $"l_extendedprice" >= $"lo" && $"l_extendedprice" < $"hi")
      .groupBy($"tier")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"l_extendedprice".cast("decimal(12,2)")), 2)
          .cast("double").as("tier_total"))
      .orderBy($"tier")
  }

  /** An isolated child session carrying the graft extensions —
    * `newSession()` shares the SparkContext and builder-time confs but
    * gets its own function registry and extraOptimizations, so
    * installing the rule here leaves the caller's plans untouched.
    */
  private def graftSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    graft.plans.GraftExtensions.install(s)
    s
  }

  /** J6 in the INTEGRAL domain (ORACLED) — the same auto-rewritten band
    * join as [[q71AutoBandJoin]], but the banded value and the band
    * bounds are plain ints (quantity tiers), the shape real band tables
    * take for prices-in-cents or epoch-micros. [[graft.plans.BandJoinToBinned]]
    * bins integral comparisons with `IntegralDivide` in the exact
    * 64-bit domain — a bigint epoch-µs band never rounds through a
    * double — and plans the same BroadcastHashJoin on the 8-byte bin
    * key (type matrix asserted in ExtensionsSpec).
    */
  def q72IntBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = graftSession(spark)
    import s.implicits._
    val tiers = Seq(
      ("s1_unit", 1, 5),
      ("s2_case", 6, 15),
      ("s3_bulk", 16, 30),
      ("s4_pallet", 31, 50)).toDF("tier", "lo", "hi")
    Sources.lineitem(s, dir)
      .withColumn("qty", $"l_quantity".cast("int"))
      .join(tiers, $"qty" >= $"lo" && $"qty" <= $"hi")
      .groupBy($"tier")
      .agg(
        count(lit(1)).as("n"),
        sum($"qty").cast("long").as("tier_qty"))
      .orderBy($"tier")
  }

  /** J6 with a NON-LITERAL band side (ORACLED) — the band dim is READ,
    * not written inline: price bands derived from the `nation` parquet
    * table (one 12k-wide band per nation key). This is the case the
    * plan-time rewrite exists for — a band table big enough to hurt in
    * a nested loop ships from storage, so its bounds are not literals;
    * [[graft.plans.BandJoinToBinned]] materializes the ≤10k-row band
    * side with a bounded driver read at planning (the same
    * materialization a broadcast join does at execution), then bins as
    * usual. Plan-asserted in ExtensionsSpec; oracle-checked against the
    * identical DuckDB join.
    */
  def q73ParquetBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = graftSession(spark)
    import s.implicits._
    val bands = Sources.nation(s, dir).select(
      $"n_name".as("band"),
      ($"n_nationkey" * 12000.0).as("lo"),
      (($"n_nationkey" + 1) * 12000.0).as("hi"))
    Sources.orders(s, dir)
      .join(bands, $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"band")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast("decimal(12,2)")), 2)
          .cast("double").as("band_total"))
      .orderBy($"band")
  }

  /** J6 in the TIME domain (ORACLED) — a calendar band join: each order
    * matched to the one-year validity window [Jan 1 (1996+k), Jan 1
    * (1997+k)) carried by region k. Time ranges are the most common
    * band shape in practice (calendar rollups, SCD-2 validity windows,
    * session-to-window attribution); [[graft.plans.BandJoinToBinned]]
    * bins `TimestampType` in its exact internal 64-bit micros domain
    * (`unix_micros` on the fact side, the bounds' own `eval` on the
    * band side), so the rewrite plans the same BroadcastHashJoin on an
    * 8-byte bin key with zero precision loss — a nanosecond-resolution
    * validity edge can never round across a bin (plan-asserted in
    * ExtensionsSpec; type matrix covers timestamp and date).
    *
    * 100 TB posture: identical to q71/q73 — O(rows) hash join instead
    * of O(rows × windows) nested loop, and an SCD-2 dim with thousands
    * of validity windows ships from parquet exactly like q73's bands.
    */
  def q77TimeBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = graftSession(spark)
    import s.implicits._
    val windows = Sources.region(s, dir).select(
      $"r_name".as("band"),
      expr("make_timestamp(1996 + r_regionkey, 1, 1, 0, 0, 0)").as("lo"),
      expr("make_timestamp(1997 + r_regionkey, 1, 1, 0, 0, 0)").as("hi"))
    Sources.orders(s, dir)
      .join(windows, $"o_orderdate" >= $"lo" && $"o_orderdate" < $"hi")
      .groupBy($"band")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"o_totalprice".cast("decimal(12,2)")), 2)
          .cast("double").as("band_total"))
      .orderBy($"band")
  }

  /** Fuzzy (edit-distance) join (ORACLED, q84) — entity normalization:
    * match a dirty feed of misspelled names against a reference dim at
    * `levenshtein ≤ 2`, e.g. mapping scraped country mentions onto the
    * canonical table. The length-band conjunct
    * `|len(a) − len(b)| ≤ d` is a TRUE LOWER BOUND on edit distance,
    * so it prunes candidate pairs before the O(len·len) DP measure
    * without ever dropping a match (asserted in `JoinsSpec`).
    *
    * 100 TB posture: the dirty feed here is dim-sized and broadcast,
    * so the plan is a broadcast loop with the cheap length check
    * first. When BOTH sides are corpus-sized, use
    * [[fuzzyJoinBlocked]] — exact segment blocking with a keyed
    * shuffle join, no broadcast of either side (oracled as q85).
    */
  def q84FuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // misspellings of the synthetic NATION_k names (deletion,
    // insertion, substitution, transposed tail) + one unmatchable decoy;
    // some hit several nations within distance 2 (NATION_1 vs
    // NATION_10 are themselves distance 1) — all matches are returned
    val dirty = Seq("NATON_3", "NATIION_7", "XATION_21", "NATION_2Q",
      "NTION_19", "XQZV").toDF("dirty")
    Sources.nation(spark, dir).select($"n_name")
      .join(broadcast(dirty),
        abs(length($"dirty") - length($"n_name")) <= 2 &&
          levenshtein($"dirty", $"n_name") <= 2)
      .select($"dirty", $"n_name",
        levenshtein($"dirty", $"n_name").cast("long").as("dist"))
      .orderBy($"dirty", $"n_name")
  }

  /** Large×large fuzzy join — entity resolution between two
    * corpus-sized feeds at `levenshtein ≤ maxDist`, with NEITHER side
    * broadcast: candidate generation is PassJoin-style SEGMENT
    * blocking (Li/Deng/Feng, ICDE 2011 — public literature), an exact
    * pigeonhole, so the result EQUALS the nested-loop fuzzy join
    * (asserted against brute force in JoinsSpec, oracled in q85):
    *
    *  - the `right` side splits each string into `maxDist + 1` even
    *    segments; if `ed(a, b) ≤ maxDist` then at least one whole
    *    segment of `b` survives unedited, so it occurs in `a` EXACTLY,
    *    shifted by at most `maxDist` positions;
    *  - the `left` (probe) side therefore emits, for every candidate
    *    right-length `|len(a)| ± maxDist` and every segment index, the
    *    substrings of `a` at the segment's position ± maxDist, PRUNED
    *    by PassJoin's multi-match-aware position bound: aligning the
    *    surviving segment at shift `s` forces ≥ |s| edits into the
    *    prefix (its aligned lengths differ by |s|) and ≥ |s + Δ| into
    *    the suffix (Δ = target − probe length), so any (Δ, s) with
    *    |s| + |s + Δ| > d cannot co-exist with `ed ≤ d` and is dropped
    *    AT PLAN TIME — 39 keys instead of the naive (d+1)·(2d+1)² = 75
    *    at d=2, deduped with `array_distinct` before the explode;
    *  - candidates equi-join on the (segment idx, segment text, right
    *    length) key — a plain keyed shuffle, SortMergeJoin at scale —
    *    then the `levenshtein` DP runs as a residual and duplicate
    *    candidate pairs collapse on (leftId, rightId).
    *
    * 100 TB posture: shuffle volume is ~(2d+1)² × |probe| + (d+1) ×
    * |index| short segment keys, so the SMALLER feed should probe —
    * and the join ORIENTS ITSELF: a free plan-time size estimate
    * (Catalyst stats over each side's optimized plan — exact for
    * in-memory relations, file-size-derived for parquet scans, the
    * same statistic the broadcast planner trusts) decides which side
    * probes, so argument order never costs the ~13× key fan-out
    * (side-order invariance of both result and candidate counts is
    * property-tested in JoinsSpec). No driver materialization, no
    * broadcast, no O(|L|·|R|) predicate: this is the blocking shape
    * [[q84FuzzyJoin]]'s scaladoc promises for two 100 M-row feeds.
    * Skewed blocks (e.g. a hot 3-char prefix) are bounded by the
    * residual's cheap length prefilter riding in the key (targetLen),
    * and empty-segment keys only arise for strings shorter than d+1
    * characters.
    */
  def fuzzyJoinBlocked(left: DataFrame, leftId: String, leftCol: String,
      right: DataFrame, rightId: String, rightCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4,
      s"maxDist must be in [1, 4], got $maxDist")
    require(Seq(leftId, leftCol, rightId, rightCol).distinct.size == 4,
      "left and right id/value column names must be distinct")
    val cands =
      if (fuzzySwapSides(left, right))
        fuzzyCandidates(right, rightCol, left, leftCol, maxDist)
      else
        fuzzyCandidates(left, leftCol, right, rightCol, maxDist)
    cands
      .filter(levenshtein(col(leftCol), col(rightCol)) <= maxDist)
      // several blocks can yield the same true pair — collapse AFTER
      // the cheap residual so only matches pay the dedup shuffle
      .dropDuplicates(leftId, rightId)
      .select(col(leftId), col(leftCol), col(rightId), col(rightCol),
        levenshtein(col(leftCol), col(rightCol)).cast("long").as("dist"))
  }

  /** Orientation decision for [[fuzzyJoinBlocked]]: probe with the
    * smaller side. Catalyst plan stats are free at this point (no job
    * runs) and only TUNE the key fan-out — either orientation is
    * correct (the pigeonhole is exhaustive both ways), so an off
    * estimate can cost time, never rows.
    */
  private[graft] def fuzzySwapSides(left: DataFrame, right: DataFrame): Boolean =
    right.queryExecution.optimizedPlan.stats.sizeInBytes <
      left.queryExecution.optimizedPlan.stats.sizeInBytes

  /** PassJoin candidate generation, explicitly oriented: `probe` emits
    * the shifted substrings, `index` its exact segments. Returns the
    * blocked equi-join BEFORE the levenshtein residual — kept separate
    * so the orientation property test can count candidates per
    * orientation. Output carries both sides' id and value columns, so
    * the caller's by-name select is orientation-blind.
    */
  private[graft] def fuzzyCandidates(probe: DataFrame, probeCol: String,
      index: DataFrame, indexCol: String, maxDist: Int): DataFrame = {
    val (left, leftCol, right, rightCol) = (probe, probeCol, index, indexCol)
    val d = maxDist
    val parts = d + 1
    // even segmentation of a string of length len: segment i has length
    // q + (i < r) and 0-based start i*q + min(i, r)
    def segLen(len: Column, i: Int): Column =
      floor(len / parts).cast("int") +
        when(lit(i) < len % parts, 1).otherwise(0)
    def segStart(len: Column, i: Int): Column =
      floor(len / parts).cast("int") * i + least(lit(i), len % parts)

    // indexed side: its own d+1 exact segments, keyed by (i, seg, len)
    val rLen = length(col(rightCol)).cast("int")
    val rightKeys = (0 to d).map { i =>
      struct(
        lit(i).as("seg_i"),
        col(rightCol).substr(segStart(rLen, i) + 1, segLen(rLen, i)).as("seg"),
        rLen.as("target_len"))
    }
    // probe side: every substring a surviving segment could be, for
    // every plausible right length and ±d position shift
    val lLen = length(col(leftCol)).cast("int")
    val probeKeys = for {
      i <- 0 to d
      delta <- -d to d
      shift <- -d to d
      // multi-match-aware bound: |shift| edits land in the prefix and
      // |shift + delta| in the suffix (delta = tLen - lLen), so combos
      // exceeding the budget are unsatisfiable and never generated
      if math.abs(shift) + math.abs(shift + delta) <= d
    } yield {
      val tLen = lLen + delta
      val sLen = segLen(tLen, i)
      val p = segStart(tLen, i) + shift
      val valid = tLen >= 0 && p >= 0 && (p + sLen) <= lLen
      when(valid,
        struct(lit(i).as("seg_i"),
          col(leftCol).substr(p + 1, sLen).as("seg"),
          tLen.as("target_len")))
    }
    val lk = left.select(left.columns.toIndexedSeq.map(col) :+
      explode(array_distinct(array_compact(array(probeKeys: _*)))).as("__blk"): _*)
    val rk = right.select(right.columns.toIndexedSeq.map(col) :+
      explode(array_distinct(array(rightKeys: _*))).as("__blk"): _*)
    lk.join(rk, Seq("__blk")).drop("__blk")
  }

  /** [[fuzzyJoinBlocked]] ORACLED (q85) — a corpus-sized dirty feed
    * matched against a corpus-sized clean one, neither broadcastable:
    * every document's 16-char prefix is deterministically corrupted
    * (delete / substitute / delete+substitute / double-insert, by
    * doc_id mod 4) and re-matched at edit distance ≤ 2. DuckDB
    * reproduces the corruption and the full quadratic fuzzy join;
    * the blocked join must return the IDENTICAL pair set, rolled up
    * per distance with a self-match count.
    */
  def q85FuzzyCorpusJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clean = Sources.documents(spark, dir)
      .select($"doc_id".as("cid"), substring($"text", 1, 16).as("cname"))
    val dirty = clean.select($"cid".as("did"),
      when($"cid" % 4 === 0,
        concat(substring($"cname", 1, 3), substring($"cname", 5, 16)))
      .when($"cid" % 4 === 1,
        concat(substring($"cname", 1, 6), lit("#"), substring($"cname", 8, 16)))
      .when($"cid" % 4 === 2,
        concat(substring($"cname", 1, 1), substring($"cname", 3, 7),
          lit("#"), substring($"cname", 11, 16)))
      .otherwise(
        concat(substring($"cname", 1, 4), lit("zz"), substring($"cname", 5, 16)))
      .as("dname"))
    fuzzyJoinBlocked(dirty, "did", "dname", clean, "cid", "cname", maxDist = 2)
      .groupBy($"dist")
      .agg(
        count(lit(1)).as("n_pairs"),
        count(when($"did" === $"cid", 1)).as("n_self"))
      .orderBy($"dist")
  }

  /** J6 with a band side TOO LARGE to materialize (ORACLED, q87) —
    * every order carries a 2-day validity window starting at its order
    * date, and each lineitem matches the orders whose window covers
    * its ship date: 15k windows at sf0.01 (150k at sf0.1), above
    * [[graft.plans.BandJoinToBinned]]'s plan-time materialization
    * budget. The rule's DISTRIBUTED fallback fires: a one-row
    * plan-time aggregate picks the bin width in the exact unix_date
    * domain, a `Generate` explodes each window into its day-bins
    * executor-side, and the join plans as a keyed shuffle join on the
    * bin — never the O(|lineitem| × |orders|) nested loop
    * (plan-asserted in ExtensionsSpec; DuckDB reproduces the plain
    * range join with its own IEJoin).
    *
    * This is the SCD-2-validity-window shape at production size: a
    * dim with per-row [valid_from, valid_to) ranges too big to
    * broadcast, probed by a fact's event date.
    *
    * The probe side is a one-month shipdate slice: with ~60 windows
    * opening per day, an UNRESTRICTED probe matches ~2·60 windows per
    * fact row — a join OUTPUT ~125× the fact table that costs the
    * same in any engine (DuckDB's IEJoin included) and only measures
    * output materialization. The slice keeps the band side at full
    * oversized width (the fallback still fires — that is what q87
    * proves) while the benched cost stays the fallback's, not the
    * blowup's.
    */
  def q87LargeBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = graftSession(spark)
    import s.implicits._
    val windows = Sources.orders(s, dir).select(
      $"o_orderpriority",
      $"o_orderdate".cast("date").as("lo"),
      date_add($"o_orderdate".cast("date"), 2).as("hi"))
    Sources.lineitem(s, dir)
      .withColumn("ship_d", $"l_shipdate".cast("date"))
      .filter($"ship_d" >= lit("1995-03-01").cast("date") &&
        $"ship_d" < lit("1995-04-01").cast("date"))
      .join(windows, $"ship_d" >= $"lo" && $"ship_d" < $"hi")
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum($"l_quantity".cast("int")).cast("long").as("qty"))
      .orderBy($"o_orderpriority")
  }

  /** J6 PER-GROUP bands (ORACLED) — the most common production band
    * shape: a different tier schedule per group (here, per linestatus;
    * in practice price tiers per region, rate schedules per tenant).
    * The join condition is `status = status AND lo <= qty AND qty <=
    * hi`. Spark alone hash-joins this on the status key, but a
    * low-cardinality group key means each fact row still compares
    * against ALL of its group's bands inside the bucket — O(rows ×
    * bands/groups). [[graft.plans.BandJoinToBinned]] carries the equi
    * conjunct into the rewrite, so the planner gets a COMPOSITE
    * (status, bin) hash key and each fact row meets ~1 band
    * (plan-asserted in ExtensionsSpec; fixpoint guarded by the
    * synthetic bin attribute name).
    */
  def q80GroupedBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = graftSession(spark)
    import s.implicits._
    val tiers = Seq(
      ("F", "f_small", 1, 24), ("F", "f_large", 25, 50),
      ("O", "o_small", 1, 9), ("O", "o_mid", 10, 34), ("O", "o_large", 35, 50),
      ("P", "p_all", 1, 50)).toDF("status", "tier", "lo", "hi")
    Sources.lineitem(s, dir)
      .withColumn("qty", $"l_quantity".cast("int"))
      .join(tiers,
        $"l_linestatus" === $"status" && $"qty" >= $"lo" && $"qty" <= $"hi")
      .groupBy($"status", $"tier")
      .agg(
        count(lit(1)).as("n"),
        sum($"qty").cast("long").as("tier_qty"))
      .orderBy($"status", $"tier")
  }

  /** J7 — as-of join: each click event enriched with the value of the
    * same user's most recent view at-or-before the click. Implemented as
    * the scalable union+window shape (one shuffle on user_id; no range
    * self-join): tag views 0 / clicks 1, order by (ts, tag) so a view in
    * the same instant is visible (inclusive as-of), then
    * last(value, ignoreNulls) over the running frame.
    *
    * Tie rule: two views with identical (user_id, ts) — possible after
    * ns→µs truncation — would make "most recent view" ambiguous (and
    * DuckDB's ASOF would pick its own arbitrary row), so views are
    * pre-deduped to the max-event_id row per (user_id, ts), mirrored in
    * the oracle SQL. Determinism is part of the operator's contract.
    */
  def q18AsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    asOfLastView(Sources.events(spark, dir)).orderBy($"event_id")
  }

  /** [[q18AsOf]] core over any (event_id, ts, user_id, event_type,
    * value) frame — the unit under test for the literal edge cases
    * (inclusive ties, no-prior-view nulls, same-instant view dedup).
    */
  def asOfLastView(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val tieW = Window.partitionBy($"user_id", $"ts").orderBy($"event_id".desc)
    val views = ev.filter($"event_type" === "view")
      .withColumn("rn", row_number().over(tieW)).filter($"rn" === 1)
      .select(
        $"user_id", $"ts", $"value".as("v_value"),
        lit(0).as("tag"), lit(null).cast("long").as("event_id"))
    val clicks = ev.filter($"event_type" === "click").select(
      $"user_id", $"ts", lit(null).cast("double").as("v_value"),
      lit(1).as("tag"), $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(clicks)
      .withColumn("last_view_value", last($"v_value", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"user_id",
        round($"last_view_value", 6).as("last_view_value"))
  }

  /** Bloom-prefiltered semi-join: build a Bloom filter over the dim
    * side's keys (one `df.stat.bloomFilter` aggregate — bounded bits on
    * the driver), broadcast it, and drop non-candidate fact rows AT THE
    * SCAN, before any shuffle; the exact left-semi join then removes the
    * false positives. No false negatives is the Bloom guarantee, so the
    * result is EXACTLY the plain semi-join — which is what makes the
    * pattern oracle-able.
    *
    * 100 TB posture: this is the standard shuffle-pruning trick for a
    * selective fact⋈dim semi-join — a 1% fpp filter over 10⁸ keys is
    * ~120 MB broadcast, and every pruned fact row is a row that never
    * enters the exchange. (Spark's own runtime row-level bloom rewrite
    * exists behind AQE flags; doing it explicitly keeps the plan
    * deterministic and the fpp/size budget chosen, not inferred.)
    */
  def bloomSemiJoin(fact: DataFrame, dimKeys: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dimKeys.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContain(k))
    fact.filter(col(factKey).isNotNull && mightContain(col(factKey)))
      .join(dimKeys.select(col(dimKey)).distinct(),
        col(factKey) === col(dimKey), "left_semi")
  }

  /** J5 at scale (ORACLED) — revenue of lineitems belonging to URGENT
    * orders via [[bloomSemiJoin]]: the bloom prunes ~4/5 of lineitem
    * before the shuffle, the exact semi-join scrubs the fpp tail, and
    * the result equals the plain `l_orderkey IN (urgent orders)` SQL.
    */
  def q53BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urgent = Sources.orders(spark, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val price = $"l_extendedprice".cast("decimal(12,2)")
    val disc  = $"l_discount".cast("decimal(3,2)")
    bloomSemiJoin(Sources.lineitem(spark, dir), urgent,
        "l_orderkey", "o_orderkey", expectedItems = 400000L)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(price * (lit(1) - disc)), 2).cast("double").as("revenue"))
      .orderBy($"l_returnflag")
  }
}
