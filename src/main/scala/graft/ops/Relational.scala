package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory — SURVEY.md §2.2 (P*), §2.4 (A*),
  * §2.6 (O*), §2.7 (set ops), §2.9 (scalar functions).
  *
  * Every query is a pure declarative plan: filters/projections reach
  * the parquet scan via Catalyst pushdown, aggregates run
  * partial+final (map-side combine), and nothing collects to the
  * driver. Outputs carry a stable total ORDER BY and rounded floats
  * so the DuckDB-oracle hash compare is deterministic (SURVEY §4.3).
  *
  * Reference analogues cited per query; the reference
  * (/root/reference/main.py) has no SQL layer, so [N] rows follow the
  * driver contract instead.
  */
object Relational {

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** A12/O1 — pricing summary (the canonical first query, SURVEY §7.2
    * slice 0). Analogue of the reference's first real computation, the
    * per-class count at main.py:95-101, but over `lineitem`.
    * Plan shape: Scan(pushed filter) -> partial HashAggregate ->
    * shuffle(2 keys) -> final HashAggregate -> Sort. One shuffle.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Money measures are summed in DECIMAL (exact, order-independent)
    // and only cast to double at the end — IEEE double partial-agg order
    // varies with partitioning, which would make the oracle hash flaky.
    val price = $"l_extendedprice".cast("decimal(12,2)")
    val disc  = $"l_discount".cast("decimal(3,2)")
    val tax   = $"l_tax".cast("decimal(3,2)")
    // Averages derive from the exact decimal sums (sum(dec)→double,
    // one scalar divide) instead of avg(double): IEEE partial-agg order
    // varies with partitioning, and the oracle hash must not.
    val qty = $"l_quantity".cast("decimal(12,2)")
    Sources.lineitem(spark, dir)
      .filter($"l_shipdate" <= ts("2000-12-01"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        round(sum(price * (lit(1) - disc)), 2).cast("double").as("sum_disc_price"),
        round(sum(price * (lit(1) - disc) * (lit(1) + tax)), 2).cast("double").as("sum_charge"),
        round(sum(qty).cast("double") / count(lit(1)), 6).as("avg_qty"),
        round(sum(price).cast("double") / count(lit(1)), 6).as("avg_price"),
        round(sum(disc).cast("double") / count(lit(1)), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** P1/P7 — projection + conjunctive predicates (range, IN, <).
    * All four predicates push to the parquet scan (PushedFilters).
    */
  def q2ProjFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.lineitem(spark, dir)
      .filter(
        $"l_shipdate".between(ts("1996-01-01"), ts("1998-12-31")) &&
        $"l_discount".between(0.02, 0.08) &&
        $"l_quantity" < 30 &&
        $"l_returnflag".isin("A", "R"))
      .select(
        $"l_orderkey", $"l_linenumber", $"l_quantity",
        // Exact-decimal product, rounded in decimal then cast — IEEE
        // round-half-up ties differ between engines (same fix as q1).
        round($"l_extendedprice".cast("decimal(12,2)") *
          (lit(1) - $"l_discount".cast("decimal(3,2)")), 2)
          .cast("double").as("disc_price"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** A10 — exact distinct counts (single-row result; the approx HLL
    * variant is q36, not oracled — HLL estimates differ across engines
    * by design).
    *
    * Plan shape: THREE single-distinct aggregates cross-joined as 1-row
    * broadcasts, NOT one agg with three countDistincts — multiple
    * distinct groups make RewriteDistinctAggregates plan an Expand that
    * triples every input row before the shuffle (the round-2 bench's
    * dominant cost; fatal at 100 TB). Each single-distinct agg is a
    * partial-dedup → shuffle-of-distinct-keys → count, so the shuffle
    * carries keys, not 3× rows.
    */
  def q3Distinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Sources.lineitem(spark, dir)
    li.agg(countDistinct($"l_orderkey").as("n_orders"))
      .crossJoin(broadcast(li.agg(countDistinct($"l_partkey").as("n_parts"))))
      .crossJoin(broadcast(
        li.agg(countDistinct($"l_suppkey", $"l_partkey").as("n_supp_part_pairs"))))
  }

  /** A10 scale variant of q3 — approx_count_distinct (HLL++, rsd 1%).
    * Where exact q3 pays a 3× Expand + wide shuffle
    * (RewriteDistinctAggregates), this is one pass with fixed-size
    * sketches — the 100 TB answer. Rows-only: HLL estimates are
    * engine-specific by design.
    */
  def q36ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.lineitem(spark, dir).agg(
      approx_count_distinct($"l_orderkey", 0.01).as("n_orders_approx"),
      approx_count_distinct($"l_partkey", 0.01).as("n_parts_approx"),
      approx_count_distinct($"l_suppkey", 0.01).as("n_supps_approx"))
  }

  /** A11 — ROLLUP with grouping() disambiguation of subtotal rows. */
  def q4Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.orders(spark, dir)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(
        count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double").as("total_price"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_prio"))
      .orderBy(
        $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** A11 — CUBE over two low-cardinality dims. */
  def q5Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.lineitem(spark, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** O3 — top-k by measure. Plans as TakeOrderedAndProject (per-partition
    * heap + single merge — no global sort even at 100 TB). Tie-broken on
    * o_orderkey for determinism.
    */
  def q6TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.orders(spark, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("o_totalprice"))
      .orderBy($"o_orderkey") // presentation order on the key: rounding-proof
  }

  /** §2.7 — union / intersect / except with distinct SQL semantics,
    * tagged into one relation.
    */
  def q7SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Sources.customer(spark, dir)
    val a = cust.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val b = cust.filter($"c_acctbal" > 5000.0).select($"c_custkey")
    a.union(b).distinct().withColumn("op", lit("union"))
      .unionByName(a.intersect(b).withColumn("op", lit("intersect")))
      .unionByName(a.except(b).withColumn("op", lit("except")))
      .orderBy($"op", $"c_custkey")
  }

  /** §2.9 string family — lower/upper/length/substring/split/concat_ws/
    * regexp_extract/LIKE/levenshtein, all codegen'd Catalyst expressions
    * (reference analogue: path-string slicing at main.py:159-167).
    */
  def q8ScalarString(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.part(spark, dir)
      .select(
        $"p_partkey",
        lower($"p_name").as("name_lower"),
        upper($"p_brand").as("brand_upper"),
        length($"p_name").as("name_len"),
        substring($"p_type", 1, 4).as("type_pre"),
        split($"p_name", " ").getItem(0).as("first_word"),
        concat_ws("-", $"p_brand", $"p_type").as("brand_type"),
        regexp_extract($"p_brand", "(\\d+)", 1).as("brand_num"),
        $"p_name".like("%a%").as("has_a"),
        levenshtein($"p_brand", lit("Brand#10")).as("lev_b10"))
      .orderBy($"p_partkey")
  }

  /** §2.9 date/time family over orders. */
  def q9ScalarDate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.orders(spark, dir)
      .select(
        $"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        quarter($"o_orderdate").as("qtr"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        unix_timestamp($"o_orderdate").as("epoch_s"),
        datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date")).as("days_to_2002"))
      .orderBy($"o_orderkey")
  }

  /** §2.9 JSON family — get_json_object over events.props, then a
    * grouped aggregate of the extracted value.
    */
  def q10Json(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.events(spark, dir)
      .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(
        count($"k").as("n_with_k"),
        round(avg($"k"), 6).as("avg_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** §2.9 map/JSON family (full form): from_json into a typed MapType,
    * exploded to (key, value) rows, then aggregated per key —
    * complements q10's path-extraction (`get_json_object`) with the
    * schema-on-read map surface.
    */
  def q37FromJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.events(spark, dir)
      .select(explode(from_json($"props",
        org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")))
        .as(Seq("key", "val")))
      .groupBy($"key")
      .agg(
        count(lit(1)).as("n"),
        round(avg($"val"), 6).as("avg_val"),
        min($"val").as("min_val"),
        max($"val").as("max_val"))
      .orderBy($"key")
  }

  /** §2.9 math family + CASE WHEN banding. */
  def q11Math(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.lineitem(spark, dir)
      .filter($"l_orderkey" % 10 === 0)
      .select(
        $"l_orderkey", $"l_linenumber",
        round(pow($"l_quantity", 2.0), 2).as("qty_sq"),
        round(sqrt($"l_extendedprice"), 6).as("price_sqrt"),
        round(log($"l_extendedprice"), 6).as("price_ln"),
        when($"l_quantity" < 10, "low")
          .when($"l_quantity" < 30, "mid")
          .otherwise("high").as("qty_band"),
        ($"l_quantity" % 7.0).cast("int").as("qty_mod"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** A3 — multi-statistic summary (the reference's describe() EDA,
    * main.py:216-220) as explicit aggregates: count/mean/std/min/max
    * per measure. approx percentiles are excluded from the oracle
    * (engine-specific estimators) and covered by unit tests instead.
    */
  def q12Stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Mean and stddev from EXACT decimal sums (Σx, Σx² are
    // order-independent decimals; the remaining double math is a fixed
    // scalar sequence mirrored verbatim in the oracle SQL) — avg/stddev
    // over IEEE doubles would hash-flake with partial-agg order. The
    // cancellation in Σx² − (Σx)²/n happens on exact sums, so the only
    // float error is the final representable-double rounding, identical
    // in both engines.
    val qty = $"l_quantity".cast("decimal(12,2)")
    val price = $"l_extendedprice".cast("decimal(12,2)")
    val n = count(lit(1))
    def std(x: Column, digits: Int) = round(
      sqrt((sum(x * x).cast("double") -
        sum(x).cast("double") * sum(x).cast("double") / n) / (n - lit(1))), digits)
    Sources.lineitem(spark, dir).agg(
      count(lit(1)).as("cnt"),
      round(sum(qty).cast("double") / n, 6).as("qty_mean"),
      std(qty, 6).as("qty_std"),
      round(min($"l_quantity"), 2).as("qty_min"),
      round(max($"l_quantity"), 2).as("qty_max"),
      round(sum(price).cast("double") / n, 4).as("price_mean"),
      std(price, 4).as("price_std"))
  }

  /** A3 completion — EXACT quartiles via Spark's `percentile` (full
    * sort-based, vs the approx sketch in summary()/q12's test coverage).
    * Both engines use linear interpolation between adjacent order
    * statistics. At 100 TB you'd use approx_percentile (q12 / A3 notes);
    * the exact form exists for parity with the reference's describe()
    * (/root/reference/main.py:219-220, 25/50/75%).
    */
  def q42Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.lineitem(spark, dir).agg(
      round(expr("percentile(l_quantity, 0.25)"), 6).as("qty_p25"),
      round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
      round(expr("percentile(l_quantity, 0.75)"), 6).as("qty_p75"),
      round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"))
  }

  /** A3 (grouped) — exact per-group quartiles: `percentile` inside a
    * groupBy, the per-class analogue of the reference's global
    * describe() (main.py:216-220 samples columns; a real EDA wants the
    * distribution per segment). One grouped sort-based aggregate;
    * the 100 TB posture note from q42 applies (exact percentile sorts
    * within groups — switch to approx_percentile when group
    * cardinality × group size makes that the bottleneck).
    */
  def q48GroupPercentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(l_quantity, 0.25)"), 6).as("qty_p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("qty_p75"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_p50"))
      .orderBy($"l_returnflag")
  }

  /** A3 (scale path) — the approx quantile sketch q42/q48's scaladocs
    * point to: `approx_percentile` (Greenwald-Khanna) per group at
    * accuracy 10,000 (error ≤ 1/accuracy of rank). One streaming pass,
    * FIXED memory per group regardless of row count — the form that
    * replaces the exact within-group sort at 100 TB. Rows-only (DuckDB's
    * approx_quantile is a different sketch (t-digest), so values differ
    * by construction); `RelationalSpec` bounds it against the exact
    * percentiles instead.
    */
  def q54ApproxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(expr("approx_percentile(l_quantity, 0.25, 10000)"), 6).as("qty_p25"),
        round(expr("approx_percentile(l_quantity, 0.5, 10000)"), 6).as("qty_p50"),
        round(expr("approx_percentile(l_quantity, 0.75, 10000)"), 6).as("qty_p75"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 4).as("price_p50"))
      .orderBy($"l_returnflag")
  }

  /** Cross-query BOUNDS CHECK for the rows-only HLL query (ORACLED,
    * q74) — the sketch itself is engine-specific (q36 stays rows-only
    * by design), but its GUARANTEE is oracle-checkable: the output
    * carries the exact distinct counts (DuckDB reproduces those) plus a
    * boolean asserting every q36 HLL estimate (rsd 0.01) landed within
    * 3·rsd of the exact count; the oracle states `true`. A sketch
    * regression flips the boolean and hash-fails the round — a real
    * verdict instead of a bare `no_oracle`.
    *
    * The exact and approx families run as SEPARATE 1-row aggregates
    * cross-joined at the end (1-row broadcast), NOT one combined
    * `agg(...)`: mixing multi-column `countDistinct` with
    * `approx_count_distinct` plans an Expand whose stage-1 groups are
    * the distinct VALUES — and every non-distinct aggregate's buffer is
    * allocated per group, so each of ~600k value-groups at sf0.1
    * carried three 16 KB HLL register arrays (tens of GB of buffer →
    * spill). Measured: 86.6 s combined vs ~4 s split, and the split
    * grows linearly with rows while the combined shape's buffer volume
    * grows with DISTINCT values — unusable at 100 TB.
    *
    * The exact side is additionally split into three SINGLE-distinct
    * aggregates cross-joined as 1-row broadcasts — q3's recorded shape.
    * Three distincts in one `agg` plan one Expand that triples every
    * row before the shuffle; three thin single-column scans move less
    * data in total, and the combined shape showed 16 s GC-amplified
    * spikes in baseline recording (its 3× allocation burst lands on
    * whatever slow window the host is in) where q3 never did.
    */
  def q74HllBounds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rsd = 0.01
    val li = Sources.lineitem(spark, dir)
    val exact = li.agg(countDistinct($"l_orderkey").as("exact_orders"))
      .crossJoin(broadcast(li.agg(countDistinct($"l_partkey").as("exact_parts"))))
      .crossJoin(broadcast(li.agg(countDistinct($"l_suppkey").as("exact_supps"))))
    val approx = li.agg(
      approx_count_distinct($"l_orderkey", rsd).as("a_orders"),
      approx_count_distinct($"l_partkey", rsd).as("a_parts"),
      approx_count_distinct($"l_suppkey", rsd).as("a_supps"))
    def ok(a: Column, exactCnt: Column): Column =
      abs(a.cast("double") - exactCnt.cast("double")) <=
        lit(3 * rsd) * exactCnt.cast("double")
    exact.crossJoin(approx)
      .select(
        $"exact_orders", $"exact_parts", $"exact_supps",
        (ok($"a_orders", $"exact_orders") &&
          ok($"a_parts", $"exact_parts") &&
          ok($"a_supps", $"exact_supps")).as("hll_within_3rsd"))
  }

  /** Cross-query BOUNDS CHECK for the rows-only GK-sketch query
    * (ORACLED, q75) — q54's `approx_percentile` values can't match
    * DuckDB's t-digest, but GK's RANK guarantee can be stated exactly:
    * at accuracy 10,000 the returned value's rank is within ε = 1e-4·n
    * of the target, so it must lie between the exact percentiles at
    * q ∓ 0.001 (10× slack on ε). Output: the exact group percentiles
    * (oracle-reproducible) plus the per-group guarantee boolean; the
    * oracle states `true`.
    *
    * Every requested quantile rides ONE aggregate buffer per column:
    * `percentile` / `approx_percentile` take ARRAYS of percentages, so
    * the grouped pass carries 2 exact value-buffers + 2 GK sketches per
    * group — the first cut spelled each bound as its own
    * `percentile(col, q)` call, which buffered the group's full value
    * multiset once PER PERCENTILE (10 copies; measured 5.4–23.8 s at
    * sf0.1 vs ~2 s with shared buffers, and the duplication factor is
    * what 100 TB would multiply).
    */
  def q75GkBounds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // exact bounds at q ∓ eps for q ∈ {.25, .5, .75}(qty), {.5}(price)
    val qtyQs = "array(0.249D, 0.251D, 0.499D, 0.5D, 0.501D, 0.749D, 0.751D)"
    val priceQs = "array(0.499D, 0.5D, 0.501D)"
    def within(gk: Column, lo: Column, hi: Column): Column =
      gk >= lo && gk <= hi
    Sources.lineitem(spark, dir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        expr(s"percentile(l_quantity, $qtyQs)").as("qx"),
        expr(s"percentile(l_extendedprice, $priceQs)").as("px"),
        expr("approx_percentile(l_quantity, array(0.25D, 0.5D, 0.75D), 10000)").as("gq"),
        expr("approx_percentile(l_extendedprice, 0.5D, 10000)").as("gp"))
      .select(
        $"l_returnflag", $"n",
        round(element_at($"qx", 4), 6).as("qty_p50_exact"),
        round(element_at($"px", 2), 4).as("price_p50_exact"),
        (within(element_at($"gq", 1), element_at($"qx", 1), element_at($"qx", 2)) &&
          within(element_at($"gq", 2), element_at($"qx", 3), element_at($"qx", 5)) &&
          within(element_at($"gq", 3), element_at($"qx", 6), element_at($"qx", 7)) &&
          within($"gp", element_at($"px", 1), element_at($"px", 3)))
          .as("gk_within_rank_eps"))
      .orderBy($"l_returnflag")
  }

  /** A11 extension — pivot (long → wide): order counts and DECIMAL
    * revenue per priority, pivoted on the three order statuses. The
    * pivot values are DECLARED (`Seq("F","O","P")`) — the
    * values-unspecified overload runs an extra distinct job over the
    * pivot column and caps cardinality at
    * `spark.sql.pivotMaxValues` (1e4), the wrong trade at 100 TB when
    * the domain is known. Physical shape: one partial+final aggregate
    * on the (priority, status) pair, then a width-|statuses|
    * projection — no extra shuffle vs the plain GROUP BY. Missing
    * cells surface as null → coalesced to 0 like the oracle's
    * conditional aggregation.
    */
  def q57Pivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val statuses = Seq("F", "O", "P")
    val wide = Sources.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", statuses)
      .agg(
        count(lit(1)).as("n"),
        sum($"o_totalprice".cast(org.apache.spark.sql.types.DataTypes
          .createDecimalType(12, 2))).as("rev"))
    wide.select(
      $"o_orderpriority" +:
        statuses.flatMap(st => Seq(
          coalesce(col(s"${st}_n"), lit(0L)).as(s"n_${st.toLowerCase}"),
          coalesce(col(s"${st}_rev").cast("double"), lit(0.0))
            .as(s"rev_${st.toLowerCase}"))): _*)
      .orderBy($"o_orderpriority")
  }

  /** A11 extension — unpivot/melt (wide → long): the four lineitem
    * measures melted to (metric, value) rows, then per-metric count /
    * min / max / DECIMAL-exact sum. Uses the native `unpivot` operator
    * (an Expand node — |measures|× row multiply in the map stage,
    * before the |metrics|-key aggregate; no shuffle beyond the final
    * grouped exchange).
    */
  def q58Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.lineitem(spark, dir)
      .unpivot(
        Array($"l_orderkey", $"l_linenumber"),
        Array($"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        "metric", "value")
      .groupBy($"metric")
      .agg(
        count(lit(1)).as("n"),
        min($"value").as("vmin"),
        max($"value").as("vmax"),
        sum($"value".cast(org.apache.spark.sql.types.DataTypes
          .createDecimalType(18, 2))).cast("double").as("vsum"))
      .orderBy($"metric")
  }

  /** A11 extension — GROUPING SETS beyond rollup/cube (q4/q5): the two
    * single-column marginals plus the grand total, WITHOUT the
    * (status, priority) cross cells a cube would add. Registered
    * through `spark.sql` — the SQL entry point is part of the engine
    * surface, and grouping sets this shape has no DataFrame-API
    * equivalent. Same Expand → partial agg → one grouped shuffle
    * physical plan as rollup; DECIMAL sums keep the hash
    * aggregation-order-proof.
    */
  def q61GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Sources.orders(spark, dir).createOrReplaceTempView("orders_gsets")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
        | CAST(grouping(o_orderstatus) AS INT) AS g_status,
        | CAST(grouping(o_orderpriority) AS INT) AS g_prio
        |FROM orders_gsets
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** §2.9 string (regexp_replace) — CCNet-style text canonicalization:
    * lowercase, non-alphanumeric runs collapsed to single spaces,
    * trimmed — the normalization step curation pipelines apply before
    * hash-dedup so that punctuation/case variants collide. Pure
    * map-stage scalar expressions (all codegen'd); patterns use only
    * character classes so Java regex (Spark) and RE2 (DuckDB) agree.
    */
  def q63NormalizeText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def norm(c: org.apache.spark.sql.Column) =
      trim(regexp_replace(lower(c), "[^a-z0-9]+", " "))
    Sources.part(spark, dir)
      .select(
        $"p_partkey",
        norm($"p_name").as("norm_name"),
        norm($"p_brand").as("norm_brand"),
        norm($"p_type").as("norm_type"),
        size(split(norm($"p_name"), " ")).cast("int").as("n_name_tokens"))
      .orderBy($"p_partkey")
  }

  /** A1/A2 analogue of the reference's class-distribution count +
    * global min (main.py:95-101,157-158): group sizes and the minimum
    * group size, via a single grouped pass + global agg join-free
    * (cross join of one row is a broadcast).
    */
  def q13GroupMin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = Sources.orders(spark, dir)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
    counts
      .crossJoin(broadcast(counts.agg(min($"n").as("min_n"))))
      .select($"o_orderpriority", $"n", $"min_n")
      .orderBy($"o_orderpriority")
  }

  /** A3/A11 completion (ORACLED) — fixed-width histogram of order value
    * with cumulative counts and fractions: bin = floor(v/w) (identical
    * IEEE division + floor on both engines), per-bin count and DECIMAL
    * sum, then ONE window pass over the ~dozens-of-bins AGGREGATE for
    * the running totals. Fractions use the floor(x·1e6+0.5)/1e6
    * micro-unit form (q52 precedent) — integer-ratio inputs, tie-proof.
    *
    * 100 TB posture: the histogram itself is a single map-side-combined
    * aggregate on a numeric bin key; the cumulative window runs on the
    * REDUCED frame (#bins rows), so the unpartitioned ordering is a
    * non-issue — never window raw rows for a cumulative histogram.
    */
  def q69Histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = 25000.0
    val binned = Sources.orders(spark, dir)
      .withColumn("bin", floor($"o_totalprice" / w).cast("long"))
      .groupBy($"bin")
      .agg(
        count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(12,2)")).as("price_sum"))
    val cum = Window.orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The grand total comes from a full-frame window over the SAME
    // reduced histogram — one pass, no second scan of the fact table.
    val total = Window.orderBy($"bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned
      .select(
        $"bin",
        ($"bin" * w).as("bin_lo"),
        $"n",
        $"price_sum".cast("double").as("price_sum"),
        sum($"n").over(cum).as("cum_n"),
        (floor(sum($"n").over(cum).cast("double") * 1e6
          / sum($"n").over(total) + 0.5) / 1e6).as("cum_frac"))
      .orderBy($"bin")
  }
}
