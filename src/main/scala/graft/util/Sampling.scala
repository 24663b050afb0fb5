package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators — SURVEY.md §2.2 P5/P6.
  *
  * P5 mirrors the reference's balanced per-class load
  * (/root/reference/main.py:157-165: `random.sample(files, limit)` with
  * limit = min class count); P6 mirrors the shuffled 85/15 split
  * (main.py:201-202).
  */
object Sampling {

  /** P5 — exact-k uniform sample per group: rank rows by a seeded
    * uniform draw within each group and keep the first k. One window
    * shuffle on the label; groups smaller than k are kept whole.
    * (`df.stat.sampleBy` is fraction-based and inexact — not sufficient
    * for the reference's balanced-load semantics.)
    */
  def stratifiedExactSample(df: DataFrame, labelCol: String, k: Int, seed: Long): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(col("__strat_r"))
    df.withColumn("__strat_r", rand(seed))
      .withColumn("__strat_rn", row_number().over(w))
      .filter(col("__strat_rn") <= k)
      .drop("__strat_r", "__strat_rn")
  }

  /** Deterministic weighted Bernoulli sample: keep a row iff its
    * hash-derived 32-bit uniform `u` satisfies `u/2^32 < weight/scale`
    * — evaluated as the EXACT integer cross-multiplication
    * `u * scale < weight * 2^32` (no float comparison anywhere, so
    * Spark and any other engine computing the same md5 agree
    * bit-for-bit; p ≥ 1 keeps the row automatically since u < 2^32).
    *
    * This is the sampling shape a training-data pipeline needs at
    * 100 TB: pure map-stage (fuses into the scan, no shuffle, no RNG
    * state), REPRODUCIBLE across reruns and engines, and STABLE under
    * joins — a document is in or out of the sample everywhere it
    * appears, because membership is a function of its key, not of a
    * row's position in some partition (contrast `df.sample`, whose
    * draw depends on partitioning). Weighted: p = weight/scale, e.g.
    * quality-score-proportional document selection.
    *
    * Caveats: `u*scale` and `weight*2^32` must stay under 2^63 —
    * scale and weights below ~2^30 are safe; md5 here is a uniformity
    * device, not a security boundary. The weight column must be
    * INTEGRAL (the exact comparison lives in the integer domain; a
    * silent cast would floor fractional weights, dropping every
    * 0 < w < 1 row entirely) — pre-scale fractional weights into
    * integers, e.g. `round(w * 1000)` against `scale * 1000`, or use
    * [[weightedExactSample]] whose rank accepts any positive weight.
    */
  def hashWeightedSample(df: DataFrame, keyCol: String, weightCol: String,
      scale: Long): DataFrame = {
    require(scale > 0, s"scale must be positive, got $scale")
    val wt = df.schema(weightCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(wt.typeName),
      s"weight column $weightCol must be integral, got ${wt.typeName}: " +
        "the exact membership comparison is integer-only — pre-scale " +
        "fractional weights (e.g. round(w*1000) vs scale*1000)")
    val u = conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    df.filter(u * lit(scale) < col(weightCol).cast("long") * lit(4294967296L))
  }

  /** Weighted exact-k sample WITHOUT replacement (Efraimidis–Spirakis
    * A-ES, IPL 2006): rank every row by `u^(1/w)` with `u` the same
    * md5-derived uniform as [[hashWeightedSample]] (shifted into
    * (0, 1] so `u = 0` can't occur) and keep the global top-k.
    * Deterministic for a given dataset — the rank is a pure function
    * of (key, weight) — and partition-independent.
    *
    * Scale shape: `orderBy(...).limit(k)` plans
    * `TakeOrderedAndProject` — each task keeps a k-row heap and only
    * those k-row heads move to the driver-side merge; no global sort,
    * no data shuffle (plan-asserted in `SamplingSpec`). Rows with
    * non-positive weight are dropped (p = 0 semantics, matching the
    * Bernoulli variant where `u·scale < w·2^32` is unsatisfiable for
    * w ≤ 0). Rows-only engine op: the float `pow` rank is IEEE-stable
    * inside Spark but not bit-portable across engines, so unlike q83
    * it gets property tests, not a DuckDB oracle.
    */
  def weightedExactSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    df.filter(col(weightCol) > 0)
      .withColumn("__aes", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("__aes").desc, col(keyCol))
      .limit(k)
      .drop("__aes")
  }

  /** Weighted exact-k sample PER GROUP — [[weightedExactSample]]'s
    * A-ES rank composed with [[stratifiedExactSample]]'s window shape:
    * rank rows by `u^(1/w)` WITHIN each group (`row_number` over the
    * group partition) and keep each group's top k. This is the sample a
    * curation pipeline actually draws — "k docs per language/source,
    * picked proportionally to quality" — stratification and weighting
    * in ONE pass.
    *
    * Scale shape: one window shuffle on the group key (same as q33's
    * stratified sample; the global A-ES heap trick doesn't compose with
    * per-group limits, so the window IS the right plan). Deterministic
    * for a given dataset — rank is a pure function of (key, weight) —
    * and partition-independent. Groups smaller than k (after dropping
    * w ≤ 0 rows) are kept whole, matching the exact-k contract.
    */
  def weightedExactSamplePerGroup(df: DataFrame, groupCol: String,
      keyCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__aes").desc, col(keyCol))
    df.filter(col(weightCol) > 0)
      .withColumn("__aes", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .withColumn("__aes_rn", row_number().over(w))
      .filter(col("__aes_rn") <= k)
      .drop("__aes", "__aes_rn")
  }

  /** ORACLED exercise (q86) — q33's count-contract oracle applied to
    * the weighted per-group sample: WHICH docs are drawn is the
    * engine's IEEE `pow` rank (not bit-portable, so not hashed), but
    * the exact-k contract — `least(|group with w > 0|, k)` rows per
    * language — is engine-independent and DuckDB-checkable.
    */
  def q86WeightedGroupSample(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val sampled = weightedExactSamplePerGroup(
      graft.ops.Sources.documents(spark, dir), "lang", "doc_id", "n_chars", 40)
    sampled.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"))
  }

  /** ORACLED exercise (q83): length-weighted document sample —
    * p = n_chars/2000, so a 500-char doc is ~5× likelier than a
    * 100-char one. DuckDB reproduces membership exactly via the same
    * md5-hex integer comparison.
    */
  def q83WeightedSample(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hashWeightedSample(
      graft.ops.Sources.documents(spark, dir), "doc_id", "n_chars", 2000L)
      .select($"doc_id", $"n_chars", $"lang")
      .orderBy($"doc_id")
  }

  /** P5 composed with A2 — balance every class down to the global
    * minimum class size, the reference's exact balancing rule
    * (main.py:157-158). The min class size rides the sampling plan as
    * a 1-row broadcast (the q13 shape) instead of a separate `.head()`
    * driver action, so the whole balance is ONE job — at 100 TB the
    * old two-pass form scanned the table once just to size k
    * (construction is asserted job-free in SamplingSpec).
    */
  def balanceToMinClass(df: DataFrame, labelCol: String, seed: Long): DataFrame = {
    val minC = df.groupBy(col(labelCol)).count()
      .agg(min("count").as("__min_n"))
    val w = Window.partitionBy(col(labelCol)).orderBy(col("__strat_r"))
    df.withColumn("__strat_r", rand(seed))
      .withColumn("__strat_rn", row_number().over(w))
      .crossJoin(broadcast(minC))
      .filter(col("__strat_rn") <= col("__min_n"))
      .drop("__strat_r", "__strat_rn", "__min_n")
  }

  /** P6 — seeded shuffled 85/15 split (Bernoulli per-partition sampling,
    * same semantics class as dask-ml's per-block split).
    */
  def split8515(df: DataFrame, seed: Long): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(0.85, 0.15), seed)
    (train, test)
  }

  /** P5 oracle query — exact-k sample per priority class, reduced to
    * per-group counts: WHICH rows are kept is seed/partitioning-local,
    * but the exact-k contract (`least(group size, k)` rows per group) is
    * engine-independent and DuckDB-checkable.
    */
  def q33StratSample(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val sampled = stratifiedExactSample(
      graft.ops.Sources.orders(spark, dir), "o_orderpriority", 10, 42L)
    sampled.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** DETERMINISTIC CORPUS MIXTURE (the Pile/DoReMi-style data-mixing
    * step a pretraining pipeline runs after admission): given an
    * integer target WEIGHT per group (source), downsample every group
    * so the shipped mixture hits the target PROPORTIONS exactly, at
    * the largest corpus size the available data supports —
    * T* = min_g⌊count_g·W/w_g⌋ (W = Σ distinct group weights), quota
    * n_g = ⌊w_g·T* / W⌋, so the binding (scarcest-relative-to-weight)
    * group is kept near-whole and every other group is cut to
    * proportion. Selection WITHIN a group is the md5-rank idiom
    * (q33/q83/q93): the n_g docs with smallest (md5(id), id) — a pure
    * function of the id, stable under re-partitioning, and exactly
    * reproducible in SQL. All quota arithmetic is integer-exact.
    *
    * `weightCol` must be functionally dependent on `groupCol` (one
    * weight per group; asserted by the max==min check).
    *
    * 100 TB posture: ONE per-group count aggregate whose |groups|-row
    * result is collected (the bounded-summary class — group = data
    * source, dozens not millions), integer quota math driver-side,
    * quotas re-broadcast as a literal join table, and ONE per-group
    * rank window (keyed shuffle on the group). No second corpus pass.
    */
  def corpusMixture(df: DataFrame, idCol: String, groupCol: String,
      weightCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"),
        max(weightCol).as("wt"), min(weightCol).as("wt_min"))
      .select(col(groupCol).cast("string"), col("cnt"),
        col("wt").cast("long"), col("wt_min").cast("long"))
      .as[(String, Long, Long, Long)].collect()
    // weight must be constant within each group or quotas are
    // ill-defined — fail loudly, not with a silently wrong mixture
    sizes.foreach { case (g, _, wt, wtMin) =>
      require(wt == wtMin,
        s"corpusMixture: weightCol is not constant within group '$g'")
      require(wt >= 1, s"corpusMixture: weight of group '$g' must be >= 1")
    }
    require(sizes.nonEmpty, "corpusMixture: empty input")
    // BigInt products (the temperatureMixture discipline): cnt·ΣW and
    // wt·tStar overflow Long silently at large corpus × summed-weight
    // scales, producing wrong (possibly negative) quotas
    val bigW = sizes.map(s => BigInt(s._3)).sum
    val tStar = sizes.map { case (_, cnt, wt, _) => BigInt(cnt) * bigW / wt }
      .min
    val quota = sizes
      .map { case (g, _, wt, _) => (g, (BigInt(wt) * tStar / bigW).toLong) }
      .toSeq.toDF(groupCol, "n_quota")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(idCol), col(groupCol))
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .join(broadcast(quota), Seq(groupCol))
      .filter(col("sel_rank") <= col("n_quota"))
      .select(col(idCol), col(groupCol), col("sel_rank"))
  }

  /** ORACLED exercise (q121): [[corpusMixture]] over `documents` with
    * a deliberately NON-uniform weight derived from the source name
    * (even-numbered sources weigh 3, odd 1), so the quota math cuts
    * every group differently; every selected doc and its within-source
    * rank hash-checked against DuckDB's re-derivation of the weights,
    * quotas, and md5 ranks.
    */
  def q121CorpusMixture(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.ops.Sources.documents(spark, dir)
    val wt = when(
      expr("CAST(substr(source, 4, 10) AS INT)") % 2 === 0, lit(3L))
      .otherwise(lit(1L))
    corpusMixture(docs, "doc_id", "source", wt)
      .orderBy(col("doc_id"))
  }

  /** L53 — UNIMAX language sampling (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling for Large-Scale
    * Multilingual Pretraining", ICLR — public): allocate a total TOKEN
    * budget across languages as uniformly as possible, capping any
    * language at `maxEpochs` repetitions of its corpus — the paper's
    * fix for temperature sampling's twin failure modes (head languages
    * still dominate at high temperature; tail languages over-epoch and
    * memorize at low temperature).
    *
    * Water-filling, integer-exact (BigInt products, the corpusMixture
    * discipline): languages ascending by token count; each takes
    * b_l = min(remaining div languages_left, maxEpochs·c_l), remaining
    * shrinks, so budget freed by capped small languages flows to the
    * big ones. Per-language plan → per-doc manifest: full_epochs =
    * b_l div c_l copies of everything, plus ONE partial epoch — docs
    * ranked by (md5(id), id) within the language, included while their
    * RUNNING token total fits b_l mod c_l (never overshoots).
    *
    * Output per doc: lang totals/budget, its rank, full_epochs,
    * in_fractional, copies = full_epochs + (in_fractional ? 1 : 0).
    *
    * 100 TB posture: one bounded per-language aggregate (collect is
    * O(#languages)), a driver fold over it, a broadcast plan join, and
    * one rank+running-sum window per language partition — the q121
    * rank idiom; for languages too large for one sort partition the
    * window becomes the range-partitioned two-pass prefix sum
    * ([[graft.ops.Packing.sequencePackWithOffsets]]'s shape, keyed by
    * (md5, id) instead of id).
    */
  def unimaxPlan(df: DataFrame, idCol: String, langCol: String,
      tokensCol: Column, budget: Long, maxEpochs: Int): DataFrame = {
    require(budget >= 0, s"unimaxPlan: budget must be >= 0, got $budget")
    require(maxEpochs >= 1, s"unimaxPlan: maxEpochs must be >= 1, got $maxEpochs")
    import df.sparkSession.implicits._
    val toks = df.select(col(idCol), col(langCol).cast("string").as("lang"),
        tokensCol.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val sizes = toks.groupBy($"lang").agg(sum($"n_tokens").as("c"))
      .as[(String, Long)].collect().sortBy { case (l, c) => (c, l) }
    require(sizes.nonEmpty, "unimaxPlan: empty input")
    var remaining = BigInt(budget)
    var left = sizes.length
    val plan = sizes.map { case (l, c) =>
      val b = (remaining / left).min(BigInt(maxEpochs) * c)
      remaining -= b; left -= 1
      (l, c, b.toLong)
    }
    val bdf = broadcast(
      plan.toSeq.toDF("lang", "lang_tokens", "lang_budget"))
    val w = Window.partitionBy($"lang")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(bdf, Seq("lang"))
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .withColumn("cum_end", sum($"n_tokens").over(wRun))
      .withColumn("full_epochs", expr("lang_budget div lang_tokens"))
      .withColumn("in_fractional",
        $"cum_end" <= expr("lang_budget % lang_tokens"))
      .withColumn("copies",
        $"full_epochs" + when($"in_fractional", 1L).otherwise(0L))
      .select(col(idCol), $"lang", $"n_tokens", $"lang_tokens",
        $"lang_budget", $"sel_rank", $"full_epochs", $"in_fractional",
        $"copies")
  }

  /** ORACLED (q164): [[unimaxPlan]] over `documents` at budget 40 000
    * tokens, maxEpochs 2 — at sf0.01 the four small languages hit the
    * 2-epoch cap and release budget to `en`, which lands a fractional
    * epoch; DuckDB re-derives the water-fill as a recursive CTE over
    * the size-ordered language list and every rank/cumsum/copy
    * decision.
    */
  def q164Unimax(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.ops.Sources.documents(spark, dir)
    unimaxPlan(docs, "doc_id", "lang",
        graft.ops.Packing.bpeishCount(col("text")), 40000L, 2)
      .orderBy(col("doc_id"))
  }

  /** Temperature-scaled corpus mixture (XLM-R / mT5-style α-sampling,
    * Conneau et al. 2020 §3.1): per-group sampling mass ∝ count^α with
    * α < 1 UP-weighting rare groups relative to their natural share.
    * Deterministic, integer-exact selection:
    *
    *  - per-group mass in MICRO-UNITS: r_g = round(1e6 · count_g^α),
    *    a fixed integer per (group, α) — for α = 0.5 the power is
    *    `sqrt`, correctly rounded IEEE-754 in both the JVM and DuckDB,
    *    so an oracle can re-derive r_g bit-exactly (other α go through
    *    `math.pow`, deterministic for the ENGINE but not contractually
    *    identical across libms — oracle at α = 0.5);
    *  - T = total·targetNum/targetDen (integer floor), the output size
    *    target;
    *  - quota_g = min(count_g, ⌊T·r_g / Σr⌋) — BigInt on the driver, so
    *    the product cannot overflow even at 1e12-row groups (where
    *    T·r_g ≈ 1e24 exceeds Long); real α-sampling resolves
    *    quota > count by repeating rare docs across epochs, this
    *    single-epoch selection caps instead (documented, not hidden);
    *  - selection per group = smallest (md5(id), id) ranks up to the
    *    quota — partition-invariant, no RNG.
    *
    * Cost shape is [[corpusMixture]]'s: one bounded count aggregate
    * (#groups rows collected), quotas broadcast, ONE per-group rank
    * window. Nothing else shuffles.
    */
  def temperatureMixture(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double, targetNum: Long, targetDen: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(targetNum >= 1 && targetDen >= 1 && targetNum <= targetDen,
      s"need 1 <= targetNum <= targetDen, got $targetNum/$targetDen")
    val micro = alphaMasses(df, groupCol, alpha)
    val rSum = micro.map(_._3).sum
    val t = BigInt(micro.map(_._2).sum) * targetNum / targetDen
    val quota = micro.map { case (g, c, r) =>
      // cap at the group count makes .toLong safe here: quota <= count
      (g, (t * r / rSum).min(BigInt(c)).toLong)
    }.toSeq.toDF(groupCol, "n_quota")
    val w = md5RankWindow(idCol, groupCol)
    df.select(col(idCol), col(groupCol))
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .join(broadcast(quota), Seq(groupCol))
      .filter(col("sel_rank") <= col("n_quota"))
      .select(col(idCol), col(groupCol), col("sel_rank"))
  }

  /** Shared α-mass fit for the temperature-mixture family: per-group
    * (group, count, micro-mass) with mass r_g = round(1e6·count^α) in
    * HALF-UP rounding — the repo's rounding convention AND DuckDB's
    * `round()`, so the oracled α = 0.5 point stays bit-identical on
    * exact .5 micro-ties (math.rint's half-to-even would diverge
    * there). One bounded count aggregate, #groups rows collected.
    */
  private def alphaMasses(df: DataFrame, groupCol: String,
      alpha: Double): Array[(String, Long, BigInt)] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val sizes = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col(groupCol).cast("string"), col("cnt"))
      .as[(String, Long)].collect()
    require(sizes.nonEmpty, "temperature mixture: empty input")
    sizes.map { case (g, c) =>
      val mass = if (alpha == 0.5) math.sqrt(c.toDouble)
                 else math.pow(c.toDouble, alpha)
      (g, c, BigInt(
        BigDecimal(1e6 * mass).setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toLong))
    }
  }

  /** The mixture family's deterministic selection order: smallest
    * (md5(id), id) first within each group — partition-invariant,
    * no RNG.
    */
  private def md5RankWindow(idCol: String, groupCol: String) =
    org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))

  /** Multi-EPOCH temperature mixture — [[temperatureMixture]] without
    * the single-epoch cap: when α-sampling up-weights a rare group past
    * its size (quota > count), real pipelines REPEAT its documents
    * across epochs (Conneau et al. 2020 §3.1 trains on α-scaled
    * multinomials for many steps; the repetition IS the up-weighting).
    * This emits each selected (doc, epoch) pair deterministically:
    *
    *  - T_g = ⌊T·r_g/Σr⌋ exactly as the capped variant (BigInt-safe);
    *  - every doc of group g appears in epochs 0..(T_g div c_g)−1
    *    (the full passes), and the docs with the smallest (md5(id), id)
    *    ranks up to T_g mod c_g appear in one further epoch —
    *    so exactly T_g rows per group, every row a pure function of
    *    the id (partition-invariant, no RNG);
    *  - `targetNum/targetDen` may exceed 1 (e.g. 2/1 = a two-epoch
    *    token budget): that is the whole point of the variant.
    *
    * Shape: one bounded count aggregate, quotas broadcast, ONE
    * per-group rank window, one bounded explode (output rows = T by
    * construction). Nothing else shuffles.
    */
  def temperatureMixtureEpochs(df: DataFrame, idCol: String,
      groupCol: String, alpha: Double, targetNum: Long,
      targetDen: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(targetNum >= 1 && targetDen >= 1,
      s"need positive target ratio, got $targetNum/$targetDen")
    val micro = alphaMasses(df, groupCol, alpha)
    val rSum = micro.map(_._3).sum
    val t = BigInt(micro.map(_._2).sum) * targetNum / targetDen
    val quota = micro.map { case (g, c, r) =>
      val tg = t * r / rSum
      // this variant has no quota cap and targetNum is unbounded, so
      // an absurd target CAN push a group's row count past Long — fail
      // loudly instead of wrapping negative and emitting nothing
      require(tg.isValidLong,
        s"temperatureMixtureEpochs: group '$g' quota $tg exceeds Long " +
          s"range — lower targetNum/targetDen")
      (g, tg.toLong / c, tg.toLong % c)
    }.toSeq.toDF(groupCol, "n_full", "n_extra")
    val w = md5RankWindow(idCol, groupCol)
    df.select(col(idCol), col(groupCol))
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .join(broadcast(quota), Seq(groupCol))
      .withColumn("n_epochs",
        col("n_full") + when(col("sel_rank") <= col("n_extra"), 1L)
          .otherwise(0L))
      .filter(col("n_epochs") > 0L)
      .select(col(idCol), col(groupCol), col("sel_rank"),
        explode(sequence(lit(0L), col("n_epochs") - 1L)).as("epoch"))
  }

  /** ORACLED exercise (q134): [[temperatureMixtureEpochs]] over
    * `documents` by language at α = 0.5 with a TWO-EPOCH token budget
    * (target 2/1) — on the naturally skewed lang column the rare
    * languages earn 2 full passes plus a partial while `en` gets 1
    * full pass plus a partial: the α-repetition visibly differs per
    * group. Every (doc, epoch) row and within-language rank
    * hash-checked against DuckDB's re-derivation (masses, unfloored
    * quotas, div/mod epoch split, generate_series explode).
    */
  def q134TemperatureEpochs(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.ops.Sources.documents(spark, dir)
    temperatureMixtureEpochs(docs, "doc_id", "lang",
        alpha = 0.5, targetNum = 2, targetDen = 1)
      .orderBy(col("doc_id"), col("epoch"))
  }

  /** ORACLED exercise (q131): [[temperatureMixture]] over `documents`
    * grouped by LANGUAGE — the canonical multilingual α-sampling
    * setting, and `lang` is naturally skewed (en ≈ 3× each other
    * language at every test SF, so α = 0.5 visibly up-weights the
    * rare languages vs their natural share). α = 0.5 is the sqrt
    * point — micro-unit masses re-derivable bit-exactly in SQL;
    * target 3/5 of the corpus. Every selected doc, its language, and
    * its within-language md5 rank hash-checked against DuckDB's
    * independent re-derivation of masses, quotas, and ranks.
    */
  def q131TemperatureMixture(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val docs = graft.ops.Sources.documents(spark, dir)
    temperatureMixture(docs, "doc_id", "lang",
        alpha = 0.5, targetNum = 3, targetDen = 5)
      .orderBy(col("doc_id"))
  }
}
