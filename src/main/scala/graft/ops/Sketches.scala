package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-items (heavy-hitters) sketching — the third mergeable
  * summary in the engine's sketch family, next to HLL distinct counts
  * (q36/q74) and GK quantiles (q54/q75).
  *
  * The reference's corpus-statistics loop (term/document frequencies,
  * /root/reference/main.py:238-243 analogue over text) materializes full
  * exact counts; at 100 TB the exact token→count table is itself huge
  * and the common question is only "which items exceed φ·n". Misra–Gries
  * answers that in ONE map-only pass with O(k) state per partition and a
  * single O(k)-per-partition merge — no token shuffle at all — with the
  * classic guarantees (Misra & Gries 1982; merge rule and proof from
  * Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *   - estimate ≤ true count            (counters only track seen items)
  *   - true count − estimate ≤ n/k      (each of the ≤ n/k decrement
  *                                       rounds removes k units total)
  *   - every item with true count > n/k survives in the sketch
  *
  * Both error bounds are DETERMINISTIC (not probabilistic like CMS), and
  * the merged sketch keeps them regardless of partition order — which is
  * exactly what makes the guarantee booleans of [[q78HeavyHitters]]
  * stable under Spark's nondeterministic partition/merge schedule even
  * though the raw counter values are not.
  */
object Sketches {

  /** Sketch state: item → counter, at most k−1 entries. An immutable
    * Map rides the product encoder for the partition-boundary shuffle;
    * within a partition the typed-Aggregator path keeps the buffer as a
    * live object, and at k ≤ a few hundred the per-token HAMT update is
    * noise next to the row decode.
    */
  case class MgBuf(m: Map[String, Long])

  /** Misra–Gries frequent-items over a string column. `k` bounds both
    * the state (k−1 counters) and the error (n/k). Output is the final
    * buffer (item → lower-bound estimate) — product-encoded, read the
    * map back out of the `m` field.
    */
  class MisraGries(k: Int) extends Aggregator[String, MgBuf, MgBuf] {
    require(k >= 2, s"MisraGries needs k >= 2, got $k")

    override def zero: MgBuf = MgBuf(Map.empty)

    override def reduce(b: MgBuf, x: String): MgBuf = {
      if (x == null) return b
      val m = b.m
      m.get(x) match {
        case Some(c) => MgBuf(m.updated(x, c + 1L))
        case None if m.size < k - 1 => MgBuf(m.updated(x, 1L))
        case None =>
          // Counter table full: one decrement round (k−1 stored items
          // plus the discarded incoming one lose a unit each).
          MgBuf(m.iterator
            .map { case (key, c) => key -> (c - 1L) }
            .filter(_._2 > 0L)
            .toMap)
      }
    }

    /** Mergeable-summaries rule: sum counters, then if more than k−1
      * survive, subtract the k-th largest counter from every entry and
      * drop the non-positives — at most k−1 remain and the combined
      * undercount stays ≤ (nₐ + n_b)/k.
      */
    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      if (a.m.isEmpty) return b
      if (b.m.isEmpty) return a
      var m = a.m
      b.m.foreach { case (key, c) =>
        m = m.updated(key, m.getOrElse(key, 0L) + c)
      }
      if (m.size <= k - 1) MgBuf(m)
      else {
        val kth = m.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
        MgBuf(m.iterator
          .map { case (key, c) => key -> (c - kth) }
          .filter(_._2 > 0L)
          .toMap)
      }
    }

    override def finish(b: MgBuf): MgBuf = b
    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  }

  /** Untyped (DataFrame) form, same pattern as [[VectorAggs.vectorMean]]:
    * the sketch comes back as a struct column; the map is its `m` field.
    */
  def misraGries(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MisraGries(k), Encoders.STRING)

  /** Streaming trending tokens: Misra–Gries per event-time window over
    * a (ts, text) document stream, watermarked so window state is
    * bounded. The same Aggregator serves batch and stream — Structured
    * Streaming's state store persists the ≤(k−1)-entry buffer between
    * micro-batches and the UDAF's merge path combines each batch's
    * partials into it, so per-window state is O(k) REGARDLESS of how
    * many micro-batches or tokens the window spans (contrast a
    * groupBy(window, token) count: state per distinct token). Append
    * mode: a window's sketch emits once, when the watermark closes it.
    */
  def trendingTokensStream(docs: DataFrame, k: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.withWatermark("ts", "10 minutes")
      .select(window($"ts", "1 hour").as("w"),
        explode(split($"text", " ")).as("token"))
      .groupBy($"w")
      .agg(misraGries(k)($"token").as("sketch"))
      .select($"w.start".as("window_start"), $"sketch.m".as("top_tokens"))
  }

  // --- Count-Min sketch ---------------------------------------------------

  /** Count-Min buffer: `d` rows × `w` counters, flattened row-major.
    * Primitive long array rides the product encoder for the
    * partition-boundary merge; elementwise ADDITION is the merge rule,
    * so the combined sketch is independent of partition order and
    * estimates are fully deterministic for a given dataset — what keeps
    * the q106 guarantee booleans stable under Spark's scheduling.
    */
  case class CmsBuf(t: Array[Long])

  /** Row-i hash of `x` into [0, w): murmur3 over the string with the
    * row index as seed — the same function the point-query side uses,
    * so build and probe can never drift apart.
    */
  private[ops] def cmsSlot(x: String, row: Int, w: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(x, 0x9747b28c + row)
    java.lang.Math.floorMod(h, w)
  }

  /** Count-Min sketch over a string column (Cormode & Muthukrishnan,
    * J. Algorithms 2005): `d` counter rows of width `w`; an item
    * increments one cell per row; the point estimate is the MIN over
    * its d cells. Guarantees, for n total updates:
    *
    *   - estimate ≥ true count              (deterministic — counters
    *                                         only ever add)
    *   - estimate ≤ true + (e/w)·n          per item w.p. ≥ 1 − e^−d
    *                                         (Markov per row, min over
    *                                         independent rows)
    *
    * Complements the family: MG (q78) answers "which items are heavy"
    * with deterministic bounds but forgets everything below n/k; CMS
    * answers POINT-FREQUENCY queries for ANY item, including ones never
    * stored, at fixed d×w state. Unlike MG's decrement dance the merge
    * is plain elementwise addition — the textbook mergeable summary.
    * Conservative update (raise only to min+1) would tighten constants
    * but breaks mergeability, so the distributed form keeps the
    * classic update.
    *
    * 100 TB posture: map-only pass, O(d·w) state per partition, ONE
    * d×w-long merge per partition boundary — no token shuffle, same
    * economics as q78.
    */
  class CountMin(d: Int, w: Int) extends Aggregator[String, CmsBuf, CmsBuf] {
    require(d >= 1 && w >= 2, s"CountMin needs d >= 1, w >= 2, got d=$d w=$w")

    override def zero: CmsBuf = CmsBuf(new Array[Long](d * w))

    override def reduce(b: CmsBuf, x: String): CmsBuf = {
      if (x == null) return b
      var i = 0
      while (i < d) { b.t(i * w + cmsSlot(x, i, w)) += 1L; i += 1 }
      b
    }

    override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
      var i = 0
      while (i < a.t.length) { a.t(i) += b.t(i); i += 1 }
      a
    }

    override def finish(b: CmsBuf): CmsBuf = b
    override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    override def outputEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  }

  def countMin(d: Int, w: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CountMin(d, w), Encoders.STRING)

  /** Point estimate from a finished table: min over the d row cells. */
  def cmsEstimate(t: Array[Long], x: String, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < d) {
      val c = t(i * w + cmsSlot(x, i, w)); if (c < best) best = c; i += 1
    }
    best
  }

  /** Cross-query BOUNDS CHECK for Count-Min (ORACLED, q106), the
    * q74/q75/q78 contract: the oracle reproduces the EXACT side
    * (token totals over the space-split token space) and asserts the
    * sketch guarantees as booleans. `est ≥ true` is deterministic and
    * must hold for EVERY token; the ε-overcount bound is probabilistic
    * per item, so the assertion is on the VIOLATION RATE — at
    * δ = e^−d per item, the measured rate must stay under 2δ (for a
    * fixed dataset and fixed hash seeds the rate is a constant, so the
    * boolean is stable; the 2× headroom covers the fixture being an
    * adversarially small sample of the 1−δ guarantee).
    *
    * The exact groupBy exists only to VERIFY; the production path is
    * the sketch alone. The probe side queries the ONE finished d×w
    * table (80 KB at 5×2048 — bounded by construction, the PQ-ADC
    * collect trade) against every distinct token via the same
    * [[cmsSlot]] function the build used.
    */
  def q106CmsBounds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = 5; val w = 2048
    val tokens = Sources.documents(spark, dir)
      .select(explode(split($"text", " ")).as("token"))
    val table = tokens.agg(countMin(d, w)($"token").as("sketch"))
      .head().getAs[org.apache.spark.sql.Row](0).getAs[Seq[Long]](0).toArray
    val est = udf { tok: String => cmsEstimate(table, tok, d, w) }
    val exact = tokens.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val n = exact.agg(sum($"cnt").as("n_tokens"))
    val eps = math.E / w
    val delta = math.exp(-d.toDouble)
    exact.withColumn("est", est($"token")).crossJoin(n)
      .agg(
        max($"n_tokens").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        bool_and($"est" >= $"cnt").as("est_ge_true"),
        (count(when($"est" - $"cnt" > lit(eps) * $"n_tokens", lit(1)))
          <= lit(2 * delta) * count(lit(1))).as("overcount_rate_ok"))
  }

  /** Cross-query BOUNDS CHECK for the heavy-hitters sketch (ORACLED,
    * q78), following the q74/q75/q76 pattern: the oracle reproduces the
    * EXACT side (total tokens, number of true heavy hitters over the
    * q24/q46 space-split token space) and asserts the deterministic MG
    * guarantees held as booleans — a sketch regression flips a boolean
    * and hash-fails against DuckDB.
    *
    * The exact groupBy here exists only to VERIFY the sketch; the
    * production path at 100 TB is the sketch alone — a map-only pass
    * shuffling one ≤(k−1)-entry map per partition, no token exchange.
    */
  def q78HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 64
    val tokens = Sources.documents(spark, dir)
      .select(explode(split($"text", " ")).as("token"))
    val sketch = tokens
      .agg(misraGries(k)($"token").as("sketch"))
      .select(explode($"sketch.m").as(Seq("token", "est")))
    val exact = tokens.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val n = exact.agg(sum($"cnt").as("n_tokens"))
    // est ≤ cnt and cnt − est ≤ n/k for every sketch entry; every token
    // with cnt·k > n is present. Left join from exact keeps the heavy
    // tokens the sketch might (incorrectly) have dropped visible.
    val joined = exact.join(sketch, Seq("token"), "left").crossJoin(n)
    joined.agg(
      max($"n_tokens").as("n_tokens"),
      count(when($"cnt" * k > $"n_tokens", lit(1))).as("n_heavy"),
      bool_and(when($"cnt" * k > $"n_tokens", $"est".isNotNull).otherwise(lit(true)))
        .as("all_heavy_present"),
      bool_and(when($"est".isNotNull,
          $"est" <= $"cnt" && ($"cnt" - $"est") * k <= $"n_tokens")
        .otherwise(lit(true))).as("est_within_eps"))
  }
}
