package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming operators — SURVEY.md §2.10 (T1–T6) over `events`.
  *
  * Nothing in the reference is streaming (its closest analogue is the
  * out-of-core IncrementalPCA batching, /root/reference/main.py:279); this
  * family is [N] driver-contract surface.
  *
  * Design: each event-time transform is written once against a plain
  * DataFrame, so the SAME code runs on the static `events` parquet (where
  * it is DuckDB-oracle-checkable, q29/q30) and on `Sources.eventsStream`
  * / MemoryStream inputs (where watermark/late-data semantics are
  * verified by ScalaTest). That is the Structured Streaming contract:
  * batch and stream share one logical plan language.
  *
  * 100 TB posture: tumbling/session windows aggregate with partial
  * map-side combine and shuffle on (window, key); the watermark bounds
  * state. Sums accumulate in DECIMAL for order-independence.
  */
object Streaming {

  /** T1 — tumbling 1-hour windows per event type (works on batch and
    * streaming inputs alike).
    */
  def hourlyTypeAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(
        count(lit(1)).as("n"),
        sum($"value".cast("decimal(14,6)")).cast("double").as("sum_value"))
  }

  /** T2 — sliding windows: 1-hour window advancing every 15 minutes. */
  def slidingTypeAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
  }

  /** T3 — session windows: per-user sessions closed by a 30-minute gap. */
  def sessionAgg(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
  }

  /** T4 — watermarked stream variant of [[hourlyTypeAgg]]: late rows
    * beyond 10 minutes are dropped, state is bounded.
    */
  def hourlyTypeAggStream(events: DataFrame): DataFrame =
    hourlyTypeAgg(events.withWatermark("ts", "10 minutes"))

  /** T5 — streaming exact dedup on event_id within the watermark horizon.
    * MUST be dropDuplicatesWithinWatermark: plain dropDuplicates("event_id")
    * only evicts state when the event-time column is part of the dedup
    * key, so its per-key state would grow unboundedly forever despite
    * the watermark — an OOM at stream scale, not a semantics choice.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** T5 — arbitrary stateful processing: running per-user event counts
    * via flatMapGroupsWithState (update mode, unbounded keys kept —
    * production would add a timeout to bound state).
    */
  def runningUserCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }.toDF("user_id", "n_events")
  }

  /** T6 — stream-static join: enrich events with a broadcastable static
    * dimension on user_id.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim(key), "inner")

  /** STREAMING twin of [[Quality.dedupParagraphs]] — cross-batch
    * paragraph dedup for an incoming `(doc_id, lines)` document
    * stream: state is one marker per distinct line; the FIRST
    * occurrence (min (doc_id, idx) within a batch; arrival order
    * across batches) survives, every later one drops. Emits the
    * surviving line occurrences; per-doc reassembly is the caller's
    * aggregation (the batch arm's exact shape). Matches the batch
    * min-(doc_id, idx) survivor rule whenever ingest order follows
    * doc_id — the [[Quality.q117ShippedCorpusNearDup]] convention;
    * parity asserted in StreamingSpec.
    *
    * State posture: one entry per distinct line, UNBOUNDED over an
    * infinite stream — production bounds it with an event-time timeout
    * horizon (the [[nearDupPairsStream]] pattern) or trades exactness
    * for a Bloom front like [[admissionStreamBloom]]; for bounded
    * backfills (replaying a snapshot through the streaming path) the
    * exact form here is the right tool.
    */
  def paragraphDedupStream(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("docId"),
        posexplode(col("lines")).as(Seq("idx", "line")))
      .as[(Long, Int, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Boolean, (Long, Int, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          if (state.getOption.getOrElse(false)) Iterator.empty
          else {
            val first = rows.minBy(r => (r._1, r._2))
            state.update(true)
            Iterator.single(first)
          }
      }.toDF("doc_id", "idx", "line")
  }

  /** STREAMING CURATION — the q108 decision shape over an incoming
    * `(ts, doc_id, text)` document stream, against STATIC reference
    * state: the duplicated-gram hash set a prior batch q100 pass
    * produced ([[SpanDedup.dupGramHashes]]). This is how the capstone
    * deploys — the reference corpus is curated in batch; each NEW
    * crawl batch is scored as it arrives:
    *
    *   - exact-dup suppression is first-arrival-wins streaming dedup on
    *     `xxhash64(text)` within the watermark horizon
    *     (`dropDuplicatesWithinWatermark` — bounded state, the T5
    *     discipline);
    *   - duplicate-span coverage probes the BROADCAST gram-hash set
    *     with a per-row scalar kernel: the doc's rolling 24-gram
    *     hashes (the very `xxhash64(substr)` values the batch set was
    *     built from — [[gramCoverage]] uses Spark's own XXH64 so the
    *     two sides can never disagree), flagged hits merged into
    *     islands in one linear pass. A per-row kernel rather than an
    *     explode + semi join + windowed re-aggregate: per-doc state
    *     never leaves the row, so the STREAM side needs no stateful
    *     aggregation at all and decisions emit immediately;
    *   - token count + keep rule are the q108 expressions.
    *
    * The stream's only state is the dedup buffer; everything else is a
    * map stage over broadcast state — the same economics at any rate.
    */
  def curationStream(docs: DataFrame, dupGrams: Array[Long],
      gramLen: Int = 24, minTok: Int = 5, maxCoverage: Double = 0.5): DataFrame = {
    import docs.sparkSession.implicits._
    // sorted primitive array + binary search: a boxed Set[Long] costs
    // ~48 B/entry in the broadcast and a hash+unbox per probe; the
    // sorted long array keeps the "dup set broadcasts" claim cheap
    val sorted = dupGrams.clone(); java.util.Arrays.sort(sorted)
    val bSet = docs.sparkSession.sparkContext.broadcast(sorted)
    val cov = udf { text: String =>
      if (text == null) 0L else gramCoverage(text, bSet.value, gramLen)
    }
    val toks = split($"text", " ")
    docs
      .withColumn("th", xxhash64($"text"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("th")
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("dup_chars", cov($"text"))
      .withColumn("dup_coverage",
        Quality.microRatio($"dup_chars", length($"text")))
      .withColumn("keep", $"n_tok" >= minTok && $"dup_coverage" <= maxCoverage)
      .select($"ts", $"doc_id", $"n_tok", $"dup_coverage", $"keep")
  }

  /** STREAMING ADMISSION — [[curationStream]] extended to the full
    * pre-training gate a crawl pipeline runs per incoming document,
    * each signal probing STATIC broadcast state built by a prior batch
    * pass:
    *
    *   - exact-dup suppression + duplicate-span coverage: exactly
    *     [[curationStream]]'s kernels (watermarked first-arrival-wins
    *     dedup; [[gramCoverage]] vs the q100 dup-gram set);
    *   - benchmark DECONTAMINATION (q112's gate, per row): the SAME
    *     [[gramCoverage]] kernel probing the BENCHMARK gram-hash set —
    *     contaminated character mass, islands-merged, no new kernel;
    *   - LM quality (q113's gate, per row): bits-per-transition under
    *     the broadcast [[Quality.CharLm]] — alphabet-bounded model,
    *     so the broadcast is small at ANY reference-corpus size.
    *
    * keep = token floor AND coverage cap AND zero contamination AND
    * bits cap. The stream's only state remains the dedup buffer; all
    * four signals are map-stage probes of broadcast state — decisions
    * emit immediately in append mode, the same economics at any rate.
    *
    * SIZE CAVEAT: the dup-gram array is only "small" on already-clean
    * corpora — on a duplicate-heavy 100 TB crawl use
    * [[admissionStreamBloom]], whose broadcast budget is fixed at
    * construction regardless of corpus duplication. NEAR-DUP gate:
    * compose with [[nearDupPairsStream]]/[[nearDupTextPairsStream]] —
    * first-arrival-wins over its emitted pairs is the batch min-id
    * survivor rule (the q117 capstone's gate) when ingest order
    * follows doc_id.
    */
  def admissionStream(docs: DataFrame, dupGrams: Array[Long],
      benchGrams: Array[Long], lm: Quality.CharLm, gramLen: Int = 24,
      minTok: Int = 5, maxCoverage: Double = 0.5,
      maxBits: Double = 6.0): DataFrame = {
    import docs.sparkSession.implicits._
    val sc = docs.sparkSession.sparkContext
    val sortedDup = dupGrams.clone(); java.util.Arrays.sort(sortedDup)
    val sortedBench = benchGrams.clone(); java.util.Arrays.sort(sortedBench)
    val bDup = sc.broadcast(sortedDup)
    val bBench = sc.broadcast(sortedBench)
    val bLm = sc.broadcast(lm)
    // ONE text pass per row: both gram sets probe the same encoded
    // bytes / gram hashes ([[gramCoverageMulti]]) and the LM walk
    // rides the same UDF call — three separate UDFs would re-encode
    // and re-hash the document per signal on the streaming hot path
    val gates = udf { text: String =>
      if (text == null) (0L, 0L, 0.0)
      else {
        val cov = gramCoverageMulti(text,
          Array(bDup.value, bBench.value), gramLen)
        val bits = BigDecimal(bLm.value.bits(text))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cov(0), cov(1), bits)
      }
    }
    val toks = split($"text", " ")
    docs
      .withColumn("th", xxhash64($"text"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("th")
      .withColumn("g", gates($"text"))
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("dup_coverage",
        Quality.microRatio($"g._1", length($"text")))
      .withColumn("contaminated_chars", $"g._2")
      .withColumn("lm_bits", $"g._3")
      .withColumn("keep",
        $"n_tok" >= minTok && $"dup_coverage" <= maxCoverage &&
          $"contaminated_chars" === 0L && $"lm_bits" <= maxBits)
      .select($"ts", $"doc_id", $"n_tok", $"dup_coverage",
        $"contaminated_chars", $"lm_bits", $"keep")
  }

  /** STREAMING MOORE–LEWIS GATE — the per-row twin of
    * [[Quality.mooreLewisSelect]] (q163): each arriving document is
    * scored under TWO broadcast [[Quality.CharLm]]s — in-domain and
    * general — in ONE UDF call, and admitted when the rounded
    * cross-entropy difference sits below `threshold`. Both models are
    * alphabet-bounded broadcasts (the [[admissionStream]] argument
    * shape, persistable via [[CurationIndex]]); scoring is stateless,
    * so the stream needs no watermark or state store — a pure map over
    * the micro-batch. Bits round at scale 6 HALF_UP exactly as the
    * batch arm rounds `bits_per_transition`, and the diff re-rounds at
    * 6 (the q163 discipline), so stream and batch decisions agree
    * per document (parity asserted on the real fixture in
    * `StreamingSpec`). Documents with fewer than 2 code points carry
    * no transition evidence and are dropped — exactly the rows the
    * batch arm's bigram explode never emits.
    */
  def mooreLewisStream(docs: DataFrame, inLm: Quality.CharLm,
      genLm: Quality.CharLm, threshold: Double = 0.0): DataFrame = {
    import docs.sparkSession.implicits._
    val sc = docs.sparkSession.sparkContext
    val bIn = sc.broadcast(inLm)
    val bGen = sc.broadcast(genLm)
    val gates = udf { text: String =>
      if (text == null || text.codePointCount(0, text.length) < 2) None
      else {
        def r6(x: Double) = BigDecimal(x)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val bi = r6(bIn.value.bits(text))
        val bg = r6(bGen.value.bits(text))
        Some((bi, bg, r6(bi - bg)))
      }
    }
    docs
      .withColumn("g", gates($"text"))
      .filter($"g".isNotNull)
      .select($"doc_id", $"g._1".as("bits_in"), $"g._2".as("bits_gen"),
        $"g._3".as("xent_diff"))
      .withColumn("selected", $"xent_diff" < threshold)
  }

  /** STREAMING UNIFIED GOPHER FILTER — the per-row twin of
    * [[Quality.gopherFullBattery]] (q168's gate unit): the doc-rule
    * battery is [[Quality.withGopherBattery]]'s expression columns
    * (they fuse into the streaming stage unchanged — parity by
    * construction, the admissionStreamV2 argument), and BOTH
    * repetition batteries run in [[Quality.repetitionGates]] — one
    * in-memory kernel per row, since a streamed document arrives
    * WHOLE and every repetition stat is within-document. Stateless:
    * no watermark, no state store, nothing broadcast. Emits the batch
    * arm's exact columns; column-for-column parity asserted on a
    * planted corpus in `StreamingSpec`.
    */
  def gopherFullBatteryStream(docs: DataFrame, minWords: Long = 50L,
      minStop: Long = 2L, maxLineMicro: Long = 300000L,
      maxCharMicro: Long = 200000L): DataFrame = {
    import docs.sparkSession.implicits._
    val gates = udf { text: String =>
      Quality.repetitionGates(if (text == null) "" else text,
        maxLineMicro, maxCharMicro)
    }
    val okCols = (2 to 10).map(n =>
      element_at($"rg._4", n - 1).as(s"ok_n$n"))
    Quality.withGopherBattery(docs, minWords, minStop)
      .withColumn("rg", gates($"text"))
      .select(Seq($"doc_id", $"keep".as("rules_keep"),
        $"rg._1".as("dup_line_micro"), $"rg._2".as("dup_char_micro"),
        $"rg._3".as("lines_keep")) ++ okCols :+
        $"rg._5".as("ngrams_keep"): _*)
      .withColumn("keep", $"rules_keep" && $"lines_keep" && $"ngrams_keep")
  }

  /** STREAMING CCNET BUCKETS — the per-row twin of
    * [[Quality.ccnetBuckets]] (q120): each arriving document is scored
    * under the broadcast [[Quality.CharLm]] and assigned its
    * head/middle/tail bucket against the (c1, c2) micro-unit cutoffs
    * the batch job fit ([[Quality.ccnetCutoffs]], exact or GK arm) —
    * CCNet's deployment shape: cutoffs are fit ONCE on a reference
    * sample, then the crawl streams through the assignment. The model
    * is alphabet-bounded and the cutoffs are two longs, so the whole
    * gate is a stateless map (no watermark, no state store). Bits
    * round at scale 6 HALF_UP, then take the same floor(x·1e6 + 0.5)
    * micro grid as the batch arm — but the kernel sums log-probs
    * sequentially while the batch avg() aggregates in partition order,
    * so bits_micro can differ by ±1 on representational ties: stream
    * and batch buckets agree per document EXCEPT for a doc whose micro
    * score lands exactly on c1/c2 under that 1-micro delta (exactly
    * what `StreamingSpec` asserts — it skips the bucket check for
    * docs sitting on a cutoff). Documents with fewer than 2 code
    * points carry
    * no transition evidence and are dropped — the rows the batch
    * arm's bigram explode never emits.
    */
  def ccnetBucketStream(docs: DataFrame, lm: Quality.CharLm,
      c1: Long, c2: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val bLm = docs.sparkSession.sparkContext.broadcast(lm)
    val micro = udf { text: String =>
      if (text == null || text.codePointCount(0, text.length) < 2) None
      else {
        val r6 = BigDecimal(bLm.value.bits(text))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(math.floor(r6 * 1e6 + 0.5).toLong)
      }
    }
    docs
      .withColumn("bits_micro", micro($"text"))
      .filter($"bits_micro".isNotNull)
      .withColumn("bucket",
        when($"bits_micro" <= c1, "head")
          .when($"bits_micro" <= c2, "middle")
          .otherwise("tail"))
      .select($"doc_id", $"bits_micro", $"bucket")
  }

  /** STREAMING PER-LANGUAGE CCNET BUCKETS — the per-row twin of
    * [[Quality.ccnetBucketsByLang]] (q180), CCNet's actual published
    * deployment (one model and one cutoff pair PER LANGUAGE, Wenzek et
    * al. 2020 §4.2-4.3): each arriving document is scored under ITS
    * language's broadcast [[Quality.CharLm]] and bucketed against that
    * language's (c1, c2), all fit once by the batch job
    * ([[Quality.ccnetLangModels]] — one reference pass for every
    * model, one candidate pass for every cutoff). State is
    * #languages × (alphabet-bounded model + two longs) in ONE
    * broadcast — stateless map, no watermark, no state store.
    * Documents whose language has no fitted model are DROPPED, the
    * batch arm's inner-vocabulary-join semantics; sub-2-code-point
    * documents are dropped as carrying no transition evidence. Same
    * ±1-micro boundary caveat as [[ccnetBucketStream]]: the kernel's
    * sequential log-prob sum vs the batch avg() can differ on the last
    * micro unit, so parity at a doc sitting exactly on its language's
    * cutoff is bucket-approximate (the spec skips those docs' bucket
    * assertion).
    */
  def ccnetBucketStreamByLang(docs: DataFrame,
      models: Map[String, (Quality.CharLm, Long, Long)]): DataFrame = {
    import docs.sparkSession.implicits._
    val bm = docs.sparkSession.sparkContext.broadcast(models)
    val micro = udf { (lang: String, text: String) =>
      bm.value.get(lang) match {
        case Some((lm, _, _)) if text != null &&
            text.codePointCount(0, text.length) >= 2 =>
          val r6 = BigDecimal(lm.bits(text))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some(math.floor(r6 * 1e6 + 0.5).toLong)
        case _ => None
      }
    }
    val bucketOf = udf { (lang: String, bitsMicro: Long) =>
      val (_, c1, c2) = bm.value(lang)
      if (bitsMicro <= c1) "head"
      else if (bitsMicro <= c2) "middle"
      else "tail"
    }
    docs
      .withColumn("bits_micro", micro($"lang", $"text"))
      .filter($"bits_micro".isNotNull)
      .withColumn("bucket", bucketOf($"lang", $"bits_micro"))
      .select($"doc_id", $"lang", $"bits_micro", $"bucket")
  }

  /** STREAMING SOFT-DEDUP REWEIGHTING — the per-row twin of
    * [[Similarity.softDedupWeights]] (q162): each arriving document is
    * assigned its 1/|cluster| micro-weight and deterministic Bernoulli
    * membership by probing CLUSTER STATE from the periodic batch CC
    * fit — the deployment shape where clustering runs offline and the
    * ingest stream re-weights live.
    *
    * `clusterState` is a STATIC frame (doc_id, cluster_id,
    * cluster_size) — [[Similarity.softDedupWeights]]' own output
    * columns, or any CC output joined to its sizes. The probe is a
    * stream-static LEFT join, NOT a broadcast UDF: cluster state is
    * |clustered docs|-bounded — corpus-sized on a high-duplication
    * crawl — so forcing it into a broadcast would OOM exactly when
    * dedup matters most (the [[Similarity.keepSurvivors]] rule); AQE
    * broadcasts the state per micro-batch when it is actually small.
    * Docs absent from the state are singleton clusters of themselves
    * (weight 1.0), exactly the batch arm's left-join semantics.
    *
    * Everything downstream of the join is the batch algebra VERBATIM
    * (integer micro-weights, md5 Bernoulli membership — deterministic
    * expressions, so the stream needs no watermark or state store),
    * giving stream == batch parity by construction; asserted on the
    * real fixture in `StreamingSpec`.
    */
  def softDedupStream(docs: DataFrame, clusterState: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val u = conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long")
    docs
      .select($"doc_id",
        graft.ops.Packing.bpeishCount($"text").cast("long").as("n_tokens"))
      .join(clusterState.select($"doc_id", $"cluster_id", $"cluster_size"),
        Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce($"cluster_id", $"doc_id"))
      .withColumn("cluster_size", coalesce($"cluster_size", lit(1L)))
      .withColumn("weight_micro", expr("1000000 div cluster_size"))
      .withColumn("eff_tokens_micro", $"n_tokens" * $"weight_micro")
      .withColumn("sampled",
        u * lit(1000000L) < $"weight_micro" * lit(4294967296L))
      .select($"doc_id", $"cluster_id", $"cluster_size", $"weight_micro",
        $"n_tokens", $"eff_tokens_micro", $"sampled")
  }

  /** STREAMING PERCEPTUAL IMAGE DEDUP (T5 + L58) — the newest dedup
    * family's ingest twin, completing its batch/stream symmetry: each
    * micro-batch of arriving images probes the FROZEN phash survivor
    * index ([[CurationIndex.loadPhash]]) by running the BATCH delta arm
    * [[Images.perceptualDedupDelta]] VERBATIM inside `foreachBatch` —
    * index hits adopt their indexed cluster, misses cluster among
    * themselves within the batch (df-capped band join), exactly the
    * batch semantics, so stream == batch parity holds by construction
    * per micro-batch (asserted in `StreamingSpec`).
    *
    * foreachBatch rather than a stateful operator is the deliberate
    * choice here (vs [[nearDupPairsStream]]'s fMGWS): the delta arm's
    * miss SELF-JOIN and min-id adoption are whole-batch relational
    * algebra, and Structured Streaming's contract for reusing exactly
    * such batch logic is the foreachBatch sink. The cost: new-new
    * chains ACROSS micro-batches inherit the delta arm's documented
    * asymmetry (reconciled by the periodic full re-cluster) — same
    * trade as running the delta arm on daily batches, just smaller
    * batches. `sink` receives each micro-batch's resolved frame (e.g.
    * append to the survivor store and [[CurationIndex.writePhash]] the
    * new survivors — kept a callback so tests and deployments choose);
    * it must CONSUME the frame before returning — its checkpoint
    * blocks are released as soon as the callback exits.
    *
    * 100 TB posture: per micro-batch it is exactly the delta arm's —
    * probe bands against the survivor index (no re-hash of the
    * accumulated corpus), df-capped miss self-join, CC over matched
    * pairs only.
    */
  def perceptualDedupStream(imgs: DataFrame, index: DataFrame,
      sink: DataFrame => Unit, maxHamming: Int = 3,
      bandDfCap: Int = 1000): org.apache.spark.sql.streaming.StreamingQuery =
    imgs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val out = Images.perceptualDedupDelta(batch, index,
            maxHamming = maxHamming, bandDfCap = bandDfCap)
          // the delta arm returns an eagerly localCheckpoint'd frame;
          // release its pinned RDD blocks once the sink has consumed it
          // — a long-lived ingest stream would otherwise accumulate one
          // checkpoint per micro-batch until the ContextCleaner gets to
          // them (the GraftColumns.checkpointRdd rationale)
          try sink(out)
          finally org.apache.spark.sql.graftshim.GraftColumns
            .checkpointRdd(out).foreach(_.unpersist(false))
        }
      }
      .start()

  /** STREAMING DELTA DEDUP — the ingest twin of
    * [[CurationIndex.dedupDeltaAgainstIndex]] (q206): arriving
    * micro-batches of documents are answered against the STATIC
    * persisted shingle index through the UNCHANGED batch op — parity
    * by construction, the build-once/gate-forever deployment (the
    * corpus-side fit cannot stream: df caps and the hot profile need
    * the accumulated corpus). foreachBatch because the manifest is
    * whole-batch relational algebra (shingle explode → posting join →
    * per-doc argmax window), the [[perceptualDedupStream]] contract;
    * the delta arm returns an eagerly localCheckpoint'd frame, so its
    * blocks release once the sink has consumed it — a long-lived
    * ingest stream must not accumulate one checkpoint per batch.
    */
  def dedupDeltaStream(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, docs: DataFrame, sink: DataFrame => Unit,
      minJaccard: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val out = CurationIndex.dedupDeltaAgainstIndex(spark, indexPath,
            batch.select(col("doc_id"), col("text")), minJaccard)
          try sink(out)
          finally org.apache.spark.sql.graftshim.GraftColumns
            .checkpointRdd(out).foreach(_.unpersist(false))
        }
      }
      .start()

  /** STREAMING SITE-BOILERPLATE REMOVAL — the ingest twin of
    * [[Quality.siteBoilerplateClean]] (q184), in the fit-offline /
    * apply-on-ingest shape: a periodic batch job fits the (source,
    * line) boilerplate set ([[Quality.siteBoilerplateSet]] — df
    * thresholds need the accumulated corpus, so the FIT cannot
    * stream), and each arriving micro-batch of whole documents is
    * cleaned against that static state via the UNCHANGED batch apply
    * ([[Quality.removeBoilerplateLines]] — parity by construction).
    * foreachBatch because the apply is whole-batch relational algebra
    * (explode → keyed anti join → per-doc reassembly), the
    * [[perceptualDedupStream]] contract; the boilerplate set is
    * corpus-scale on a template-heavy crawl, so it stays a joinable
    * frame, never a forced broadcast (the keepSurvivors rule).
    */
  def siteBoilerplateStream(docs: DataFrame, boilerplate: DataFrame,
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(Quality.removeBoilerplateLines(
            batch.select(col("doc_id"), col("source"), col("lines")),
            boilerplate))
      }
      .start()

  /** STREAMING BM25 QUERY SERVING — the search-serving twin of
    * [[Similarity.bm25TopKFrom]] (q187/q188): query batches arrive as
    * a stream and each micro-batch is scored against the STATIC
    * persisted index ([[CurationIndex.loadBm25]]) through the
    * UNCHANGED batch scorer — parity by construction, the
    * build-once/serve-forever deployment. foreachBatch because top-k
    * needs a per-query window over the batch's full candidate set
    * (the [[perceptualDedupStream]] contract for whole-batch
    * relational algebra); the index is corpus-sized and stays a
    * joinable frame, never a forced broadcast (the keepSurvivors
    * rule — only the batch's own query TERMS broadcast).
    */
  def bm25QueryStream(queries: DataFrame, tf: DataFrame,
      sink: DataFrame => Unit, k: Int = 5,
      dfCap: Long = Long.MaxValue): org.apache.spark.sql.streaming.StreamingQuery =
    queries.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(Similarity.bm25TopKFrom(tf,
            batch.select(col("query_id"), col("text")), k = k,
            dfCap = dfCap))
      }
      .start()

  /** STREAMING URL CURATION (T5 + L62) — q177's ingest twin: arriving
    * `(doc_id, url, ts)` rows canonicalize and blocklist-gate through
    * the EXACT batch expressions ([[Text.canonicalizeUrl]]/
    * [[Text.urlBlocked]] — stateless maps, parity by construction),
    * and URL-dedup becomes first-arrival-wins on the canonical string
    * within the watermark horizon (`dropDuplicatesWithinWatermark`,
    * the [[dedupStream]] state posture: one marker per distinct
    * canonical URL inside the horizon, evicted by event time — the
    * crawl-frontier "have we fetched this URL recently" shape). Emits
    * only surviving, unblocked rows — the fetch/keep frontier.
    */
  def urlCurationStream(urls: DataFrame, blocklist: Seq[String],
      delay: String = "10 minutes"): DataFrame = {
    import urls.sparkSession.implicits._
    urls
      .withColumn("canonical_url", Text.canonicalizeUrl($"url"))
      .filter(!Text.urlBlocked($"canonical_url", blocklist))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("canonical_url")
      .select($"ts", $"doc_id", $"canonical_url")
  }

  /** STREAMING ADMISSION v2 — the streaming twin of the q125 batch
    * capstone: [[admissionStream]]'s four gates PLUS the Gopher
    * structural battery and the DSIR importance-weight floor, every
    * new signal still a per-row probe of broadcast state:
    *
    *   - Gopher battery ([[Quality.withGopherBattery]]): expression-only
    *     map work — it fuses into the streaming stage with NO state at
    *     all, the same Columns the batch arm runs, so parity is by
    *     construction;
    *   - DSIR gate ([[Quality.DsirModel]]): the per-bucket log-ratio
    *     table is `buckets` doubles (2 KB at 256) — broadcast-bounded
    *     at any corpus size by the [[Quality.CharLm]] argument; the
    *     kernel mirrors the batch algebra (parity at 1e-6, the
    *     rounding-absorbed fp-order freedom).
    *
    * keep = token floor ∧ coverage cap ∧ zero contamination ∧ bits cap
    * ∧ gopher_keep ∧ log_weight ≥ `minLogWeight` — the q125 conjunction
    * with [[curationStream]]'s coverage cap retained (the stream's
    * structural analog of q125's batch survivorship gate). The
    * dup-gram SIZE CAVEAT and the Bloom escape hatch are
    * [[admissionStream]]'s, unchanged.
    */
  def admissionStreamV2(docs: DataFrame, dupGrams: Array[Long],
      benchGrams: Array[Long], lm: Quality.CharLm,
      dsir: Quality.DsirModel, gramLen: Int = 24, minTok: Int = 5,
      maxCoverage: Double = 0.5, maxBits: Double = 6.0,
      minWords: Long = 30L, minStop: Long = 1L,
      minLogWeight: Double = -8.0): DataFrame = {
    import docs.sparkSession.implicits._
    admissionCore(docs, dupGrams, benchGrams, lm, dsir, gramLen, minTok,
        maxCoverage, maxBits, minWords, minStop, minLogWeight)
      .withColumnRenamed("base_keep", "keep")
      .select($"ts", $"doc_id", $"n_tok", $"dup_coverage",
        $"contaminated_chars", $"lm_bits", $"gopher_keep",
        $"log_weight", $"dsir_ok", $"keep")
  }

  /** STREAMING ADMISSION v3 — the q168 capstone's streaming twin:
    * [[admissionStreamV2]]'s gates PLUS the two repetition batteries
    * of the UNIFIED Gopher filter ([[Quality.repetitionGates]], the
    * [[gopherFullBatteryStream]] kernel — per-row bounded work since a
    * streamed document arrives whole). keep = v2's conjunction ∧
    * lines_keep ∧ ngrams_keep, exactly how q168 upgrades q125. No new
    * state: the kernel is a second stateless map over the same rows.
    */
  def admissionStreamV3(docs: DataFrame, dupGrams: Array[Long],
      benchGrams: Array[Long], lm: Quality.CharLm,
      dsir: Quality.DsirModel, gramLen: Int = 24, minTok: Int = 5,
      maxCoverage: Double = 0.5, maxBits: Double = 6.0,
      minWords: Long = 30L, minStop: Long = 1L,
      minLogWeight: Double = -8.0, maxLineMicro: Long = 300000L,
      maxCharMicro: Long = 200000L): DataFrame = {
    import docs.sparkSession.implicits._
    val rep = udf { text: String =>
      Quality.repetitionGates(if (text == null) "" else text,
        maxLineMicro, maxCharMicro)
    }
    admissionCore(docs, dupGrams, benchGrams, lm, dsir, gramLen, minTok,
        maxCoverage, maxBits, minWords, minStop, minLogWeight)
      .withColumn("rg", rep($"text"))
      .withColumn("lines_keep", $"rg._3")
      .withColumn("ngrams_keep", $"rg._5")
      .withColumn("keep", $"base_keep" && $"lines_keep" && $"ngrams_keep")
      .select($"ts", $"doc_id", $"n_tok", $"dup_coverage",
        $"contaminated_chars", $"lm_bits", $"gopher_keep",
        $"lines_keep", $"ngrams_keep", $"log_weight", $"dsir_ok", $"keep")
  }

  /** The shared V2/V3 admission pipeline up to (but not including)
    * each arm's final keep/column shape; emits `base_keep` (the v2
    * conjunction) and retains `text` for arm-specific kernels.
    */
  private def admissionCore(docs: DataFrame, dupGrams: Array[Long],
      benchGrams: Array[Long], lm: Quality.CharLm,
      dsir: Quality.DsirModel, gramLen: Int, minTok: Int,
      maxCoverage: Double, maxBits: Double,
      minWords: Long, minStop: Long, minLogWeight: Double): DataFrame = {
    import docs.sparkSession.implicits._
    val sc = docs.sparkSession.sparkContext
    val sortedDup = dupGrams.clone(); java.util.Arrays.sort(sortedDup)
    val sortedBench = benchGrams.clone(); java.util.Arrays.sort(sortedBench)
    val bDup = sc.broadcast(sortedDup)
    val bBench = sc.broadcast(sortedBench)
    val bLm = sc.broadcast(lm)
    val bDsir = sc.broadcast(dsir)
    // ONE text pass per row for the stateful gates (the admissionStream
    // economics); the DSIR walk rides the same UDF call
    val gates = udf { text: String =>
      if (text == null) (0L, 0L, 0.0, 0L, 0.0)
      else {
        val cov = gramCoverageMulti(text,
          Array(bDup.value, bBench.value), gramLen)
        val bits = BigDecimal(bLm.value.bits(text))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (nGrams, lw) = bDsir.value.logWeight(text)
        (cov(0), cov(1), bits, nGrams, lw)
      }
    }
    val toks = split($"text", " ")
    Quality.withGopherBattery(
        docs
          .withColumn("th", xxhash64($"text"))
          .withWatermark("ts", "10 minutes")
          .dropDuplicatesWithinWatermark("th"),
        minWords, minStop)
      .withColumnRenamed("keep", "gopher_keep")
      .withColumn("g", gates($"text"))
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("dup_coverage",
        Quality.microRatio($"g._1", length($"text")))
      .withColumn("contaminated_chars", $"g._2")
      .withColumn("lm_bits", $"g._3")
      .withColumn("log_weight", $"g._5")
      .withColumn("dsir_ok", $"log_weight" >= minLogWeight)
      .withColumn("base_keep",
        $"n_tok" >= minTok && $"dup_coverage" <= maxCoverage &&
          $"contaminated_chars" === 0L && $"lm_bits" <= maxBits &&
          $"gopher_keep" && $"dsir_ok")
  }

  /** [[admissionStream]] with a BOUNDED-MEMORY duplicate-gram gate —
    * the 100 TB-safe streaming arm. The exact variant broadcasts the
    * dup-gram set as a sorted long array, which is only "small" on
    * already-clean corpora: a duplicate-heavy 100 TB crawl can push
    * the dup set to billions of grams (8 B each — tens of GB, an
    * unbroadcastable driver OOM exactly when dedup matters most).
    * Here the dup set is a Spark `BloomFilter` whose size the CALLER
    * FIXES AT CONSTRUCTION: ~1.44·log₂(1/fpp) bits per gram (≈1.2 B at
    * 1% fpp, 6.7× smaller than exact; ≈0.9 B at 3%), and — the real
    * bound — `expectedNumItems`·that is set up front, so the broadcast
    * budget is a configuration constant, independent of how duplicated
    * the corpus turns out to be. Build it DISTRIBUTEDLY with
    * [[SpanDedup.dupGramBloom]]: the gram hashes never collect to the
    * driver at all.
    *
    * Decision semantics vs the exact arm (no false negatives in the
    * Bloom ⟹ Bloom coverage ≥ exact coverage, the island merge is
    * monotone in the hit set):
    *
    *   - `dup_coverage` ≤ `maxCoverage`: the coverage gate's PASS is
    *     EXACT — an upper bound under the cap puts the true coverage
    *     under the cap, so `keep` is bit-identical to the exact arm's.
    *   - `dup_coverage` > `maxCoverage` while every OTHER gate passes:
    *     the true coverage may still be under the cap (false-positive
    *     grams inflated it) — the row is emitted with `keep = false`
    *     and `dup_recheck = true`, the SMALL (fpp-bounded + true-dup)
    *     set to re-verify against the exact batch kernel
    *     ([[SpanDedup.dupSpans]] / [[gramCoverage]]) before final
    *     discard. Rows failing another gate are final regardless of
    *     coverage precision (`dup_recheck = false`): they are dropped
    *     either way.
    *
    * So stream decisions match batch decisions everywhere except the
    * explicitly-flagged recheck rows, whose exact resolution restores
    * full parity — asserted on an adversarially duplicated corpus in
    * StreamingSpec. Bench/LM state remains exact (the benchmark gram
    * set is broadcast-sized BY DEFINITION, the LM alphabet-bounded —
    * neither needs the approximation).
    */
  def admissionStreamBloom(docs: DataFrame,
      dupBloom: org.apache.spark.util.sketch.BloomFilter,
      benchGrams: Array[Long], lm: Quality.CharLm, gramLen: Int = 24,
      minTok: Int = 5, maxCoverage: Double = 0.5,
      maxBits: Double = 6.0): DataFrame = {
    import docs.sparkSession.implicits._
    val sc = docs.sparkSession.sparkContext
    val sortedBench = benchGrams.clone(); java.util.Arrays.sort(sortedBench)
    val bDup = sc.broadcast(dupBloom)
    val bBench = sc.broadcast(sortedBench)
    val bLm = sc.broadcast(lm)
    val gates = udf { text: String =>
      if (text == null) (0L, 0L, 0.0)
      else {
        val cov = gramCoverageProbes(text,
          Array[GramProbe](new BloomProbe(bDup.value),
            new SortedArrayProbe(bBench.value)), gramLen)
        val bits = BigDecimal(bLm.value.bits(text))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (cov(0), cov(1), bits)
      }
    }
    val toks = split($"text", " ")
    docs
      .withColumn("th", xxhash64($"text"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("th")
      .withColumn("g", gates($"text"))
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("dup_coverage",
        Quality.microRatio($"g._1", length($"text")))
      .withColumn("contaminated_chars", $"g._2")
      .withColumn("lm_bits", $"g._3")
      .withColumn("others_pass",
        $"n_tok" >= minTok && $"contaminated_chars" === 0L &&
          $"lm_bits" <= maxBits)
      .withColumn("keep", $"others_pass" && $"dup_coverage" <= maxCoverage)
      .withColumn("dup_recheck",
        $"others_pass" && $"dup_coverage" > maxCoverage)
      .select($"ts", $"doc_id", $"n_tok", $"dup_coverage",
        $"contaminated_chars", $"lm_bits", $"keep", $"dup_recheck")
  }

  /** Characters of `text` covered by length-`gramLen` grams whose
    * xxhash64 (seed 42 over UTF-8 bytes — bit-identical to Spark's
    * `xxhash64(substr(...))`, asserted in StreamingSpec) is in the
    * SORTED `dupGrams` array; overlapping/adjacent hits merge into
    * islands before counting, matching [[SpanDedup.dupSpans]]'s span
    * semantics. ZERO-COPY per position: the document is UTF-8-encoded
    * once and each gram hashes a byte-range view — positions and gram
    * boundaries are CODE-POINT indexed (substr semantics, any text),
    * with a per-code-point byte-offset table derived from the encoded
    * bytes themselves (two cheap scans; see the in-body note on why
    * walking the String instead would desync on unpaired surrogates).
    */
  private[graft] def gramCoverage(text: String, dupGrams: Array[Long],
      gramLen: Int): Long =
    gramCoverageMulti(text, Array(dupGrams), gramLen)(0)

  /** Membership probe a gram hash is tested against — the small
    * abstraction that lets one island-merge kernel serve both the
    * EXACT sorted-array gate and the BOUNDED-MEMORY Bloom gate.
    * Sealed with exactly two final implementations so the per-gram
    * call site stays bimorphic (JIT-inlinable) on the streaming hot
    * path.
    */
  private[graft] sealed trait GramProbe extends Serializable {
    def contains(h: Long): Boolean
  }

  /** Exact membership: binary search over a sorted long array. */
  private[graft] final class SortedArrayProbe(arr: Array[Long])
      extends GramProbe {
    def contains(h: Long): Boolean =
      java.util.Arrays.binarySearch(arr, h) >= 0
  }

  /** Approximate membership with NO false negatives: a Spark
    * `BloomFilter` (public sketch API). `contains` may return true for
    * a gram not in the set (rate = the filter's configured fpp), never
    * false for one that is — so a coverage computed through it is an
    * UPPER BOUND on the exact coverage.
    */
  private[graft] final class BloomProbe(
      bf: org.apache.spark.util.sketch.BloomFilter) extends GramProbe {
    def contains(h: Long): Boolean = bf.mightContainLong(h)
  }

  /** [[gramCoverage]] against SEVERAL hash sets in one pass: the text
    * is UTF-8-encoded once, the offset table built once, and each
    * gram hashed ONCE, with one binary-search probe and one island
    * cursor per set — what lets [[admissionStream]] score the dup set
    * and the benchmark set per row without reprocessing the document
    * twice. Returns one covered-character count per set, in order.
    */
  private[graft] def gramCoverageMulti(text: String, sets: Array[Array[Long]],
      gramLen: Int): Array[Long] =
    gramCoverageProbes(text,
      sets.map(new SortedArrayProbe(_): GramProbe), gramLen)

  /** The kernel itself, over abstract [[GramProbe]]s — the island
    * merge, offset table, and single-hash-per-gram mechanics of
    * [[gramCoverageMulti]]'s scaladoc, shared by the exact and Bloom
    * admission gates.
    */
  private[graft] def gramCoverageProbes(text: String, sets: Array[GramProbe],
      gramLen: Int): Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val k = sets.length
    val covered = new Array[Long](k)
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // Per-code-point byte offsets derived FROM the encoded bytes (lead
    // bytes are the non-continuation ones): offsets can never run past
    // the array, even for malformed input — walking the STRING by
    // codePointAt counts an unpaired surrogate as 3 bytes while
    // getBytes encodes it as '?' (1 byte), which would desync the
    // offsets and read past the buffer through the unsafe hash.
    var nCp = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xC0) != 0x80) nCp += 1
      bi += 1
    }
    if (nCp < gramLen) return covered
    val byteOff = new Array[Int](nCp + 1)
    var cp = 0; bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xC0) != 0x80) { byteOff(cp) = bi; cp += 1 }
      bi += 1
    }
    byteOff(nCp) = bytes.length
    val base = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
    val curStart = Array.fill(k)(-1)
    val curEnd = Array.fill(k)(-1)
    var p = 0
    while (p + gramLen <= nCp) {
      val off = byteOff(p)
      val h = XXH64.hashUnsafeBytes(bytes, base + off,
        byteOff(p + gramLen) - off, 42L)
      var si = 0
      while (si < k) {
        if (sets(si).contains(h)) {
          val en = p + gramLen - 1
          if (curStart(si) < 0) { curStart(si) = p; curEnd(si) = en }
          else if (p <= curEnd(si) + 1) {
            curEnd(si) = math.max(curEnd(si), en)
          } else {
            covered(si) += curEnd(si) - curStart(si) + 1
            curStart(si) = p; curEnd(si) = en
          }
        }
        si += 1
      }
      p += 1
    }
    var si = 0
    while (si < k) {
      if (curStart(si) >= 0) covered(si) += curEnd(si) - curStart(si) + 1
      si += 1
    }
    covered
  }

  /** J7 (streaming variant, SURVEY §2.3) — stream-stream interval join:
    * each click matches the same user's views within
    * `[click_ts − lookback, click_ts]`, watermarked on BOTH sides.
    *
    * State posture: the interval condition plus the two watermarks give
    * Spark a state watermark for each side — buffered views older than
    * `watermark` and clicks that can no longer match are evicted, so
    * join state is bounded by (rate × (delay + lookback)), not by the
    * stream length. Inner matches emit immediately (append mode).
    */
  def clickViewIntervalJoin(clicks: DataFrame, views: DataFrame,
      lookback: String = "10 minutes", delay: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.select(
        col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val v = views.select(
        col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
      .withWatermark("view_ts", delay)
    // joinType "left_outer" emits unmatched clicks null-padded once
    // both watermarks close their match window (outer results cannot
    // emit earlier — a matching view might still arrive)
    c.join(v,
        c("user_id") === v("v_user_id") &&
        v("view_ts") >= c("click_ts") - expr(s"INTERVAL $lookback") &&
        v("view_ts") <= c("click_ts"),
        joinType)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("view_id"), col("view_ts"), col("view_value"))
  }

  /** J7-streaming batch-oracle query — the SAME [[clickViewIntervalJoin]]
    * code on the static events table (`withWatermark` is a no-op in
    * batch), so the interval-join semantics the streaming tests pin are
    * ALSO hash-checked against a plain SQL join oracle. Timestamps
    * emitted as epoch µs.
    */
  def q44IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Sources.events(spark, dir)
    val out = clickViewIntervalJoin(
      ev.filter($"event_type" === "click"),
      ev.filter($"event_type" === "view"))
    out.select(
        $"click_id", $"user_id",
        unix_micros($"click_ts").as("click_ts_us"),
        $"view_id",
        unix_micros($"view_ts").as("view_ts_us"),
        round($"view_value", 6).as("view_value"))
      .orderBy($"click_id", $"view_id")
  }

  /** T1 batch-oracle query — hourly tumbling windows on the static
    * events table, window start emitted as epoch µs so the DuckDB
    * time_bucket oracle compares exactly.
    */
  def q29TimeWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hourlyTypeAgg(Sources.events(spark, dir))
      .select(
        unix_micros($"window.start").as("hour_start_us"),
        $"event_type", $"n", round($"sum_value", 6).as("sum_value"))
      .orderBy($"hour_start_us", $"event_type")
  }

  /** T2 batch-oracle query — sliding 1-hour windows advancing every 15
    * minutes: each event lands in 4 windows. The oracle reproduces the
    * window assignment by generating the 4 candidate starts per event.
    */
  def q41Sliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    slidingTypeAgg(Sources.events(spark, dir))
      .select(
        unix_micros($"window.start").as("win_start_us"),
        $"event_type", $"n")
      .orderBy($"win_start_us", $"event_type")
  }

  /** T3 batch-oracle query — per-user 30-minute-gap sessions on the
    * static events table; the oracle reproduces session semantics with a
    * gaps-and-islands window SQL. Emits session start/end as epoch µs.
    */
  def q30Session(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.events(spark, dir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(14,6)")).cast("double").as("sum_value"))
      .select(
        $"user_id",
        unix_micros($"session_window.start").as("sess_start_us"),
        $"n_events", round($"sum_value", 6).as("sum_value"))
      .orderBy($"user_id", $"sess_start_us")
  }

  /** T4 batch-oracle core — the watermark late-data ACCEPTANCE rule,
    * replayed relationally over an explicit arrival assignment
    * `arr(event_id, ts_us, arrival_us)`. Micro-batch b =
    * (arrival_us − min arrival) div `batchSpanUs` (micro-batch = a
    * wall-clock interval of arrivals); per batch the watermark is the
    * EXACT rule Spark's MicroBatchExecution applies, pinned by
    * MemoryStream probe (StreamingSpec) at the edges:
    *
    *   watermark_us(b) = (floor(max_{b' < b}(ts_us) / 1000) − delayMs) · 1000
    *   accepted  ⇔  no prior batch  ∨  ts_us > watermark_us   (STRICT)
    *
    * i.e. the batch max is truncated to MILLISECONDS before the delay
    * subtraction (EventTimeStats tracks ms), but the late-row compare
    * is at full MICROSECOND precision and a row exactly AT the
    * watermark is DROPPED — both edges probe-verified, both the kind
    * of boundary a re-implementation silently gets wrong.
    *
    * Shape: one per-batch max aggregate, one running max over the
    * BATCH table (bounded: arrival span / batchSpan rows — the window
    * sort never sees event rows), one broadcast join back. Scales.
    */
  def watermarkAcceptanceFromArrival(arr: DataFrame, delayMs: Long,
      batchSpanUs: Long): DataFrame = {
    import arr.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val a0 = arr.agg(min($"arrival_us").as("a0"))
    val withBatch = arr.crossJoin(broadcast(a0))
      .withColumn("batch_id",
        expr(s"(arrival_us - a0) div ${batchSpanUs}L"))
    val wm = withBatch.groupBy($"batch_id").agg(max($"ts_us").as("b_max"))
      .withColumn("prior_max", max($"b_max").over(
        Window.orderBy($"batch_id")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select($"batch_id",
        when($"prior_max".isNotNull,
          (expr("prior_max div 1000") - delayMs) * 1000).as("watermark_us"))
    withBatch.join(broadcast(wm), Seq("batch_id"))
      .withColumn("accepted",
        $"watermark_us".isNull || $"ts_us" > $"watermark_us")
      .select($"event_id", $"batch_id", $"ts_us", $"watermark_us",
        $"accepted")
  }

  /** [[watermarkAcceptanceFromArrival]] with a realistic deterministic
    * arrival: event time plus a content-keyed jitter (the q93
    * md5-derived cross-engine hash), so most rows arrive near-in-order
    * and a tail arrives up to `jitterUs` late — the operational
    * question this audits is "at this watermark delay, which events
    * would the pipeline have dropped, and what delay keeps the loss
    * acceptable".
    */
  def watermarkAcceptanceAudit(events: DataFrame, delayMs: Long,
      batchSpanUs: Long, jitterUs: Long): DataFrame = {
    import events.sparkSession.implicits._
    val jitter = conv(substring(md5($"event_id".cast("string")), 1, 8),
      16, 10).cast("long") % (2L * jitterUs) - jitterUs
    watermarkAcceptanceFromArrival(
      events.select($"event_id", unix_micros($"ts").as("ts_us"))
        .withColumn("arrival_us", $"ts_us" + jitter),
      delayMs, batchSpanUs)
  }

  /** ORACLED exercise (q200): the T4 watermark acceptance rule over
    * the events fixture — 10-minute delay, 1-hour micro-batches,
    * ±30-minute arrival jitter — every batch id, per-batch watermark,
    * and per-event accept/drop verdict re-derived by DuckDB through
    * the identical md5 arrival, div-truncation, and strict-compare
    * algebra. Closes the session/watermark family's last test-only
    * edge: T1–T3 had batch oracles (q29/q41/q30); the late-data
    * acceptance boundary now has one too, with the streaming parity
    * side pinned by the MemoryStream arm in StreamingSpec.
    */
  def q200WatermarkAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    watermarkAcceptanceAudit(Sources.events(spark, dir),
        delayMs = 600000L, batchSpanUs = 3600L * 1000000L,
        jitterUs = 1800L * 1000000L)
      .orderBy($"event_id")
  }

  /** T3/T4 batch-oracle core — SESSION-WINDOW acceptance, merge, and
    * emission under a watermark, replayed relationally over an
    * explicit arrival assignment `arr(event_id, user_id, ts_us,
    * arrival_us)`. Three rules, each pinned by MemoryStream probe
    * (`StreamingSpec`), each a boundary a re-implementation silently
    * gets wrong:
    *
    *   1. ACCEPTANCE is END-based and STRICT — a late row survives iff
    *      `ts_us + gap > watermark_us(b)` (the row's initial
    *      [ts, ts+gap) window must still be open; a window ending
    *      exactly AT the watermark is dropped). This differs from the
    *      raw-row rule q200 audits (`ts > wm`): session state is keyed
    *      by windows, so rows up to `gap` OLDER than the watermark are
    *      still accepted.
    *   2. MERGE is gap-chaining with a half-open window: consecutive
    *      accepted events of one key belong to one session iff their
    *      gap is STRICTLY under `gap` (an event exactly `gap` after
    *      the previous one starts a new session — the q30 batch rule).
    *   3. EMISSION is NON-strict: a session (end = last ts + gap) is
    *      emitted by the first batch whose post-batch watermark
    *      reaches `end` (`end <= wm`); sessions the final watermark
    *      never reaches are still in state at shutdown (`emitted` =
    *      false).
    *
    * REPLAY EXACTNESS: the island model above equals the streaming
    * result for every session containing no STALE event (stale =
    * accepted with `ts_us <= watermark_us` — possible only because
    * rule 1 is end-based). A stale event CAN land inside a session the
    * stream already emitted, and the stream then opens a fresh
    * overlapping session (probe-pinned) where the island model merges
    * — `sess_exact` flags exactly the sessions where that divergence
    * is possible, so the per-session claim stays honest. Stale-free ⇒
    * exact: emission by batch b−1 needs `end <= wm(b)`, so any
    * non-stale accepted event (`ts > wm(b)`) lies strictly past every
    * previously-emitted end and can never have merged with it.
    *
    * Shape: the q200 scaffolding (per-batch max, bounded running-max
    * window, broadcast join back) plus one per-key island window and
    * one per-session aggregate — the only event-wide shuffle classes
    * are the per-key window and the session groupBy. Scales.
    */
  def sessionAcceptanceFromArrival(arr: DataFrame, gapMs: Long,
      delayMs: Long, batchSpanUs: Long): DataFrame = {
    import arr.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMs * 1000L
    val a0 = arr.agg(min($"arrival_us").as("a0"))
    val withBatch = arr.crossJoin(broadcast(a0))
      .withColumn("batch_id",
        expr(s"(arrival_us - a0) div ${batchSpanUs}L"))
    val wm = withBatch.groupBy($"batch_id").agg(max($"ts_us").as("b_max"))
      .withColumn("prior_max", max($"b_max").over(
        Window.orderBy($"batch_id")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select($"batch_id",
        when($"prior_max".isNotNull,
          (expr("prior_max div 1000") - delayMs) * 1000).as("watermark_us"))
    // watermark at shutdown: every batch processed, so the global max
    // is in — sessions it has not reached stay un-emitted in state
    val finalWm = arr.agg(max($"ts_us").as("g_max"))
      .select(((expr("g_max div 1000") - delayMs) * 1000).as("final_wm_us"))
    val evs = withBatch.join(broadcast(wm), Seq("batch_id"))
      .withColumn("accepted",
        $"watermark_us".isNull || $"ts_us" + gapUs > $"watermark_us")
      .withColumn("stale",
        $"accepted" && $"watermark_us".isNotNull &&
          $"ts_us" <= $"watermark_us")
    val byKey = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val acc = evs.filter($"accepted")
      .withColumn("new_sess",
        when(lag($"ts_us", 1).over(byKey).isNull ||
          $"ts_us" - lag($"ts_us", 1).over(byKey) >= gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_seq", sum($"new_sess").over(
        byKey.rowsBetween(Window.unboundedPreceding, 0)))
    val sess = acc.groupBy($"user_id", $"sess_seq").agg(
      min($"ts_us").as("sess_start_us"),
      (max($"ts_us") + gapUs).as("sess_end_us"),
      count(lit(1)).as("n_events"),
      (sum($"stale".cast("long")) === 0L).as("sess_exact"))
    val accepted = acc.join(sess, Seq("user_id", "sess_seq"))
      .crossJoin(broadcast(finalWm))
      .select($"event_id", $"user_id", $"batch_id", $"ts_us",
        $"accepted", $"stale", $"sess_start_us", $"sess_end_us",
        $"n_events", ($"sess_end_us" <= $"final_wm_us").as("emitted"),
        $"sess_exact")
    val dropped = evs.filter(!$"accepted")
      .select($"event_id", $"user_id", $"batch_id", $"ts_us",
        $"accepted", $"stale", lit(null).cast("long").as("sess_start_us"),
        lit(null).cast("long").as("sess_end_us"),
        lit(null).cast("long").as("n_events"),
        lit(null).cast("boolean").as("emitted"),
        lit(null).cast("boolean").as("sess_exact"))
    accepted.unionByName(dropped)
  }

  /** ORACLED exercise (q205): the session-window acceptance/merge/
    * emission audit over the events fixture — 30-minute gap (the q30
    * session convention), 10-minute watermark delay, 1-hour
    * micro-batches, the q200 ±30-minute md5 arrival jitter — every
    * verdict, session span, event count, emission flag, and exactness
    * flag re-derived by DuckDB through the identical algebra. Closes
    * the last streaming-semantics row carried by tests alone (the
    * round-19 verdict's item 8): T1/T2/T4 had batch oracles
    * (q29/q41/q200), T3's merge rule had q30 — the
    * watermark-INTERACTING session lifecycle now has one too, with
    * the streaming side pinned by the MemoryStream edge specs.
    */
  def q205SessionAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val jitterUs = 1800L * 1000000L
    val events = Sources.events(spark, dir)
    val jitter = conv(substring(md5($"event_id".cast("string")), 1, 8),
      16, 10).cast("long") % (2L * jitterUs) - jitterUs
    sessionAcceptanceFromArrival(
        events.select($"event_id", $"user_id",
            unix_micros($"ts").as("ts_us"))
          .withColumn("arrival_us", $"ts_us" + jitter),
        gapMs = 1800000L, delayMs = 600000L,
        batchSpanUs = 3600L * 1000000L)
      .orderBy($"event_id")
  }

  /** One banded fingerprint row for [[nearDupPairsStream]] — `ts` is
    * carried through the band explosion so the watermark attribute
    * survives into the stateful operator.
    */
  private[graft] case class BandedDoc(
      docId: Long, simhash: Long, ts: Timestamp, band: Int, bval: Long)

  /** One remembered fingerprint in a band bucket's state. */
  private[graft] case class BucketEntry(docId: Long, simhash: Long, tsMs: Long)

  /** A detected near-duplicate pair: `doc_prev` has the earlier event
    * time (ties broken by smaller id); `ts` is the LATER of the two
    * event times — the event-time moment the pair became knowable.
    */
  case class NearDupHit(doc_prev: Long, doc_new: Long, hamming: Int, ts: Timestamp)

  /** T5 + L2 — STREAMING near-duplicate detection: emit a
    * [[NearDupHit]] for every pair of documents whose 64-bit SimHash
    * fingerprints are within `maxHamming` bits of each other and whose
    * event times are within `horizonMs` — the streaming counterpart of
    * the q38 batch band self-join, for dedup-at-ingest of a document
    * feed. Input columns: `doc_id` long, `simhash` long, `ts`
    * timestamp (see [[nearDupTextPairsStream]] for the text-level
    * entry point).
    *
    * Candidate generation is the same 4×16-bit banding as q38
    * (`Text.q38Simhash`): a pair within Hamming distance ≤ 3 differs
    * in at most 3 of the 4 bands, so it collides in at least one
    * (pigeonhole) — recall is EXACT for `maxHamming ≤ 3` (enforced),
    * and the full fingerprints kept in state make the final Hamming
    * check exact, so there are no false positives either.
    *
    * 100 TB posture: each arriving document becomes exactly 4 keyed
    * updates of one 24-byte [[BucketEntry]] each, sharded over
    * 4 × 65,536 band buckets — state
    * access is an equi-shuffle on an 8-byte key, never a scan, and a
    * hot bucket (boilerplate near-identical docs) is capped at
    * `maxBucketEntries` newest fingerprints (dropped-oldest beyond the
    * cap; a loss of RECALL under extreme skew, never a false
    * positive). State is bounded two ways: entries that can no longer
    * match any future row (`tsMs + horizonMs < watermark`) are evicted
    * on every bucket visit, and an idle bucket's whole state times out
    * `horizonMs` past its newest entry. A pair colliding in k bands is
    * emitted k times (k ≤ 4, always within one micro-batch);
    * [[nearDupPairsStreamDistinct]] collapses them exactly-once.
    *
    * `emitProgress=true` additionally emits one sentinel row per
    * document (`doc_prev = -1, hamming = -1`, from its band-0 bucket
    * only): a DOWNSTREAM event-time consumer re-watermarking this
    * output would otherwise only observe hit rows, and a hit-free
    * stretch of stream would stall its watermark forever — sentinels
    * carry the full event-time flow through. The distinct wrapper
    * relies on this and filters them back out after its window closes.
    */
  def nearDupPairsStream(docs: DataFrame, maxHamming: Int = 3,
      delay: String = "10 minutes", horizonMs: Long = 30L * 60 * 1000,
      maxBucketEntries: Int = 1024, emitProgress: Boolean = false): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit banding guarantees recall only for maxHamming <= 3, got $maxHamming")
    require(maxBucketEntries >= 1,
      s"maxBucketEntries must be >= 1, got $maxBucketEntries — a 0 cap " +
        "would leave bucket state empty and break the timeout bookkeeping")
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .select($"doc_id".cast("long").as("docId"),
        $"simhash".cast("long").as("simhash"), $"ts")
      .withWatermark("ts", delay)
      .select($"docId", $"simhash", $"ts",
        posexplode(array((0 until 4).map(b =>
          shiftright($"simhash", b * 16).bitwiseAND(0xFFFFL)): _*))
          .as(Seq("band", "bval")))
      .as[BandedDoc]
    banded
      .groupByKey(d => (d.band.toLong << 16) | d.bval)
      .flatMapGroupsWithState[List[BucketEntry], NearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            // deterministic intra-batch order: event time, then id
            val arrived = rows.toArray.sortBy(d => (d.ts.getTime, d.docId))
            var entries = state.getOption.getOrElse(Nil)
              .filter(_.tsMs + horizonMs >= wm)
            val out = Seq.newBuilder[NearDupHit]
            if (emitProgress && (key >> 16) == 0L)
              arrived.foreach(d => out += NearDupHit(-1L, d.docId, -1, d.ts))
            arrived.foreach { d =>
              val t = d.ts.getTime
              entries.foreach { e =>
                val ham = java.lang.Long.bitCount(e.simhash ^ d.simhash)
                if (ham <= maxHamming && e.docId != d.docId &&
                    math.abs(t - e.tsMs) <= horizonMs) {
                  val (prev, nxt) =
                    if (e.tsMs < t || (e.tsMs == t && e.docId < d.docId)) (e.docId, d.docId)
                    else (d.docId, e.docId)
                  out += NearDupHit(prev, nxt, ham, new Timestamp(math.max(t, e.tsMs)))
                }
              }
              entries = BucketEntry(d.docId, d.simhash, t) :: entries
            }
            // newest-first after the prepends; cap drops the oldest
            entries = entries.sortBy(-_.tsMs).take(maxBucketEntries)
            state.update(entries)
            state.setTimeoutTimestamp(math.max(entries.head.tsMs + horizonMs, wm + 1))
            out.result().iterator
          }
      }
      .toDF()
  }

  private[graft] case class CellDoc(docId: Long, unit: Array[Double],
      cell: Int, ts: Timestamp)
  private[graft] case class CellEntry(docId: Long, unit: Array[Double],
      tsMs: Long)

  /** A detected embedding near-duplicate pair: same prev/new and ts
    * conventions as [[NearDupHit]], with the exact cosine instead of a
    * Hamming distance.
    */
  case class EmbNearDupHit(doc_prev: Long, doc_new: Long, cosine: Double,
      ts: Timestamp)

  /** T5 + L2 (SEMANTIC) — streaming near-duplicate detection in
    * EMBEDDING space: emit an [[EmbNearDupHit]] for every pair of
    * in-horizon documents whose vectors' cosine reaches `minCos` and
    * that share at least one probed IVF cell — the streaming
    * counterpart of [[Similarity.embDedupCorpus]]'s pair stage, for
    * dedup-at-ingest of an embedded feed. Input columns: `doc_id`
    * long, `embedding` array<float/double>, `ts` timestamp.
    *
    * Candidate generation is the IVF shape of the batch
    * `knnJoinIvf`, with the coarse `centroids` supplied by the CALLER
    * (fit offline — on a batch sample via KMeans, as
    * [[Similarity.ivfTopK]] does; a stream cannot re-fit its quantizer
    * without rewriting history). Each arriving vector is L2-normalized
    * and ranked against the centroid literal IN A PURE MAP STAGE (the
    * same assignment score u·c − ‖c‖²/2, zero shuffle), then fans out
    * to its `nProbe` closest cells; the cell id is the fMGWS bucket
    * key. Two vectors meet iff their probe sets intersect — recall is
    * the IVF trade (near-identical vectors rank cells near-identically,
    * so true near-dups share their top cell), false positives are
    * impossible (state keeps full unit vectors; the emitted cosine is
    * exact). A pair sharing k probed cells is emitted k times (k ≤
    * nProbe, always within one micro-batch) — dedup downstream like
    * [[nearDupPairsStreamDistinct]] if exactly-once pairs matter.
    *
    * 100 TB posture mirrors the SimHash stream: each document becomes
    * exactly `nProbe` keyed updates sharded over the cell space, state
    * access is an equi-shuffle on a small int key, never a scan. The
    * same three state bounds apply — visit-time horizon eviction, idle
    * bucket event-time timeout, and the `maxBucketEntries` skew cap
    * (defaults LOWER than the SimHash stream's: an entry carries a
    * d-dim double vector, not an 8-byte fingerprint).
    */
  def embNearDupPairsStream(docs: DataFrame, centroids: Seq[Seq[Double]],
      minCos: Double, nProbe: Int = 2, delay: String = "10 minutes",
      horizonMs: Long = 30L * 60 * 1000,
      maxBucketEntries: Int = 256): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    require(centroids.nonEmpty && centroids.forall(_.size == centroids.head.size),
      "centroids must be non-empty and share one dimensionality")
    require(nProbe >= 1 && nProbe <= centroids.size,
      s"need 1 <= nProbe <= ${centroids.size}, got $nProbe")
    require(minCos >= -1.0 && minCos <= 1.0, s"minCos out of [-1,1]: $minCos")
    require(maxBucketEntries >= 1,
      s"maxBucketEntries must be >= 1, got $maxBucketEntries")
    val spark = docs.sparkSession
    import spark.implicits._
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val cLit = typedlit(centroids)
    val halfSqLit = typedlit(centroids.map(c => c.map(x => x * x).sum / 2.0))
    val norm = sqrt(aggregate(transform($"vec", x => x * x),
      lit(0.0), (acc, x) => acc + x))
    // same ranking rule as knnJoinIvf: the ASSIGNMENT score, so a
    // vector's own nearest cell is always probed first
    val cellRanks = transform(cLit, (c, i) => struct(
      (dot($"unit", c) - get(halfSqLit, i)).as("score"),
      i.cast("int").as("cell")))
    val probed = docs
      .select($"doc_id".cast("long").as("docId"),
        transform($"embedding", _.cast("double")).as("vec"), $"ts")
      .withWatermark("ts", delay)
      .withColumn("nrm", when(norm === 0.0, 1.0).otherwise(norm))
      .withColumn("unit", transform($"vec", x => x / $"nrm"))
      .select($"docId", $"unit",
        explode(slice(reverse(array_sort(cellRanks)), 1, nProbe)).as("pc"),
        $"ts")
      .select($"docId", $"unit", $"pc.cell".as("cell"), $"ts")
      .as[CellDoc]
    probed
      .groupByKey(_.cell)
      .flatMapGroupsWithState[List[CellEntry], EmbNearDupHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = state.getCurrentWatermarkMs()
            val arrived = rows.toArray.sortBy(d => (d.ts.getTime, d.docId))
            var entries = state.getOption.getOrElse(Nil)
              .filter(_.tsMs + horizonMs >= wm)
            val out = Seq.newBuilder[EmbNearDupHit]
            arrived.foreach { d =>
              val t = d.ts.getTime
              entries.foreach { e =>
                if (e.docId != d.docId && math.abs(t - e.tsMs) <= horizonMs) {
                  var cos = 0.0
                  var i = 0
                  while (i < d.unit.length) {
                    cos += e.unit(i) * d.unit(i); i += 1
                  }
                  if (cos >= minCos) {
                    val (prev, nxt) =
                      if (e.tsMs < t || (e.tsMs == t && e.docId < d.docId))
                        (e.docId, d.docId)
                      else (d.docId, e.docId)
                    out += EmbNearDupHit(prev, nxt,
                      math.rint(cos * 1e6) / 1e6,
                      new Timestamp(math.max(t, e.tsMs)))
                  }
                }
              }
              entries = CellEntry(d.docId, d.unit, t) :: entries
            }
            entries = entries.sortBy(-_.tsMs).take(maxBucketEntries)
            state.update(entries)
            state.setTimeoutTimestamp(
              math.max(entries.head.tsMs + horizonMs, wm + 1))
            out.result().iterator
          }
      }
      .toDF()
  }

  /** [[nearDupPairsStream]] with the cross-band duplicates collapsed
    * EXACTLY-ONCE: a pair colliding in k ≤ 4 bands surfaces as one row
    * with its (single possible) Hamming distance, emitted append-mode
    * once the watermark passes its window — the classic
    * flatMapGroupsWithState → windowed-aggregation chain.
    *
    * Spark's STATIC multi-stateful check rejects any aggregation after
    * flatMapGroupsWithState (it cannot see what the function emits),
    * so running this chain requires
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`
    * ON THE CALLER'S SESSION (this op deliberately does not mutate
    * session conf). The blanket risk does not apply to THIS function's
    * emissions: a hit's `ts` is the max of two event times, one of
    * which belongs to the micro-batch's triggering row — which the
    * source watermark already admitted — so every emitted row is
    * at-or-after the global watermark and can never be late for the
    * downstream window.
    */
  def nearDupPairsStreamDistinct(docs: DataFrame, maxHamming: Int = 3,
      delay: String = "10 minutes", horizonMs: Long = 30L * 60 * 1000,
      maxBucketEntries: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    nearDupPairsStream(docs, maxHamming, delay, horizonMs, maxBucketEntries,
        emitProgress = true)
      .withWatermark("ts", delay)
      .groupBy(window($"ts", "1 minute"), $"doc_prev", $"doc_new")
      .agg(min($"hamming").as("hamming"))
      .select($"doc_prev", $"doc_new", $"hamming", $"window.end".as("ts"))
      // drop the progress sentinels via the AGGREGATED column: a
      // filter on doc_prev (a grouping key) would be pushed below the
      // aggregate AND below the watermark node, stripping the
      // sentinels before they can advance the downstream watermark —
      // the exact stall they exist to prevent
      .filter($"hamming" >= 0)
  }

  /** Text-level entry point: fingerprint with the fused
    * [[graft.expressions.SimHash64]] kernel (a pure map stage — the
    * same zero-shuffle posture as q38's batch path) and detect
    * near-dup pairs within the horizon. Input columns: `doc_id`,
    * `text`, `ts`.
    */
  def nearDupTextPairsStream(docs: DataFrame, maxHamming: Int = 3,
      delay: String = "10 minutes", horizonMs: Long = 30L * 60 * 1000): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftColumns.simHash64
    val spark = docs.sparkSession
    import spark.implicits._
    nearDupPairsStream(
      docs.select($"doc_id", simHash64($"text").as("simhash"), $"ts"),
      maxHamming, delay, horizonMs)
  }
}
