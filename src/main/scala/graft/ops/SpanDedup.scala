package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L2+ — EXACT cross-document substring deduplication (span-level).
  *
  * Document-level dedup (q21/q25/q39) drops whole near-identical rows;
  * pretraining corpora additionally need the Lee-et-al-style pass that
  * excises REPEATED SPANS from otherwise-distinct documents (boilerplate,
  * licenses, quoted blocks). This is the fixed-length-gram formulation of
  * that op: any maximal run of characters covered by length-L grams that
  * occur in >= minDocs distinct documents is flagged and can be removed.
  *
  * Nothing like this exists in the reference (image corpus); it is
  * north-star training-data-pipeline surface.
  *
  * 100 TB posture, stage by stage:
  *  - gram extraction is a generator + projection in ONE map stage (the
  *    exploded row never outlives the stage; same shape as q24's
  *    explode -> aggregate);
  *  - duplicate detection groups on xxhash64(gram) — 8-byte shuffle
  *    keys instead of L-char strings (the q21 idiom; measured 1.7× on
  *    the whole op at sf0.1). The collision odds (~n²/2⁶⁵) are the
  *    same accepted q21 trade. For the default minDocs=2 the gate is
  *    min(doc_id) ≠ max(doc_id), which keeps the aggregate a plain
  *    min/max pair — count(DISTINCT) would re-plan into the two-pass
  *    Expand shape for no benefit;
  *  - the hit set joins back LEFT SEMI on the hash (the duplicated-gram
  *    set is small on clean corpora and broadcasts, so the join adds no
  *    shuffle of the gram stream);
  *  - island-merge is ONE window shuffle keyed by doc_id -- per-document
  *    state, embarrassingly parallel across documents.
  * No driver-side state anywhere; every stage is a keyed shuffle or a
  * map stage, so the plan survives a 1000-executor fan-out unchanged.
  */
object SpanDedup {

  /** (doc_id, pos, gram): every length-L character gram of every
    * document, 1-based positions (substr semantics on both engines).
    * Documents shorter than L contribute nothing — the filter also
    * guards Spark's `sequence`, which would DESCEND for start > stop.
    */
  def grams(docs: DataFrame, gramLen: Int): DataFrame =
    docs
      .filter(length(col("text")) >= gramLen)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - (gramLen - 1))).as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("text").substr(col("pos"), lit(gramLen)).as("gram"))

  /** Merged duplicated spans per document: each row one maximal interval
    * [span_start, span_end] (1-based, inclusive) covered by duplicated
    * grams. Overlapping AND adjacent gram hits merge (adjacent hits are
    * one contiguous run of duplicated text). Classic gaps-and-islands:
    * a hit opens a new island iff its start clears the running max end
    * of all earlier hits by more than one.
    */
  def dupSpans(docs: DataFrame, gramLen: Int, minDocs: Int = 2): DataFrame = {
    val g = grams(docs, gramLen)
      .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("h"))
    duplicatedIslands(g, gramLen, minDocs)
  }

  /** The duplicated-gram hash set of a REFERENCE corpus, as a 1-column
    * frame (`h` = xxhash64 of the literal gram) — the first half of
    * [[dupSpans]] exposed as reusable index state: small on clean
    * corpora (the q100 broadcast claim), it is what
    * [[Streaming.curationStream]] probes incoming documents against.
    */
  def dupGramHashes(docs: DataFrame, gramLen: Int, minDocs: Int = 2): DataFrame =
    dupHashes(
      grams(docs, gramLen)
        .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("h")),
      minDocs)

  /** [[dupGramHashes]] folded into a Spark `BloomFilter` — the
    * BOUNDED-MEMORY index state behind
    * [[Streaming.admissionStreamBloom]]. Built DISTRIBUTEDLY via
    * `DataFrame.stat.bloomFilter` (executor-side partial filters
    * OR-merged on the driver), so unlike the exact sorted-array path
    * the gram hashes never collect: the only driver-resident object is
    * the fixed-size bit array, ~1.44·log₂(1/fpp) bits per expected
    * gram regardless of how duplicated the corpus is. The dup frame is
    * persisted across its two passes (count + filter build) and
    * released before return.
    */
  def dupGramBloom(docs: DataFrame, gramLen: Int, fpp: Double = 0.01,
      minDocs: Int = 2): org.apache.spark.util.sketch.BloomFilter = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val hashes = dupGramHashes(docs, gramLen, minDocs).persist()
    try {
      // max(count, 1): BloomFilter.create rejects 0 expected items; an
      // empty dup set (fully clean corpus) yields an empty filter that
      // correctly reports no hits
      val n = math.max(hashes.count(), 1L)
      hashes.stat.bloomFilter("h", n, fpp)
    } finally hashes.unpersist(false)
  }

  /** Shared tail of [[dupSpans]] and [[winnowedDupSpans]]: from a
    * (doc_id, pos, h) gram-hash stream, keep hashes seen in >= minDocs
    * distinct documents and merge the surviving positions into maximal
    * [span_start, span_end] islands per document.
    */
  /** Hash keys seen in >= minDocs distinct documents — the dup gate of
    * [[duplicatedIslands]], also exposed via [[dupGramHashes]].
    */
  private def dupHashes(g: DataFrame, minDocs: Int): DataFrame = {
    val multi =
      if (minDocs == 2) min(col("doc_id")) =!= max(col("doc_id"))
      else countDistinct(col("doc_id")) >= minDocs
    g.groupBy(col("h")).agg(multi.as("multi"))
      .filter(col("multi")).select("h")
  }

  private[ops] def duplicatedIslands(g: DataFrame, gramLen: Int,
      minDocs: Int): DataFrame = {
    val dup = dupHashes(g, minDocs)
    val hits = g
      .join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"), (col("pos") + (gramLen - 1)).as("e"))
    mergeIslands(hits)
  }

  /** Gaps-and-islands merge of a (doc_id, pos, e) hit stream into
    * maximal per-document [span_start, span_end] intervals — the shared
    * tail of [[duplicatedIslands]] and [[decontaminate]]. ONE window
    * shuffle keyed by doc_id.
    */
  private[ops] def mergeIslands(hits: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val prevMaxEnd = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("brk",
        when(col("pos") > coalesce(prevMaxEnd, lit(-1L)) + 1, 1).otherwise(0))
      .withColumn("gid", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("gid"))
      .agg(min(col("pos")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** The WINNOWED scale variant of [[dupSpans]] (q104): instead of
    * shuffling every stride-1 gram hash (~1 row per character — the
    * q100 cost constant flagged in round 12), each document emits only
    * its winnowed selection — the leftmost minimum of every `window`
    * consecutive rolling gram hashes ([[graft.expressions.WinnowedGramMins]]),
    * ~2/(window+1) of the gram stream. The winnowing guarantee
    * (Schleimer et al. §3): any duplicated run of length >=
    * gramLen + window − 1 contains at least one gram BOTH copies
    * select, so every long duplicated run is still flagged; runs
    * shorter than that can escape — the documented recall trade, which
    * is why the stride-1 [[dupSpans]] remains the exact oracle form.
    * Span boundaries are selected-gram boundaries (sub-intervals of the
    * exact spans).
    *
    * TWO hashes with distinct jobs: the 31-bit base-131 polynomial
    * drives only the SELECTION (which positions survive winnowing —
    * oracle-shared so DuckDB reproduces the selection bit-for-bit; a
    * collision there only makes two windows pick the same position,
    * never a wrong span), while the cross-doc DUPLICATE GATE keys on
    * `xxhash64` of the LITERAL gram at each selected position — the
    * same ~n²/2⁶⁴ trade as q100. Gating on the 31-bit fingerprint
    * itself would collide at ~n²/2³² (hundreds of expected
    * false-positive "duplicates" at 10⁶ selected grams), flagging
    * never-duplicated text — a precision failure the winnowing
    * recall-only contract explicitly excludes.
    *
    * 100 TB posture: identical plan shape to [[dupSpans]] — one map
    * stage (kernel + explode + literal-gram rehash, all fused), one
    * keyed aggregate, a broadcast-sized semi join, one per-doc window —
    * but every exchange carries a `window/2`× thinner stream.
    */
  def winnowedDupSpans(docs: DataFrame, gramLen: Int, window: Int,
      minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftColumns.winnowedGramMins
    val g = docs
      .filter(length(col("text")) >= gramLen + window - 1)
      .select(col("doc_id"), col("text"),
        explode(winnowedGramMins(col("text"), gramLen, window)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"),
        xxhash64(col("text").substr(col("s.pos").cast("int"), lit(gramLen)))
          .as("h"))
    duplicatedIslands(g, gramLen, minDocs)
  }

  /** Documents with flagged spans excised — the consuming side of
    * [[dupSpans]]. Expression-only string surgery: collect each doc's
    * spans into a sorted array (bounded by doc length / gramLen, so the
    * per-row array is small by construction), then a single `aggregate`
    * HOF walks the spans, concatenating the keep-ranges between them.
    * Map stage + one |spans|-sized grouped join; no UDF.
    */
  def removeSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val perDoc = spans
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("span_start"), col("span_end"))))
        .as("spans"))
    val clean = aggregate(
      col("spans"),
      struct(lit(1L).as("cursor"), lit("").as("acc")),
      (st, sp) => struct(
        // greatest() keeps the walk monotonic for ANY caller-supplied
        // span list: a nested span (span_end < cursor) must not move
        // the cursor backward and re-emit already-excised text.
        // dupSpans never emits overlaps, but the method is public.
        greatest(st("cursor"), sp("span_end") + 1).as("cursor"),
        concat(st("acc"),
          col("text").substr(st("cursor"),
            greatest(sp("span_start") - st("cursor"), lit(0L)))).as("acc")),
      st => concat(st("acc"), col("text").substr(st("cursor"), length(col("text")))))
    docs
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("clean_text",
        when(col("spans").isNull, col("text")).otherwise(clean))
      .drop("spans")
  }

  /** ORACLED exercise (q100): flag repeated 24-char spans across the
    * documents corpus (>= 2 distinct docs) and emit the merged
    * intervals. L=24 on the fixture yields multi-island documents (the
    * merge logic is actually exercised) and whole-document spans for the
    * fixture's exact duplicates. DuckDB reproduces the full pipeline —
    * gram explode, distinct-doc gate, gaps-and-islands merge — so every
    * span boundary is hash-checked, not just counts.
    */
  def q100SubstringDedup(spark: SparkSession, dir: String): DataFrame =
    dupSpans(Sources.documents(spark, dir), gramLen = 24, minDocs = 2)
      .orderBy(col("doc_id"), col("span_start"))

  /** ORACLED exercise (q102): the CONSUMING half of the Lee-et-al pass —
    * the corpus with every q100-flagged span excised. This is the frame
    * a curation pipeline actually trains on (q100's span list is the
    * diagnostic artifact); DuckDB re-derives the cleaned text from the
    * same span list with a lag-window segment walk, so every byte of
    * every cleaned document is hash-checked end-to-end.
    */
  def q102RemoveSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    removeSpans(docs, dupSpans(docs, gramLen = 24, minDocs = 2))
      .select(col("doc_id"), col("clean_text"),
        length(col("clean_text")).as("clean_len"))
      .orderBy(col("doc_id"))
  }

  /** ORACLED exercise (q104): [[winnowedDupSpans]] with the q100 gram
    * length and an 8-hash window — the ~4×-thinner-shuffle scale
    * variant. Hash-checked span-for-span against the DuckDB
    * re-derivation of the same winnowed selection (shared polynomial
    * hash); the exact-vs-winnowed recall relationship is asserted in
    * SpanDedupSpec (every maximal cross-doc shared RUN of length >= 31
    * yields a winnowed span on both sides — merged exact ISLANDS can be
    * composites of shorter runs and carry no such guarantee).
    */
  def q104WinnowedSpans(spark: SparkSession, dir: String): DataFrame =
    winnowedDupSpans(Sources.documents(spark, dir), gramLen = 24, window = 8,
      minDocs = 2)
      .orderBy(col("doc_id"), col("span_start"))

  /** BENCHMARK DECONTAMINATION — the cross-corpus containment check a
    * training pipeline runs before any eval claim (the GPT-3 appendix-C
    * / C4-analysis recipe, re-expressed at the character-gram level):
    * flag every TRAINING document containing any length-`gramLen` gram
    * that occurs anywhere in the BENCHMARK set, with the contaminated
    * positions merged to maximal spans and rolled up per document
    * (span count + contaminated character mass — the evidence a
    * drop/clean decision needs).
    *
    * Distinct from within-corpus dedup (q100 family): the gate is
    * membership in a FOREIGN corpus's gram set, not cross-doc
    * multiplicity.
    *
    * 100 TB posture: eval sets are tiny by definition, so the distinct
    * benchmark gram-hash set is broadcast-sized and the semi join adds
    * NO shuffle of the training gram stream (the q100 broadcast
    * argument, strengthened — here the small side is small by
    * construction, not just on clean corpora); the only keyed shuffle
    * is the per-doc islands window. Training grams explode in one map
    * stage and never outlive it.
    */
  /** The benchmark set's distinct gram-hash frame — [[decontaminate]]'s
    * gate state exposed as reusable index surface (what
    * [[Streaming.admissionStream]] broadcasts), mirroring
    * [[dupGramHashes]] for the dedup gate.
    */
  def benchGramHashes(bench: DataFrame, gramLen: Int): DataFrame =
    grams(bench, gramLen).select(xxhash64(col("gram")).as("h")).distinct()

  /** The merged contaminated SPANS of every training document — the
    * interval-level view behind [[decontaminate]]'s rollup, exposed so
    * the removal tail can consume it ([[q115RemoveContaminated]]):
    * surgical span excision keeps the document minus the quoted
    * benchmark text, where the per-doc gate would drop it whole.
    */
  def contaminationSpans(train: DataFrame, bench: DataFrame,
      gramLen: Int): DataFrame = {
    // EXPLICIT broadcast: the distinct bench gram set is small by
    // definition (eval sets), but the planner's static estimate tracks
    // the scanned table, not the aggregate's output — without the hint
    // a large-enough bench TABLE would tip the semi join to sort-merge
    // and shuffle the whole training gram stream, the exact plan the
    // 100 TB posture (and the QualitySpec plan assertion) forbids
    val benchHashes = broadcast(benchGramHashes(bench, gramLen))
    val hits = grams(train, gramLen)
      .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("h"))
      .join(benchHashes, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"), (col("pos") + (gramLen - 1)).as("e"))
    mergeIslands(hits)
  }

  def decontaminate(train: DataFrame, bench: DataFrame,
      gramLen: Int): DataFrame =
    contaminationSpans(train, bench, gramLen)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("contaminated_chars"))

  /** Leakage REPORT by benchmark item — the inverse pivot of
    * [[decontaminate]]: instead of "which training docs are
    * contaminated", answer "which BENCHMARK items leak, and how
    * badly" — the table an eval owner reads before trusting a score
    * (the per-task contamination studies in Brown et al. 2020 §4 /
    * Chowdhery et al. 2022 App. C report exactly this rollup). Each
    * shared gram is attributed to ONE benchmark doc — the smallest
    * bench id containing it — so hit masses add up deterministically
    * when benchmark items overlap each other.
    *
    * Output: one row per benchmark doc (zero-leakage items included,
    * n_train_docs = n_hits = 0): bench_id, n_train_docs (distinct
    * training docs sharing ≥1 attributed gram), n_hits (attributed
    * gram occurrences in the training stream).
    *
    * Shape: the attribution table is the bench gram set + a min —
    * bench-bounded, BROADCAST (the [[contaminationSpans]] argument,
    * explicit hint for the same planner-estimate reason); the
    * training gram stream inner-joins it map-side and feeds ONE
    * aggregate keyed by bench_id (bounded keys, map-side combine,
    * the distinct-doc count two-phase over contamination-bounded
    * pairs). Linear in training tokens at any corpus size; 8-byte
    * xxhash64 gram keys (q21/q39's collision trade).
    */
  def leakageReport(train: DataFrame, bench: DataFrame,
      gramLen: Int): DataFrame = {
    val attribution = broadcast(
      grams(bench, gramLen)
        .select(xxhash64(col("gram")).as("h"), col("doc_id"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("bench_id")))
    val rep = grams(train, gramLen)
      .select(col("doc_id"), xxhash64(col("gram")).as("h"))
      .join(attribution, Seq("h"))
      .groupBy(col("bench_id"))
      .agg(count_distinct(col("doc_id")).as("n_train_docs"),
        count(lit(1)).as("n_hits"))
    bench.select(col("doc_id").as("bench_id")).distinct()
      .join(rep, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** ORACLED exercise (q135): [[leakageReport]] at the q112 split
    * (every 97th doc the benchmark, the rest training, 24-char
    * grams) — every benchmark item's distinct-training-doc count and
    * attributed hit mass hash-checked against DuckDB's literal-gram
    * re-derivation (including the zero rows).
    */
  def q135LeakageReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    leakageReport(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0), gramLen = 24)
      .orderBy(col("bench_id"))
  }

  /** ORACLED exercise (q112): [[decontaminate]] with a deterministic
    * split of the documents table — every 97th doc_id plays the
    * benchmark set, the rest the training corpus (the fixture's
    * planted duplicates guarantee non-vacuous contamination). DuckDB
    * re-derives the full pipeline — both gram explodes, the
    * containment gate, islands merge, per-doc rollup — so every span
    * count and contaminated-character mass is hash-checked.
    */
  def q112Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    decontaminate(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0), gramLen = 24)
      .orderBy(col("doc_id"))
  }

  /** ORACLED exercise (q115): the SURGICALLY decontaminated corpus —
    * [[removeSpans]] composed with [[contaminationSpans]], excising
    * the quoted benchmark text from each training document instead of
    * dropping the document (q114's row-level gate): the higher-recall
    * decontamination mode when contamination is a quoted passage
    * inside an otherwise-good document. Third head×tail composition
    * of the span family: every hit head (cross-doc dup, winnowed,
    * containment) now composes with both tails (flag, remove), all
    * from the same shared SQL fragments — every byte of every cleaned
    * training document hash-checked.
    */
  def q115RemoveContaminated(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val cands = docs.filter(col("doc_id") % 97 =!= 0)
    removeSpans(cands,
        contaminationSpans(cands, docs.filter(col("doc_id") % 97 === 0),
          gramLen = 24))
      .select(col("doc_id"), col("clean_text"),
        length(col("clean_text")).as("clean_len"))
      .orderBy(col("doc_id"))
  }

  /** ORACLED exercise (q109): the cleaned corpus under the WINNOWED
    * span list — [[removeSpans]] composed with [[winnowedDupSpans]]
    * (q104's spans), so the scale variant's removal is consumed
    * end-to-end exactly like q102 consumes q100's: every byte of every
    * cleaned document hash-checked against the DuckDB re-derivation of
    * the same winnowed selection + segment walk. Winnowed spans are
    * sub-intervals of the exact ones (the documented recall trade), so
    * this is the corpus a throughput-bound pipeline would actually
    * emit.
    */
  def q109RemoveWinnowed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    removeSpans(docs,
        winnowedDupSpans(docs, gramLen = 24, window = 8, minDocs = 2))
      .select(col("doc_id"), col("clean_text"),
        length(col("clean_text")).as("clean_len"))
      .orderBy(col("doc_id"))
  }
}
