package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example shaping — the operators that turn a curated corpus
  * into the examples a pretraining / RAG job actually consumes:
  * deterministic hash splits, concat-and-chunk sequence packing, and
  * overlapping text chunking.
  *
  * Nothing here exists in the reference (its corpus is images split with
  * dask-ml's random splitter, main.py:214-216); these extend the same
  * dataset-preparation surface the driver contract's §2.11 ops cover.
  *
  * 100 TB posture: `hashSplit` and `chunkDocs` are pure map stages (no
  * shuffle at all before the display ORDER BY). `sequencePack` needs a
  * global token prefix sum — the one op in this family with an inherent
  * barrier — and implements it as the classic two-pass distributed scan:
  * range-partition by id, per-partition subtotals (one row PER PARTITION
  * to the driver, not per row), then a partition-local cumulative sum
  * plus a broadcast exclusive offset. No single-partition global window
  * anywhere.
  */
object Packing {

  /** The q46 tokenizer (letter runs / digit runs / single symbols) —
    * the BPE-ish segmentation both engines reproduce identically, reused
    * here so packed example counts line up with the token-count query.
    */
  private val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  private[graft] def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0))).cast("long")

  /** Deterministic train/val/test assignment: bucket = the first 8 md5
    * hex chars of the id as an integer, mod 1000 (the q83/q86 md5-conv
    * idiom — bit-identical in DuckDB). Unlike `randomSplit` (P6, whose
    * membership is partitioning-local), the assignment is a pure
    * function of the id: stable across runs, cluster sizes, and data
    * layout, so a doc never migrates between train and test when the
    * corpus is re-partitioned — the property an LLM data pipeline needs
    * for decontamination audits. Pure map stage; `%` keeps the bucket in
    * [0, 1000) because conv's 32-bit value is non-negative.
    */
  def hashSplit(df: DataFrame, idCol: String,
      trainPermille: Int = 800, valPermille: Int = 100): DataFrame = {
    require(trainPermille > 0 && valPermille > 0
        && trainPermille + valPermille < 1000,
      s"permille bounds out of range: train=$trainPermille val=$valPermille")
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPermille, "train")
          .when(col("bucket") < trainPermille + valPermille, "val")
          .otherwise("test"))
  }

  /** Concat-and-chunk sequence packing: lay every document's tokens on
    * one global tape (in id order) and cut the tape into fixed
    * `ctxTokens` examples — the packing rule GPT-style pretraining uses.
    * Emits, per document, the example range it lands in
    * (`first_example`..`last_example`) and how many context windows it
    * spans.
    *
    * The global running total is a distributed prefix sum, NOT a
    * single-partition window: range-partition by id (so partition i's
    * ids all precede partition i+1's), sum each partition's tokens —
    * a #partitions-row aggregate, the only driver-side data — and add
    * each partition's exclusive offset (a broadcast map literal) to its
    * partition-local cumulative sum. Two scans of a (id, count)
    * projection is the inherent cost of a prefix sum; each scan is a
    * thin map stage. The per-partition window shuffles only
    * (id, n_tokens, pid) — 24 bytes a row.
    *
    * Result is invariant to the partition count: any ordered range
    * cut reproduces the same global cumulative sum (property-tested in
    * PackingSpec).
    */
  def sequencePack(df: DataFrame, idCol: String, tokensCol: Column,
      ctxTokens: Long): DataFrame =
    sequencePackWithOffsets(df, idCol, tokensCol, ctxTokens)
      .drop("tok_start")

  /** [[sequencePack]] keeping each document's absolute token offset
    * (`tok_start` = the global tape position of its first token) —
    * the handle downstream surgery needs ([[deletionBlastRadius]]
    * intersects doc token intervals with example boundaries).
    */
  def sequencePackWithOffsets(df: DataFrame, idCol: String,
      tokensCol: Column, ctxTokens: Long): DataFrame = {
    require(ctxTokens >= 1, s"ctxTokens must be >= 1, got $ctxTokens")
    val toks = df.select(col(idCol), tokensCol.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    orderedCumBefore(toks, Seq(col(idCol)), "n_tokens")
      .withColumn("first_example", expr(s"cum_before div $ctxTokens"))
      .withColumn("last_example",
        expr(s"(cum_before + n_tokens - 1) div $ctxTokens"))
      .withColumn("n_examples",
        col("last_example") - col("first_example") + lit(1L))
      .withColumn("tok_start", col("cum_before"))
      .drop("cum_before")
  }

  /** PER-EXAMPLE COMPOSITION MANIFEST — the inverse view of
    * [[sequencePackWithOffsets]]: one row per (context window,
    * document) incidence giving the token span the document occupies
    * WITHIN that window (`span_start` inclusive, `span_end`
    * exclusive, both in window-local coordinates 0..ctxTokens). This
    * is the document-boundary table modern pretraining actually
    * consumes: document-masked attention (each window attends only
    * within its own documents' spans — the Llama-3-style reset),
    * per-example loss masking, and example→docs provenance all read
    * exactly this (example_id, doc_id, span) relation; [[sequencePack]]
    * alone answers doc→examples but not "what does window e contain".
    *
    * 100 TB posture: a pure map + bounded explode on top of the
    * checkpoint-frozen prefix sum — no new shuffle. The explode factor
    * is `n_examples` per doc, so output size is
    * O(#docs + total_tokens / ctxTokens): the size of the training
    * metadata itself, linear in the corpus.
    */
  def exampleSpans(df: DataFrame, idCol: String, tokensCol: Column,
      ctxTokens: Long): DataFrame = {
    sequencePackWithOffsets(df, idCol, tokensCol, ctxTokens)
      .withColumn("example_id",
        explode(sequence(col("first_example"), col("last_example"))))
      .withColumn("span_start",
        greatest(col("tok_start") - col("example_id") * ctxTokens, lit(0L)))
      .withColumn("span_end",
        least(col("tok_start") + col("n_tokens") - col("example_id") * ctxTokens,
          lit(ctxTokens)))
      .withColumn("span_tokens", col("span_end") - col("span_start"))
      .select(col(idCol), col("example_id"), col("span_start"),
        col("span_end"), col("span_tokens"))
  }

  /** ORACLED exercise (q181): [[exampleSpans]] under q92's tokenizer
    * and 512-token windows — DuckDB re-derives the global prefix sum,
    * unnests each doc's window range (generate_series), and re-computes
    * every window-local span boundary; every (window, doc, span) row
    * hash-checked.
    */
  def q181ExampleSpans(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    exampleSpans(docs, "doc_id", bpeishCount($"text"), 512L)
      .orderBy($"doc_id", $"example_id")
  }

  /** PER-GROUP concat-and-chunk packing — one independent tape per
    * group (the per-LANGUAGE training shards multilingual pretraining
    * actually ships: languages are sampled independently, so their
    * windows must not share a tape). Rides the SAME checkpoint-frozen
    * global prefix sum as [[sequencePack]], ordered by (group, id):
    * within that order every row between a group's first row and a
    * member is same-group, so the member's WITHIN-GROUP offset is just
    * `cum_before − min(cum_before) over the group` — one
    * #groups-row aggregate and a broadcast join recover every group's
    * tape from ONE global pass, instead of one range shuffle per
    * group (or a single-partition-per-group window).
    */
  def sequencePackByGroup(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: Column, ctxTokens: Long): DataFrame = {
    require(ctxTokens >= 1, s"ctxTokens must be >= 1, got $ctxTokens")
    val toks = df.select(col(groupCol), col(idCol),
        tokensCol.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val cum = orderedCumBefore(toks, Seq(col(groupCol), col(idCol)),
      "n_tokens")
    val base = cum.groupBy(col(groupCol))
      .agg(min(col("cum_before")).as("g_base"))
    cum.join(broadcast(base), Seq(groupCol))
      .withColumn("g_cum", col("cum_before") - col("g_base"))
      .withColumn("first_example", expr(s"g_cum div $ctxTokens"))
      .withColumn("last_example",
        expr(s"(g_cum + n_tokens - 1) div $ctxTokens"))
      .withColumn("n_examples",
        col("last_example") - col("first_example") + lit(1L))
      .select(col(groupCol), col(idCol), col("n_tokens"),
        col("first_example"), col("last_example"), col("n_examples"))
  }

  /** ORACLED exercise (q195): [[sequencePackByGroup]] by language
    * under q92's tokenizer and 512-token windows — every language's
    * independent tape (window boundaries and counts) hash-checked
    * against DuckDB's lang-partitioned window cumulative sum; the
    * base-subtraction trick must be indistinguishable from a per-group
    * prefix sum.
    */
  def q195PackByLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sequencePackByGroup(Sources.documents(spark, dir), "lang", "doc_id",
        bpeishCount($"text"), 512L)
      .orderBy($"doc_id")
  }

  /** The DISTRIBUTED ordered prefix sum both packing and budget
    * truncation ride on: appends `cum_before` = the sum of `valueCol`
    * over every row strictly earlier in `sortKeys` order (globally,
    * with no single-partition sort). Two passes over ONE
    * range-partitioned layout:
    *
    *  - pass 1: per-partition subtotals → a driver-side running sum
    *    gives each partition its global offset (O(#partitions) rows
    *    collected, never O(n));
    *  - pass 2: partition-local window cumsum + the broadcast offset.
    *
    * The range shuffle is FROZEN with a localCheckpoint before either
    * pass reads it: the passes are separate jobs, and RangePartitioner
    * re-samples its split points per execution (the sample seed
    * derives from the RDD id, which is fresh each run). At small scale
    * the sampler sees every row so bounds are stable, but at
    * production scale the sample is partial and re-drawn — the
    * pid→offset map from pass 1 would silently misapply to different
    * partition contents in pass 2, corrupting every offset after the
    * first drifted boundary. The checkpoint pins ONE partitioning both
    * jobs read (and fails loudly on block loss rather than recomputing
    * into a different layout); the pinned frame carries only the sort
    * keys + the value column, not the corpus.
    *
    * The OUTPUT is eagerly checkpointed and the ranged frame's
    * checkpoint RDD unpersisted directly before return (Dataset
    * .unpersist is a CacheManager call and does not see localCheckpoint
    * storage), so repeated calls in a long-lived session do not
    * accumulate pinned blocks (the connectedComponents discipline).
    *
    * `sortKeys` must be a total order (tie-break on a unique id) or
    * `cum_before` is ill-defined within tie groups.
    */
  private[graft] def orderedCumBefore(df: DataFrame, sortKeys: Seq[Column],
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(nParts, sortKeys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // pass 1: per-partition subtotals — O(#partitions) rows, never O(n)
    val totals = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (p, t) => val o = acc; acc += t; (p, o) }
    // empty input: zero-arg map() would type as map<null,null> and fail
    // analysis in element_at — and there is nothing to offset anyway
    val offset =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.flatMap { case (p, o) =>
          Seq(lit(p), lit(o)) }.toIndexedSeq: _*),
        col("__pid"))
    // pass 2: partition-local cumulative sum + broadcast offset.
    // The output is eagerly checkpointed so the ranged frame can be
    // unpersisted here (the marginMine discipline) — otherwise every
    // call would pin the ranged blocks for executor lifetime, since
    // the lazy result keeps referencing them. Transient cost: one
    // extra copy of (keys, value, cum_before) during the handoff.
    val w = Window.partitionBy(col("__pid")).orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = ranged
      .withColumn("cum_before",
        coalesce(sum(col(valueCol)).over(w), lit(0L)) + offset)
      .drop("__pid")
      .localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftColumns.checkpointRdd(ranged)
      .foreach(_.unpersist(false))
    out
  }

  /** L54 — TOKEN-BUDGET CORPUS TRUNCATION (the data-pruning deployment
    * of a quality signal — SlimPajama/FineWeb-style "keep the best
    * documents until the budget is spent", Sorscher et al. 2022's
    * pruning-under-budget framing): order docs by (`scoreCol` asc,
    * id) — lower score = better, e.g. LM bits — and keep each doc iff
    * its whole token count still fits the running budget (never
    * overshoots; a straddling doc is dropped, not split).
    *
    * The global order is NOT a single-partition sort: the running
    * total rides [[orderedCumBefore]]'s range-partitioned two-pass
    * prefix sum, so the op scales exactly as sequence packing does.
    * Output: (id, score, n_tokens, tok_start = total tokens of all
    * strictly better-ranked docs, kept). The kept set is a contiguous
    * quality-order prefix: the first straddling doc ends selection
    * (greedy prefix, not skip-ahead bin packing — the budget is a
    * cap, not a packing target).
    */
  def budgetTruncate(df: DataFrame, idCol: String, scoreCol: Column,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budgetTruncate: budget must be >= 0, got $budget")
    val toks = df.select(col(idCol), scoreCol.as("score"),
        tokensCol.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    orderedCumBefore(toks, Seq(col("score"), col(idCol)), "n_tokens")
      .withColumn("tok_start", col("cum_before"))
      .withColumn("kept", col("cum_before") + col("n_tokens") <= budget)
      .drop("cum_before")
  }

  /** Overlapping strided chunking for retrieval: cut each document into
    * `chunkChars`-char windows every `strideChars` chars (overlap =
    * chunk − stride), the RAG indexing shape. Chunk count is
    * 1 + ceil(max(len − chunk, 0) / stride); the final chunk may run
    * short rather than re-reading earlier text. Per-row generator over
    * a `sequence` — a pure map stage, no shuffle, and the explode
    * collapses straight into the projection (no persisted blowup).
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
      chunkChars: Int, strideChars: Int): DataFrame = {
    require(chunkChars >= 1 && strideChars >= 1 && strideChars <= chunkChars,
      s"bad chunking: chunk=$chunkChars stride=$strideChars")
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        length(col(textCol)).cast("long").as("__n"))
      .withColumn("__n_chunks",
        lit(1L) + when(col("__n") <= chunkChars, lit(0L))
          .otherwise(expr(
            s"(__n - $chunkChars + ${strideChars - 1}) div $strideChars")))
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0L), col("__n_chunks") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        col(textCol).substr(
          (lit(1L) + col("chunk_id") * strideChars).cast("int"),
          lit(chunkChars)).as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")).cast("long"))
  }

  /** Balanced shard manifest over a packed corpus ([[sequencePack]]'s
    * output): round-robin the EXAMPLES (the fixed-size training bins)
    * across `nShards` output shards — shard = example mod nShards, so
    * shard sizes are balanced within ±1 example BY CONSTRUCTION and,
    * since every example is exactly `ctxTokens` tokens (bar the global
    * last), token-balanced too. The writer-facing tail of the packing
    * pipeline: which (doc, example) slices land in which output file.
    *
    * Deterministic and partition-invariant (a pure function of the
    * example id — no RNG, no first-come-first-served state). Shape:
    * one bounded explode (Σ n_examples ≈ corpus_tokens/ctx + #docs
    * rows — already linear-sublinear in corpus bytes) and one
    * `nShards`-key aggregate with map-side combine; the distinct
    * example count per shard two-phase-aggregates the same stream.
    * Nothing else shuffles at any corpus size.
    */
  def shardManifest(packed: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    packed
      .select(col("doc_id"),
        explode(sequence(col("first_example"), col("last_example")))
          .as("example_id"))
      .withColumn("shard_id", pmod(col("example_id"), lit(nShards.toLong)))
      .groupBy(col("shard_id"))
      .agg(count_distinct(col("example_id")).as("n_examples"),
        count(lit(1)).as("n_doc_slices"),
        min(col("example_id")).as("first_example"),
        max(col("example_id")).as("last_example"))
  }

  /** SHARD INTEGRITY manifest — [[shardManifest]] extended with a
    * per-shard content DIGEST so a consumer can verify every shard
    * after transport (the WebDataset/export-manifest checksum
    * discipline). The digest is ORDER-INDEPENDENT by construction —
    * bit_xor of per-member md5-derived 60-bit hashes — because a
    * distributed producer cannot canonicalize member order cheaply,
    * and XOR over a set needs no sort, no overflow semantics, and
    * merges across partitions exactly (the mergeable-summary
    * discipline); a missing, duplicated, or substituted (doc, window)
    * member flips the digest.
    */
  def shardIntegrityManifest(packed: DataFrame, nShards: Int): DataFrame =
    shardMembers(packed, nShards)
      .groupBy(col("shard_id"))
      .agg(count_distinct(col("example_id")).as("n_examples"),
        count(lit(1)).as("n_doc_slices"),
        expr("bit_xor(h)").as("digest"))

  /** Consumer-side verification: recompute the digest AND the member
    * counts over the RECEIVED packing and compare per shard. A shard
    * missing entirely verifies false (null-safe compare), matching the
    * manifest's contract that silence is corruption. The counts are
    * not redundant with the digest: XOR cancels under even-multiplicity
    * corruption (a member present 3x contributes h^h^h = h, leaving
    * the digest intact while the shard is corrupt — the round-18
    * advice hole), so the verdict is digest ∧ n_examples ∧
    * n_doc_slices; a duplication that survives the XOR fails the
    * slice count, and a count-preserving substitution fails the
    * digest — the two checks cover each other's blind spots.
    */
  def verifyShards(manifest: DataFrame, packedReceived: DataFrame,
      nShards: Int): DataFrame =
    manifest.join(
        shardMembers(packedReceived, nShards).groupBy(col("shard_id"))
          .agg(expr("bit_xor(h)").as("received_digest"),
            count_distinct(col("example_id")).as("received_n_examples"),
            count(lit(1)).as("received_n_doc_slices")),
        Seq("shard_id"), "left")
      .withColumn("ok", col("digest") <=> col("received_digest") &&
        col("n_examples") <=> col("received_n_examples") &&
        col("n_doc_slices") <=> col("received_n_doc_slices"))

  private def shardMembers(packed: DataFrame, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    packed
      .select(col("doc_id"),
        explode(sequence(col("first_example"), col("last_example")))
          .as("example_id"))
      .withColumn("shard_id", pmod(col("example_id"), lit(nShards.toLong)))
      .withColumn("h", conv(substring(md5(concat(
          col("doc_id").cast("string"), lit(":"),
          col("example_id").cast("string"))), 1, 15), 16, 10)
        .cast("long"))
  }

  /** ORACLED exercise (q194): [[shardIntegrityManifest]] +
    * [[verifyShards]] with a PLANTED transport corruption — the
    * received member table loses every slice of doc 97 (row loss in
    * flight, the q151 deletion theme at the transport layer) — so
    * exactly the shards carrying doc 97 flag false and every other
    * shard verifies. DuckDB re-derives the packing, every member
    * hash, both xor digests, and every verdict.
    */
  def q194ShardIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val packed = sequencePack(Sources.documents(spark, dir), "doc_id",
      bpeishCount($"text"), 512L)
    val m = shardMembers(packed, 8).localCheckpoint(true)
    val sent = m.groupBy($"shard_id")
      .agg(count_distinct($"example_id").as("n_examples"),
        count(lit(1)).as("n_doc_slices"),
        expr("bit_xor(h)").as("digest"))
    val recv = m.filter($"doc_id" =!= 97)
      .groupBy($"shard_id").agg(expr("bit_xor(h)").as("received_digest"))
    val out = sent.join(recv, Seq("shard_id"))
      .withColumn("ok", $"digest" === $"received_digest")
      .orderBy($"shard_id")
      .localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftColumns
      .checkpointRdd(m).foreach(_.unpersist(false))
    out
  }

  /** ORACLED capstone (q196): CONTAMINATION BLAST RADIUS AT THE SHARD
    * LEVEL — the deployment question after q112 finds benchmark
    * contamination post-ship: which of the ALREADY-SHIPPED training
    * shards must be invalidated and re-shipped? (q151's deletion blast
    * radius with the decontamination gate as the trigger, rolled up to
    * the unit consumers actually re-download.) Composes three green
    * bodies: q112's containment hits name the tainted docs, q92's
    * packing places their slices in windows, q133's mod-shard map
    * names the shards; per shard the output reports example count,
    * tainted-doc and tainted-window counts, and the re-ship verdict.
    * Two simple aggregates instead of one triple-countDistinct (the
    * q142 Expand lesson: each extra countDistinct in one aggregate
    * multiplies the stream).
    */
  def q196ContaminationShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    val tr = docs.filter($"doc_id" % 97 =!= 0)
    val tainted = SpanDedup.decontaminate(tr,
        docs.filter($"doc_id" % 97 === 0), gramLen = 24)
      .select($"doc_id", lit(true).as("tainted"))
    val m = sequencePack(tr, "doc_id", bpeishCount($"text"), 512L)
      .select($"doc_id",
        explode(sequence($"first_example", $"last_example")).as("example_id"))
      .withColumn("shard_id", pmod($"example_id", lit(8L)))
      .join(tainted, Seq("doc_id"), "left")
      .withColumn("tainted", coalesce($"tainted", lit(false)))
      .localCheckpoint(true)
    val perExample = m.groupBy($"shard_id", $"example_id")
      .agg(max($"tainted").as("ex_tainted"))
      .groupBy($"shard_id")
      .agg(count(lit(1)).as("n_examples"),
        sum(when($"ex_tainted", 1L).otherwise(0L)).as("n_tainted_examples"))
    val perDoc = m.filter($"tainted")
      .select($"shard_id", $"doc_id").distinct()
      .groupBy($"shard_id").agg(count(lit(1)).as("n_tainted_docs"))
    val out = perExample.join(perDoc, Seq("shard_id"), "left")
      .select($"shard_id", $"n_examples",
        coalesce($"n_tainted_docs", lit(0L)).as("n_tainted_docs"),
        $"n_tainted_examples",
        ($"n_tainted_examples" > 0L).as("must_reship"))
      .orderBy($"shard_id")
      .localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftColumns
      .checkpointRdd(m).foreach(_.unpersist(false))
    out
  }

  /** ORACLED (q133) — [[shardManifest]] over q92's 512-token packing
    * of `documents`, 8 shards: every shard's example count, doc-slice
    * count, and example-id range hash-checked against DuckDB's
    * re-derivation (q92's green cumulative-sum CTE + generate_series
    * explode + the same mod-8 assignment).
    */
  def q133ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    shardManifest(
        sequencePack(Sources.documents(spark, dir), "doc_id",
          bpeishCount($"text"), 512L),
        nShards = 8)
      .orderBy($"shard_id")
  }

  /** ORACLED (q92) — sequence packing over `documents` at a 512-token
    * context: per-doc example span, checked against DuckDB's global
    * window cumulative sum (the single-node formulation of the same
    * prefix sum).
    */
  def q92SequencePack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sequencePack(Sources.documents(spark, dir), "doc_id",
        bpeishCount($"text"), 512L)
      .orderBy($"doc_id")
  }

  /** ORACLED (q93) — deterministic 80/10/10 hash split of `documents`;
    * DuckDB reproduces the md5-hex bucket bit-for-bit, so the oracle
    * checks the full assignment, not just the counts.
    */
  def q93HashSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    hashSplit(Sources.documents(spark, dir), "doc_id")
      .select($"doc_id", $"bucket", $"split")
      .orderBy($"doc_id")
  }

  /** ORACLED (q94) — 128-char chunks every 96 chars over `documents`
    * (32-char overlap); DuckDB reproduces every chunk string exactly.
    */
  def q94ChunkDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkDocs(Sources.documents(spark, dir), "doc_id", "text", 128, 96)
      .orderBy($"doc_id", $"chunk_id")
  }

  /** LEAKAGE-FREE train/val/test split: [[hashSplit]]'s deterministic
    * md5 assignment keyed by the document's NEAR-DUP CLUSTER id instead
    * of its own id, so every member of a duplicate family lands in the
    * same split. Splitting per-document leaks near-copies of training
    * rows into the test set — the evaluation-inflating failure mode
    * benchmark-decontamination work calls train-test contamination
    * (e.g. Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better" §5, measures exactly this). Clusters come
    * from the engine's own exact-Jaccard components
    * ([[Similarity.connectedComponents]], the q43 machinery);
    * singletons (no near-dup) fall back to their own id, reproducing
    * [[hashSplit]] for clean documents.
    *
    * 100 TB posture: the clustering arm is q43's audited shape
    * (df-capped inverted index, keyed shuffles, iterated small joins);
    * the split itself is a pure map stage over (doc, cluster) — one
    * broadcast-free left join against the cluster table (near-dup
    * members only, ≪ corpus) and an md5 per row.
    */
  def leakageFreeSplit(docs: DataFrame, idCol: String = "doc_id",
      dfCap: Int = 100, trainPermille: Int = 800,
      valPermille: Int = 100): DataFrame = {
    val cc = Similarity.connectedComponents(
      Similarity.ngramJaccardPairs(docs, dfCap), "doc_a", "doc_b")
    val clustered = docs
      .join(cc.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    hashSplit(clustered, "cluster_id", trainPermille, valPermille)
  }

  /** LENGTH-BUCKETED BATCH MANIFEST: group examples into fixed-size
    * batches of near-equal sequence length so per-batch padding
    * (batchSize·max_len − Σ len) stays small — the token-bucketing
    * batcher every padded fine-tuning pipeline uses (public precedent:
    * fairseq/HF `group_by_length`; sequence PACKING (q92) is the
    * pretraining alternative, this is the padded-batch one). Documents
    * land in a length bucket (`n_tokens // bucketWidth`), are ranked
    * inside it by (n_tokens DESC, id), and cut into batches of
    * `batchSize`; the manifest reports each batch's padding waste on
    * the tie-proof micro grid.
    *
    * 100 TB posture: NO global sort — the only window partitions by
    * length bucket (bounded spread inside each), so ranking
    * parallelizes across buckets; everything after is one bounded
    * (bucket, batch) aggregate. Deterministic: batch composition is a
    * pure function of (n_tokens, id). If one bucket dominates (near-
    * uniform lengths), subdivide deterministically by id-hash salt
    * before ranking — same stats, more parallelism — at the cost of a
    * different (still deterministic) batch composition.
    */
  def lengthBucketedBatches(docs: DataFrame, idCol: String, tokens: Column,
      batchSize: Int = 8, bucketWidth: Int = 32): DataFrame = {
    require(batchSize >= 1 && bucketWidth >= 1,
      s"lengthBucketedBatches: batchSize=$batchSize bucketWidth=$bucketWidth")
    val base = docs.select(col(idCol), tokens.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket", floor(col("n_tokens") / bucketWidth).cast("long"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("n_tokens").desc, col(idCol))
    base
      .withColumn("batch_in_bucket",
        floor((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy(col("bucket"), col("batch_in_bucket"))
      .agg(count(lit(1)).as("n_examples"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("padded_tokens", col("n_examples") * col("max_len"))
      .withColumn("waste_tokens", col("padded_tokens") - col("sum_tokens"))
      .withColumn("waste_frac",
        floor(col("waste_tokens").cast("double") * 1e6 / col("padded_tokens")
          + 0.5) / 1e6)
      .orderBy(col("bucket"), col("batch_in_bucket"))
  }

  /** ORACLED (q141): [[lengthBucketedBatches]] over `documents` at
    * (batchSize 8, bucketWidth 32) with the bpe-ish token count —
    * DuckDB re-derives buckets, in-bucket ranks, batch cuts, and every
    * padding stat; the waste fraction uses the tie-proof micro floor.
    */
  def q141LengthBatches(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lengthBucketedBatches(Sources.documents(spark, dir), "doc_id",
      bpeishCount($"text"))
  }

  /** SPLIT-LEAKAGE AUDIT: measure, for a split scheme, how much
    * verbatim text the test split shares with the train split — the
    * quantity [[leakageFreeSplit]] exists to reduce. For each scheme
    * (per-document md5 vs cluster-keyed md5), counts the distinct
    * `gramLen`-char grams present on BOTH sides of the train/test
    * boundary and the test documents carrying at least one such gram
    * (Lee et al. 2022 §5's train-test overlap measurement, expressed
    * as a split audit). Ships as a 2-row report so a pipeline can
    * assert its split hygiene before training, not after.
    *
    * 100 TB posture: the gram stream is the q100/q112 Lee-et-al shape
    * — one explode, keyed shuffles on the gram, distinct-key joins.
    * The gram key is xxhash64(gram) (round 21): every exchange, both
    * distinct aggregates, and the semi join carry 8-byte longs instead
    * of `gramLen`-char strings — the q100/q21 hash-the-key-before-the-
    * shuffle trade (distinct counts are invariant under injective
    * hashing; the ~n²/2⁶⁵ collision odds are the same accepted trade,
    * and the DuckDB oracle — which re-derives the counts from literal
    * grams — still hash-matches, i.e. zero collisions on the fixture
    * at every SF). The audit runs both schemes off ONE shared gram
    * stream.
    */
  def splitLeakageAudit(docs: DataFrame, gramLen: Int = 24): DataFrame = {
    import docs.sparkSession.implicits._
    // NOT persisted, deliberately (round-21 A/B, after r20's): the
    // gram stream is re-derived per consumer, but it is a cheap fused
    // map stage (explode+substr+hash) and persisting it measured EQUAL
    // (9.6 vs 9.3 s); the clustered assignment's expensive CC subtree
    // is already frozen by connectedComponents' internal checkpoints
    // at construction time, so it never re-executes either.
    val g = SpanDedup.grams(docs, gramLen)
      .select($"doc_id", xxhash64($"gram").as("gram"))
    def one(assign: DataFrame, scheme: String): DataFrame = {
      val sizes = assign.agg(
        sum(when($"split" === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when($"split" === "test", 1L).otherwise(0L)).as("n_test"))
      val ag = g.join(assign, Seq("doc_id"))
      val trainG = ag.filter($"split" === "train").select($"gram").distinct()
      val leaked = ag.filter($"split" === "test").select($"doc_id", $"gram")
        .join(trainG, Seq("gram"), "left_semi")
      // Dual countDistinct in one agg plans an Expand (2× the leaked
      // stream through the aggregate) — MEASURED CHEAPER than the
      // alternatives at sf0.1 (9.1 s vs 14.3 s for dedup-pairs-once +
      // two single-column distincts: the distinct agg's map-side
      // partial dedup shrinks the doubled stream before any exchange,
      // while the split form pays a pair-keyed shuffle, a checkpoint
      // write, and two more scans). Kept deliberately; see PLANS.md.
      val stats = leaked.agg(
        countDistinct($"gram").as("shared_grams"),
        countDistinct($"doc_id").as("leaked_test_docs"))
      sizes.crossJoin(stats).select(lit(scheme).as("scheme"), $"n_train",
        $"n_test", $"shared_grams", $"leaked_test_docs")
    }
    val naive = hashSplit(docs, "doc_id").select($"doc_id", $"split")
    val clustered = leakageFreeSplit(docs).select($"doc_id", $"split")
    one(naive, "doc_hash")
      .unionByName(one(clustered, "cluster_hash"))
      .orderBy($"scheme")
  }

  /** ORACLED (q142): [[splitLeakageAudit]] over `documents` at 24-char
    * grams — DuckDB re-derives both split schemes (q93/q140's green
    * fragments), the shared gram stream, and all four counts per
    * scheme.
    */
  def q142SplitLeakage(spark: SparkSession, dir: String): DataFrame =
    splitLeakageAudit(Sources.documents(spark, dir))

  /** ORACLED (q140): [[leakageFreeSplit]] over `documents` — DuckDB
    * re-derives the q43 cluster components (recursive reachability)
    * and the q93 md5 buckets keyed by cluster id; every assignment is
    * hash-checked, and the defining invariant (one split per cluster)
    * is therefore oracle-enforced, not just spec-asserted.
    */
  def q140LeakageFreeSplit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    leakageFreeSplit(Sources.documents(spark, dir))
      .select($"doc_id", $"cluster_id", $"bucket", $"split")
      .orderBy($"doc_id")
  }

  /** ZERO-SHUFFLE per-epoch training-order key: a Feistel-network
    * pseudo-random permutation of the id domain, keyed by the epoch —
    * the at-scale alternative to `ORDER BY rand()` (a full corpus
    * sort PER EPOCH). Luby & Rackoff 1988 prove ≥3 Feistel rounds of a
    * keyed round function give a pseudo-random permutation; streaming-
    * dataset loaders (e.g. MosaicML's StreamingDataset design) exploit
    * exactly this "position is a pure function of (id, epoch)" property
    * for deterministic, resumable shuffles. Training order for epoch e
    * = ascending [[epochShuffleKey]]; because the map is a BIJECTION of
    * [0, 2^(2·halfBits)), distinct ids always get distinct keys — no
    * collision handling, no sort to build the manifest, resume = "skip
    * keys below the checkpoint".
    *
    * Mechanics: id splits into halfBits-bit halves (L, R); `rounds`
    * Feistel rounds of (L, R) → (R, L ⊕ F(R, round, epoch)) with the
    * round function F = the q93 md5-conv idiom (first 8 md5 hex chars
    * of "R:round:epoch" mod 2^halfBits — bit-identical in DuckDB);
    * key = L·2^halfBits + R. All integer-exact; key < 2^(2·halfBits)
    * so the default 20/20 split stays far from BIGINT overflow while
    * covering ~1.1e12 ids (raise halfBits to 31 for 4.6e18).
    *
    * Requires 0 ≤ id < 2^(2·halfBits) for the bijection argument (ids
    * above the domain alias back into it via the initial mod).
    *
    * 100 TB posture: a PURE MAP column — no shuffle, no window, no
    * state; the epoch fan-out is a bounded in-row explode. The corpus
    * is never re-ordered at rest; consumers range-scan the manifest by
    * key.
    */
  def epochShuffleKey(id: Column, epoch: Column, halfBits: Int = 20,
      rounds: Int = 4): Column = {
    require(halfBits >= 2 && halfBits <= 31, s"halfBits out of range: $halfBits")
    require(rounds >= 3, s"Luby-Rackoff needs >= 3 rounds: $rounds")
    val m = 1L << halfBits
    var l = shiftright(id, halfBits) % m
    var r = id % m
    for (rd <- 1 to rounds) {
      val f = conv(substring(md5(concat_ws(":",
        r.cast("string"), lit(rd).cast("string"), epoch.cast("string"))),
        1, 8), 16, 10).cast("long") % m
      val nl = r
      val nr = l.bitwiseXOR(f)
      l = nl
      r = nr
    }
    l * m + r
  }

  /** ORACLED exercise (q146): [[epochShuffleKey]] for two epochs over
    * `documents` — DuckDB re-derives the unrolled Feistel rounds
    * (md5-conv round function, xor(), the final recomposition), every
    * key hash-checked. The q141/q133 manifest tail consumes the key in
    * place of a rand() sort.
    */
  def q146EpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.documents(spark, dir)
      .select($"doc_id", explode(array(lit(0L), lit(1L))).as("epoch"))
      .withColumn("order_key", epochShuffleKey($"doc_id", $"epoch"))
      .select($"epoch", $"doc_id", $"order_key")
      .orderBy($"epoch", $"doc_id")
  }

  /** GDPR / machine-unlearning BLAST-RADIUS audit over a PACKED corpus:
    * given a delete-list, which fixed-size training examples are
    * TAINTED (contain ≥1 token of a deleted document), how many tokens
    * inside each must be erased, and how many surviving tokens the
    * repack must re-home. Concat-and-chunk packing smears documents
    * across example boundaries, so deleting a document invalidates
    * every example its token interval touches — the data-engineering
    * half of "right to be forgotten" for a trained-corpus manifest
    * (the packing analogue of q115's surgical excision).
    *
    * Input: [[sequencePackWithOffsets]] output plus an `is_deleted`
    * boolean. Per-doc-per-example token mass is pure interval algebra
    * on the global tape: min(doc_end, ex_end) − max(doc_start,
    * ex_start) + 1 — integer-exact.
    *
    * 100 TB posture: one bounded explode (a doc only touches
    * ⌈n/ctx⌉+1 examples), a LEFT SEMI join against the distinct
    * tainted-example set (delete lists are ≪ corpus, so the set is
    * small — AQE broadcasts it), one aggregate per tainted example.
    * Nothing corpus-sized collects or re-sorts.
    */
  def deletionBlastRadius(packed: DataFrame, isDeleted: Column,
      ctxTokens: Long): DataFrame = {
    import packed.sparkSession.implicits._
    require(ctxTokens >= 1, s"ctxTokens must be >= 1, got $ctxTokens")
    val spans = packed.withColumn("is_deleted", isDeleted)
      .select($"is_deleted", $"n_tokens", $"tok_start",
        explode(sequence($"first_example", $"last_example"))
          .as("example_id"))
      .withColumn("tok_in_ex",
        least($"tok_start" + $"n_tokens" - 1,
            ($"example_id" + 1) * lit(ctxTokens) - 1)
          - greatest($"tok_start", $"example_id" * lit(ctxTokens)) + 1)
    val tainted = spans.filter($"is_deleted")
      .select($"example_id").distinct()
    spans.join(tainted, Seq("example_id"), "left_semi")
      .groupBy($"example_id")
      .agg(
        sum(when($"is_deleted", $"tok_in_ex").otherwise(0L))
          .as("deleted_tokens"),
        sum(when(!$"is_deleted", $"tok_in_ex").otherwise(0L))
          .as("surviving_tokens"),
        count(lit(1)).as("n_docs_touched"),
        sum(when(!$"is_deleted", 1L).otherwise(0L)).as("n_surviving_docs"))
  }

  /** ORACLED exercise (q151): [[deletionBlastRadius]] over the q92
    * packing (512-token examples, bpe-ish counts) with every
    * doc_id % 37 == 5 document deleted — DuckDB re-derives the prefix
    * sums, the interval algebra, and every per-example token mass.
    */
  def q151DeletionBlast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val packed = sequencePackWithOffsets(Sources.documents(spark, dir),
      "doc_id", bpeishCount($"text"), 512L)
    deletionBlastRadius(packed, $"doc_id" % 37 === 5, 512L)
      .orderBy($"example_id")
  }

  /** The REPACK that [[deletionBlastRadius]] sizes: re-run the packing
    * prefix sum over the SURVIVORS and report, per surviving doc, its
    * old vs new example coordinates and whether it moved. The
    * concat-and-chunk stability property falls out of the prefix sum:
    * every document whose tape offset precedes the FIRST deleted token
    * keeps identical coordinates (its prefix is untouched), so an
    * incremental repacker only rewrites the tape suffix — the number
    * this query puts a boolean on per doc (spec-asserted; the oracle
    * hash-checks every coordinate pair).
    *
    * 100 TB posture: two [[sequencePack]] passes (each two thin scans
    * + an O(#partitions) collect) and one id-keyed join — no new
    * shuffle class; the delete predicate prunes at the scan.
    */
  def repackAfterDeletion(docs: DataFrame, idCol: String,
      tokensCol: Column, isDeleted: Column, ctxTokens: Long): DataFrame = {
    val old = sequencePackWithOffsets(docs, idCol, tokensCol, ctxTokens)
      .select(col(idCol), col("n_tokens"), col("tok_start"),
        col("first_example").as("old_first"),
        col("last_example").as("old_last"))
    val fresh = sequencePack(docs.filter(!isDeleted), idCol, tokensCol,
        ctxTokens)
      .select(col(idCol),
        col("first_example").as("new_first"),
        col("last_example").as("new_last"))
    old.join(fresh, Seq(idCol))
      .withColumn("moved",
        col("old_first") =!= col("new_first") ||
          col("old_last") =!= col("new_last"))
      .select(col(idCol), col("n_tokens"), col("tok_start"),
        col("old_first"), col("old_last"), col("new_first"),
        col("new_last"), col("moved"))
  }

  /** ORACLED exercise (q153): [[repackAfterDeletion]] under the q151
    * delete list (%37==5) at the q92 packing — DuckDB re-derives BOTH
    * prefix sums; every surviving doc's old and new coordinates and
    * the moved flag are hash-checked. Together with q151 this is the
    * full unlearning loop: size the blast radius, then repack and
    * prove how little moved.
    */
  def q153RepackDeleted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    repackAfterDeletion(Sources.documents(spark, dir), "doc_id",
        bpeishCount($"text"), $"doc_id" % 37 === 5, 512L)
      .orderBy($"doc_id")
  }
}
