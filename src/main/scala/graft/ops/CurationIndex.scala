package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the ADMISSION-GATE state ([[Streaming.admissionStream]]'s
  * static side) — the M7 save/load contract applied to curation
  * indexes: the dup-gram set (q100's first half), the benchmark
  * gram set (q112's gate), and the [[Quality.CharLm]] bigram model
  * (q113's gate) written as one parquet directory tree, so the state
  * a batch pass builds on the full corpus is loadable by any later
  * session — the batch-curates / stream-scores deployment split
  * without recomputing a corpus-sized pass per stream start.
  *
  * Layout: `path/dup_grams` (one long column), `path/bench_grams`
  * (same), `path/lm_bigrams` (key, count), `path/lm_meta_ctx`
  * (key, count), `path/lm_meta` (vocab scalar). Everything is
  * columnar and inspectable with the same tools as any other table;
  * the two gram sets are corpus-dependent but SMALL (dup grams on
  * clean corpora, bench grams by definition), and the LM tables are
  * alphabet-bounded.
  */
object CurationIndex {

  /** On-disk format version, stamped into `lm_meta` and checked at
    * load. Version 2 = 64-bit CODE-POINT-packed bigram keys
    * (cp << 32 | cp); the unversioned original packed 16-bit UTF-16
    * units (char << 16 | char). A v1 index loads into a v2 reader
    * without any type error (Int upcasts to Long) but NO key ever
    * matches the code-point lookup, so every streamed document would
    * silently score as all-unseen bigrams — the marker turns that
    * silent wrong-score into a descriptive load failure.
    */
  private val FormatVersion = 2L

  final case class Index(dupGrams: Array[Long], benchGrams: Array[Long],
      lm: Quality.CharLm)

  /** Build the three gate states from their corpora and persist. The
    * heavy work (the dup-gram aggregate over the reference corpus) is
    * exactly q100's first half — paid once here, at layout time.
    */
  def write(spark: SparkSession, path: String, reference: DataFrame,
      bench: DataFrame, lmReference: DataFrame, gramLen: Int = 24): Unit = {
    SpanDedup.dupGramHashes(reference, gramLen)
      .write.mode("overwrite").parquet(s"$path/dup_grams")
    SpanDedup.benchGramHashes(bench, gramLen)
      .write.mode("overwrite").parquet(s"$path/bench_grams")
    writeLm(spark, path, Quality.charLm(lmReference))
  }

  /** Persist ONE [[Quality.CharLm]] standalone — same layout and
    * format marker as [[write]]'s LM subtree. The Moore–Lewis gate
    * ([[Streaming.mooreLewisStream]]) deploys with TWO models —
    * in-domain and general — each under its own directory; [[write]]
    * bundles a single LM with the gram gates.
    */
  def writeLm(spark: SparkSession, path: String,
      lm: Quality.CharLm): Unit = {
    import spark.implicits._
    lm.bigramKeys.zip(lm.bigramCounts).toSeq.toDF("key", "count")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/lm_bigrams")
    lm.ctxKeys.zip(lm.ctxCounts).toSeq.toDF("key", "count")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/lm_meta_ctx")
    Seq((lm.vocab, FormatVersion)).toDF("vocab", "format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/lm_meta")
  }

  /** Load an index written by [[write]] into the driver-side form
    * [[Streaming.admissionStream]] broadcasts. The collects are
    * bounded by the same arguments that let the stream broadcast
    * them (small gram sets, alphabet-bounded model).
    */
  def load(spark: SparkSession, path: String): Index = {
    import spark.implicits._
    val dup = spark.read.parquet(s"$path/dup_grams")
      .as[Long].collect().sorted
    val bench = spark.read.parquet(s"$path/bench_grams")
      .as[Long].collect().sorted
    Index(dup, bench, loadLm(spark, path))
  }

  /** Load a [[Quality.CharLm]] written by [[writeLm]] (or [[write]]'s
    * LM subtree), enforcing the format marker.
    */
  def loadLm(spark: SparkSession, path: String): Quality.CharLm = {
    import spark.implicits._
    val big = spark.read.parquet(s"$path/lm_bigrams")
      .select($"key", $"count").as[(Long, Long)].collect().sortBy(_._1)
    val ctx = spark.read.parquet(s"$path/lm_meta_ctx")
      .select($"key", $"count").as[(Int, Long)].collect().sortBy(_._1)
    // Descriptive guard instead of head()'s opaque NoSuchElementException
    // on a truncated/foreign directory; the vocab>0 check backstops
    // charLm's own write-time require for indexes written before it
    // existed (vocab 0 would Infinity-score and silently reject every
    // streamed document).
    val meta = spark.read.parquet(s"$path/lm_meta")
    require(meta.columns.contains("format"),
      s"CurationIndex.loadLm($path): lm_meta carries no format marker — " +
        "the index predates the 64-bit code-point bigram keys (its " +
        "16-bit-packed keys would silently never match, scoring every " +
        "document as all-unseen); rebuild it with CurationIndex.write/writeLm")
    val metaRows = meta
      .select($"vocab", $"format".cast("long")).as[(Long, Long)].collect()
    require(metaRows.length == 1 && metaRows.head._1 > 0,
      s"CurationIndex.loadLm($path): lm_meta must hold exactly one positive " +
        s"vocab row (got ${metaRows.mkString("[", ",", "]")}) — the index " +
        "was written from an empty/all-short LM reference or is corrupt")
    require(metaRows.head._2 == FormatVersion,
      s"CurationIndex.loadLm($path): format ${metaRows.head._2} != " +
        s"$FormatVersion — rebuild the index with this build's write()")
    Quality.CharLm(big.map(_._1), big.map(_._2),
      ctx.map(_._1), ctx.map(_._2), metaRows.head._1)
  }

  /** Persist the PERCEPTUAL-HASH survivor index ([[Images
    * .perceptualDedup]]'s survivor rows) as `path/phash_hashes`
    * (img_id, phash) + a format-marked meta — the frozen side
    * [[Images.perceptualDedupDelta]] probes, so daily image ingest
    * never re-hashes the accumulated corpus. Stays a DataFrame end to
    * end (never collected): unlike the gram/LM gates this table is
    * survivor-count-sized — corpus-scale on an image crawl — and the
    * delta arm joins it, so AQE decides broadcast per batch.
    */
  def writePhash(spark: SparkSession, path: String,
      survivors: DataFrame): Unit = {
    import spark.implicits._
    survivors.filter(col("is_survivor"))
      .select(col("img_id"), col("phash"))
      .write.mode("overwrite").parquet(s"$path/phash_hashes")
    Seq(FormatVersion).toDF("format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/phash_meta")
  }

  /** Load an index written by [[writePhash]], enforcing the format
    * marker (a marker-less or foreign-version directory would probe
    * hashes from a different kernel and silently match nothing).
    */
  def loadPhash(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/phash_meta")
    require(meta.columns.contains("format"),
      s"CurationIndex.loadPhash($path): phash_meta carries no format marker")
    val v = meta.select($"format".cast("long")).as[Long].collect()
    require(v.length == 1 && v.head == FormatVersion,
      s"CurationIndex.loadPhash($path): format ${v.mkString(",")} != " +
        s"$FormatVersion — rebuild the index with this build's writePhash")
    spark.read.parquet(s"$path/phash_hashes").select($"img_id", $"phash")
  }

  /** Persist a learned BPE merge table ([[Bpe.Merges]], [[Bpe.fit]]'s
    * output) as `path/bpe_merges` (rank, a, b) plus a format-marked
    * meta — the fit-once/apply-many production shape (the reference
    * pickles every fitted model and reloads it,
    * /root/reference/main.py:345-363): a later session [[loadBpe]]s
    * the table and tokenizes NEW batches through [[Bpe.bpeCount]]
    * without ever refitting from the corpus. The table is `numMerges`
    * string pairs — kilobytes, the bounded-collect class.
    */
  def writeBpe(spark: SparkSession, path: String,
      merges: Bpe.Merges): Unit = {
    import spark.implicits._
    merges.pairs.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bpe_merges")
    Seq(FormatVersion).toDF("format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bpe_meta")
  }

  /** Load a merge table written by [[writeBpe]]: format-marker
    * enforced, ranks must be exactly 0..n-1 — RANK ORDER IS THE
    * ALGORITHM ([[Bpe]]'s rank-replay exactness argument), so a gap or
    * duplicate would silently tokenize differently, not fail.
    */
  def loadBpe(spark: SparkSession, path: String): Bpe.Merges = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/bpe_meta")
    require(meta.columns.contains("format"),
      s"CurationIndex.loadBpe($path): bpe_meta carries no format marker")
    val v = meta.select($"format".cast("long")).as[Long].collect()
    require(v.length == 1 && v.head == FormatVersion,
      s"CurationIndex.loadBpe($path): format ${v.mkString(",")} != " +
        s"$FormatVersion — rebuild the table with this build's writeBpe")
    val rows = spark.read.parquet(s"$path/bpe_merges")
      .select($"rank".cast("int"), $"a", $"b").as[(Int, String, String)]
      .collect().sortBy(_._1)
    require(rows.iterator.map(_._1).zipWithIndex.forall(p => p._1 == p._2),
      s"CurationIndex.loadBpe($path): ranks must be exactly 0..n-1 " +
        s"(got ${rows.length} rows) — the table is truncated or corrupt")
    Bpe.Merges(rows.map(r => (r._2, r._3)).toIndexedSeq)
  }

  /** Persist a unigram-LM vocab ([[Unigram.Vocab]], either fitting
    * arm's output) as `path/unigram_pieces` (piece, cost_micro) plus a
    * format-marked meta carrying `max_len` — same fit-once/apply-many
    * contract as [[writeBpe]]: [[loadUnigram]] feeds the SAME
    * [[Unigram.tokenize]]/[[Unigram.unigramCount]] kernels, so a new
    * batch segments identically to the fitting session without a
    * corpus pass. Costs are already on the integer micro grid —
    * round-tripping is exact by construction.
    */
  def writeUnigram(spark: SparkSession, path: String,
      vocab: Unigram.Vocab): Unit = {
    import spark.implicits._
    vocab.pieces.toSeq.toDF("piece", "cost_micro")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/unigram_pieces")
    Seq((vocab.maxLen, FormatVersion)).toDF("max_len", "format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/unigram_meta")
  }

  /** Load a vocab written by [[writeUnigram]], enforcing the format
    * marker, piece uniqueness (a duplicate piece would keep an
    * arbitrary cost), and that `max_len` covers the longest piece (a
    * smaller lookback would silently skip long pieces in the DP).
    */
  def loadUnigram(spark: SparkSession, path: String): Unigram.Vocab = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/unigram_meta")
    require(meta.columns.contains("format"),
      s"CurationIndex.loadUnigram($path): unigram_meta carries no format marker")
    val metaRows = meta.select($"max_len".cast("int"),
      $"format".cast("long")).as[(Int, Long)].collect()
    require(metaRows.length == 1 && metaRows.head._2 == FormatVersion,
      s"CurationIndex.loadUnigram($path): bad meta " +
        s"${metaRows.mkString("[", ",", "]")} — rebuild with this " +
        "build's writeUnigram")
    val rows = spark.read.parquet(s"$path/unigram_pieces")
      .select($"piece", $"cost_micro".cast("long")).as[(String, Long)]
      .collect()
    require(rows.nonEmpty,
      s"CurationIndex.loadUnigram($path): empty piece table")
    require(rows.map(_._1).distinct.length == rows.length,
      s"CurationIndex.loadUnigram($path): duplicate pieces — corrupt table")
    val maxPiece = rows.iterator.map(_._1.length).max
    require(maxPiece <= metaRows.head._1,
      s"CurationIndex.loadUnigram($path): piece of length $maxPiece " +
        s"exceeds max_len ${metaRows.head._1} — corrupt meta")
    Unigram.Vocab(rows.toMap, metaRows.head._1)
  }

  /** Persist a [[Similarity.PqIndex]] (the q99 product-quantization
    * codebooks) as `path/pq_codebooks` (sub, code, centroid) plus a
    * format-marked meta — the FAISS write_index analogue for the PQ
    * arm, completing the fit-once/apply-many story beside the on-disk
    * IVF index ([[Similarity.writeIvfIndex]]): a later session
    * [[loadPq]]s the codebooks and encodes/searches NEW batches through
    * the unchanged [[Similarity.pqEncode]]/ADC kernels without ever
    * refitting. m·k rows of subDim doubles — kilobytes, the
    * bounded-collect class.
    */
  /** Persist the per-language CCNet deployment state — the
    * [[Quality.ccnetLangState]] pair: the (lang, bigram, c2) model
    * count table (everything the models ARE; cnt₁/V derive from it)
    * and the (lang, c1, c2) cutoff table — as
    * `path/ccnet_lang_bigrams` plus a format-marked
    * `path/ccnet_lang_cuts`. Both frames are broadcast-bounded
    * (#languages × alphabet² and #languages × 2 longs), so the
    * coalesce(1) is safe by construction. Completes the L61
    * fit-once/apply-many contract for the L64 family: a later session
    * [[loadCcnetLangState]]s and buckets NEW batches through the
    * unchanged [[Quality.ccnetBucketsByLangFrom]] with zero refit.
    */
  def writeCcnetLang(spark: SparkSession, path: String,
      cnt2: DataFrame, cuts: DataFrame): Unit = {
    cnt2.select(col("lang"), col("bigram"), col("c2").cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$path/ccnet_lang_bigrams")
    cuts.select(col("lang"), col("c1").cast("long"), col("c2").cast("long"))
      .withColumn("format", lit(FormatVersion))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$path/ccnet_lang_cuts")
  }

  /** Load a state pair written by [[writeCcnetLang]], enforcing the
    * format marker and that every cutoff language has model rows (a
    * cutoff whose language lost its counts would silently score
    * nothing — fail loudly instead). Languages with models but no
    * cutoffs stay loadable: the apply join drops them, the documented
    * unmodeled-language contract.
    */
  def loadCcnetLangState(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val cutsRaw = spark.read.parquet(s"$path/ccnet_lang_cuts")
    require(cutsRaw.columns.contains("format"),
      s"CurationIndex.loadCcnetLangState($path): ccnet_lang_cuts " +
        "carries no format marker")
    val fmts = cutsRaw.select(col("format").cast("long"))
      .distinct().as[Long].collect()
    require(fmts.sameElements(Array(FormatVersion)),
      s"CurationIndex.loadCcnetLangState($path): format " +
        s"${fmts.mkString(",")} != $FormatVersion — rebuild with this " +
        "build's writeCcnetLang")
    val bigrams = spark.read.parquet(s"$path/ccnet_lang_bigrams")
    val cuts = cutsRaw.drop("format")
    val orphaned = cuts.select("lang").distinct()
      .join(bigrams.select("lang").distinct(), Seq("lang"), "left_anti")
      .as[String].collect()
    require(orphaned.isEmpty,
      s"CurationIndex.loadCcnetLangState($path): cutoffs for " +
        s"languages with no model rows: ${orphaned.mkString(",")} — " +
        "corrupt state")
    (bigrams, cuts)
  }

  /** Persist a BM25 inverted index ([[Similarity.bm25TermFreqs]]'s
    * (doc_id, term, tf) table) as `path/bm25_tf` plus a format-marked
    * meta carrying the doc count for a load-time completeness check.
    * The index is CORPUS-SIZED (the phash-index class, not the
    * alphabet-bounded LM class) — written at its natural
    * parallelism, NO coalesce. Build once, serve query batches
    * forever through the unchanged [[Similarity.bm25TopKFrom]].
    */
  def writeBm25(spark: SparkSession, path: String, tf: DataFrame): Unit = {
    tf.select(col("doc_id").cast("long"), col("term"),
        col("tf").cast("long"))
      .write.mode("overwrite").parquet(s"$path/bm25_tf")
    // meta doc count from the JUST-WRITTEN table, not the input plan:
    // re-executing `tf` here would run the whole corpus explode a
    // second time when the caller hands a lazy build (the round-18
    // advice); the written parquet is a one-column scan of the index
    writeBm25MetaFromDisk(spark, path)
  }

  private def writeBm25MetaFromDisk(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val nDocs = spark.read.parquet(s"$path/bm25_tf")
      .select(countDistinct(col("doc_id"))).as[Long].head()
    Seq((nDocs, FormatVersion)).toDF("n_docs", "format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bm25_meta")
  }

  /** Append a NEW batch's (doc_id, term, tf) rows to a persisted BM25
    * index — incremental maintenance without rewriting the accumulated
    * corpus-sized table (new parquet segments land beside the old; the
    * 1-row meta is rewritten with the new doc count). CONTRACT: the
    * appended doc_ids must be new — an id already indexed would split
    * its rows across segments and double-count df; enforced against
    * the meta by doc-count arithmetic at the next [[loadBm25]] only if
    * counts disagree, so the caller owns id discipline (the
    * [[Similarity.knnJoinIvf]] frozen-quantizer append posture).
    */
  def appendBm25(spark: SparkSession, path: String, newTf: DataFrame): Unit = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/bm25_meta")
      .select(col("n_docs").cast("long"), col("format").cast("long"))
      .as[(Long, Long)].collect()
    require(meta.length == 1 && meta.head._2 == FormatVersion,
      s"CurationIndex.appendBm25($path): bad meta — not a writeBm25 index")
    // the batch count is taken from newTf (BATCH-sized, not the corpus
    // recount loadBm25's verify pays) and ADDED arithmetically: if a
    // caller violates the new-ids contract, meta (which counted the
    // duplicate twice) disagrees with the on-disk distinct count and
    // the next verifying load fails loudly — recounting from disk here
    // would paper over exactly that corruption
    val added = newTf.select(countDistinct(col("doc_id"))).as[Long].head()
    newTf.select(col("doc_id").cast("long"), col("term"),
        col("tf").cast("long"))
      .write.mode("append").parquet(s"$path/bm25_tf")
    Seq((meta.head._1 + added, FormatVersion)).toDF("n_docs", "format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bm25_meta")
  }

  /** SEGMENT COMPACTION for an appended BM25 index: [[appendBm25]]
    * accumulates parquet segments forever (every batch adds files —
    * the classic LSM/Lucene small-segment problem: posting scans pay
    * per-file open/footer costs that grow with append count, not data
    * size). Compaction rewrites the accumulated table into
    * ~`targetFileBytes` files, hash-clustered and sorted by (term,
    * doc_id) — posting lists become contiguous runs, which both
    * compresses better and serves term-probe scans from fewer pages.
    * CONTENT-invisible by contract: same rows, same meta (the doc
    * count is layout-independent and deliberately untouched, so a
    * prior new-ids-contract violation still trips the verifying load
    * after compaction rather than being laundered by a recount). q201
    * proves serve-equivalence against the fresh-build oracle; the
    * spec pins the file-count drop and the row multiset.
    *
    * Swap discipline: the rewrite lands in `bm25_tf_compacting`, then
    * two renames swap it in (`bm25_tf` → `bm25_tf_old` → deleted) —
    * the read plan is fully materialized by the write action before
    * the source moves (the FAILED_READ_FILE rule), and a crash
    * between renames leaves `bm25_tf_old` on disk for manual
    * recovery. File budget comes from the O(metadata) segment-size
    * listing, not a data pass.
    *
    * ATOMICITY ASSUMPTION: the rename swap is atomic on HDFS and local
    * filesystems only. Object stores (s3a://) implement rename as
    * copy+delete — run compaction against such an index only behind an
    * external serving lock, or compact a copy and re-point consumers.
    */
  def compactBm25(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    val meta = spark.read.parquet(s"$path/bm25_meta")
    require(meta.columns.contains("format"),
      s"CurationIndex.compactBm25($path): bm25_meta carries no format marker")
    val tfPath = new org.apache.hadoop.fs.Path(s"$path/bm25_tf")
    // Resolve the FS from the index path itself, NOT FileSystem.get
    // (advisor round 19): the latter returns the DEFAULT filesystem, so
    // an index on s3a:// (or file:// under an HDFS default) would have
    // its listStatus/renames issued against the wrong tree.
    val fs = tfPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(tfPath).iterator
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(s"$path/bm25_tf_compacting")
    val old = new org.apache.hadoop.fs.Path(s"$path/bm25_tf_old")
    fs.delete(tmp, true)
    fs.delete(old, true)
    spark.read.parquet(tfPath.toString)
      .repartition(nFiles, col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.parquet(tmp.toString)
    require(fs.rename(tfPath, old),
      s"compactBm25: could not stage $tfPath aside")
    require(fs.rename(tmp, tfPath),
      s"compactBm25: could not swap compacted table into $tfPath " +
        s"(previous table preserved at $old)")
    fs.delete(old, true)
  }

  /** Load an index written by [[writeBm25]], enforcing the format
    * marker and — under `verify = true` — that the doc count matches
    * the meta (a partially written tf table would silently deflate
    * every df and idf — fail loudly instead).
    *
    * `verify = false` skips the completeness recount, making the load
    * O(metadata): at the claimed scale the recount is a full
    * countDistinct scan of a corpus-sized table on EVERY load, which
    * contradicts the build-once/serve-forever posture (the round-18
    * advice). Production serving loads pass false and rely on the
    * format marker plus storage-layer integrity; verification remains
    * the default so ad-hoc loads stay loud about truncation.
    */
  def loadBm25(spark: SparkSession, path: String,
      verify: Boolean = true): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/bm25_meta")
    require(meta.columns.contains("format"),
      s"CurationIndex.loadBm25($path): bm25_meta carries no format marker")
    val rows = meta.select(col("n_docs").cast("long"),
      col("format").cast("long")).as[(Long, Long)].collect()
    require(rows.length == 1 && rows.head._2 == FormatVersion,
      s"CurationIndex.loadBm25($path): bad meta " +
        s"${rows.mkString("[", ",", "]")} — rebuild with this build's " +
        "writeBm25")
    val tf = spark.read.parquet(s"$path/bm25_tf")
    if (verify) {
      val nDocs = tf.select(countDistinct(col("doc_id"))).as[Long].head()
      require(nDocs == rows.head._1,
        s"CurationIndex.loadBm25($path): tf table covers $nDocs docs, " +
          s"meta says ${rows.head._1} — truncated index")
    }
    tf
  }

  def writePq(spark: SparkSession, path: String,
      idx: Similarity.PqIndex): Unit = {
    import spark.implicits._
    val rows = for {
      s <- idx.codebooks.indices
      c <- idx.codebooks(s).indices
    } yield (s, c, idx.codebooks(s)(c).toSeq)
    rows.toDF("sub", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pq_codebooks")
    Seq((idx.m, idx.subDim, idx.k, FormatVersion))
      .toDF("m", "sub_dim", "k", "format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pq_meta")
  }

  /** Load codebooks written by [[writePq]], enforcing the format
    * marker and the FULL (sub, code) grid — a missing code would
    * silently shift every later code id and decode garbage distances,
    * so truncation fails loudly instead.
    */
  def loadPq(spark: SparkSession, path: String): Similarity.PqIndex = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/pq_meta")
    require(meta.columns.contains("format"),
      s"CurationIndex.loadPq($path): pq_meta carries no format marker")
    val metaRows = meta.select($"m".cast("int"), $"sub_dim".cast("int"),
      $"k".cast("int"), $"format".cast("long")).as[(Int, Int, Int, Long)]
      .collect()
    require(metaRows.length == 1 && metaRows.head._4 == FormatVersion,
      s"CurationIndex.loadPq($path): bad meta " +
        s"${metaRows.mkString("[", ",", "]")} — rebuild with this " +
        "build's writePq")
    val (m, subDim, k, _) = metaRows.head
    val rows = spark.read.parquet(s"$path/pq_codebooks")
      .select($"sub".cast("int"), $"code".cast("int"), $"centroid")
      .as[(Int, Int, Seq[Double])].collect()
    require(rows.length == m * k &&
        rows.map(r => (r._1, r._2)).toSet ==
          (for (s <- 0 until m; c <- 0 until k) yield (s, c)).toSet,
      s"CurationIndex.loadPq($path): codebook grid must hold exactly " +
        s"every (sub 0..${m - 1}, code 0..${k - 1}) once (got " +
        s"${rows.length} rows) — the table is truncated or corrupt")
    require(rows.forall(_._3.length == subDim),
      s"CurationIndex.loadPq($path): centroid width != sub_dim $subDim")
    val books = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (s, c, v) => books(s)(c) = v.toArray }
    Similarity.PqIndex(m, subDim, books)
  }

  /** Persist a [[Quality.DsirModel]] (the admission-v2 stream's fifth
    * gate state) as `path/dsir_ratios` (bucket, log_ratio) — `buckets`
    * rows, the same bounded-by-construction argument as the LM tables.
    */
  def writeDsir(spark: SparkSession, path: String,
      model: Quality.DsirModel): Unit = {
    import spark.implicits._
    model.logRatio.toSeq.zipWithIndex.map { case (r, b) => (b, r) }
      .toDF("bucket", "log_ratio")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/dsir_ratios")
  }

  /** Load a model written by [[writeDsir]]; fails descriptively on a
    * truncated table (every bucket 0..n-1 must be present exactly
    * once — a gap would silently zero-score its grams).
    */
  def loadDsir(spark: SparkSession, path: String): Quality.DsirModel = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/dsir_ratios")
      .select($"bucket", $"log_ratio").as[(Int, Double)].collect()
      .sortBy(_._1)
    require(rows.nonEmpty &&
        rows.iterator.map(_._1).zipWithIndex.forall(p => p._1 == p._2),
      s"CurationIndex.loadDsir($path): dsir_ratios must hold every " +
        s"bucket 0..n-1 exactly once (got ${rows.length} rows) — " +
        "the table is truncated or corrupt")
    Quality.DsirModel(rows.map(_._2))
  }

  /** L82 — PERSISTED SHINGLE-DEDUP INDEX: the corpus-side state for
    * dedup-AT-INGEST. A 100 TB pipeline admits new batches daily; the
    * near-dup question each batch must answer — "is this document a
    * near-copy of something ALREADY IN the corpus?" — must not rescan
    * the corpus per batch. This index persists exactly the state the
    * q39 posting-list Jaccard needs on the corpus side:
    *
    *   `$path/dedup_postings`  (s BIGINT, doc_id)  df-capped posting
    *                           lists over xxhash64'd word n-gram
    *                           shingles (hashes only cross the wire
    *                           and the disk — intersection/union
    *                           COUNTS are invariant under hashing, the
    *                           q39 posture, so Jaccard is unchanged);
    *   `$path/dedup_hot`       (s BIGINT) the shingles the df cap
    *                           dropped — a new doc's size must exclude
    *                           them too or its Jaccard denominators
    *                           drift from the build-side convention;
    *                           BOUNDED (only shingles with df > cap —
    *                           boilerplate, by construction);
    *   `$path/dedup_sizes`     (doc_id, n) capped set sizes;
    *   `$path/dedup_meta`      (n, df_cap, n_docs, format).
    *
    * CONTRACT (stated, not hidden): the hot-shingle profile is FROZEN
    * at build — the index answers "near-dup of the indexed corpus
    * under the indexed corpus's boilerplate profile". Within-batch
    * duplicates are the batch's own [[graft.ops.Text]] dedup pass;
    * periodic full rebuilds refresh the profile (the CCNet/BM25
    * persisted-model posture throughout this engine).
    *
    * REFRESH POLICY (round 21, closing the staleness gap): appended
    * generations never join the hot set, so boilerplate that becomes
    * common only AFTER build stays in postings and sizes on both
    * sides of the delta join — shared new boilerplate then inflates
    * both the intersection and the union, OVERSTATING delta Jaccard
    * (drift direction: toward false duplicates, i.e. over-aggressive
    * dedup — demonstrated in SimilaritySpec's frozen-vs-rebuilt drift
    * arm). The df cap also stops bounding those shingles' posting
    * lists, so per-batch cost drifts above O(batch × dfCap) in the
    * worst case. REBUILD TRIGGER: refresh (full rebuild) once
    * cumulative appends exceed ~25% of the doc count the profile was
    * built on (meta `n_docs` is the running total — appended mass =
    * n_docs now minus n_docs in the build manifest); a pipeline that
    * appends truly boilerplate-free generations can relax it.
    */
  def writeDedupIndex(spark: SparkSession, path: String, docs: DataFrame,
      n: Int = 3, dfCap: Int = 100): Unit = {
    import spark.implicits._
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
    val sh0 = toks.select(col("doc_id"),
        explode(array_distinct(Quality.wordGramHashes(col("t"), n))).as("s"))
      .persist()
    val hot = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("s"))
    hot.write.mode("overwrite").parquet(s"$path/dedup_hot")
    // re-read the written hot table rather than keeping the aggregate
    // alive: the anti-join build side becomes a plain scan and sh0 is
    // the only persisted frame to release
    val postings = sh0.join(
      spark.read.parquet(s"$path/dedup_hot"), Seq("s"), "left_anti")
    postings.write.mode("overwrite").parquet(s"$path/dedup_postings")
    val written = spark.read.parquet(s"$path/dedup_postings")
    written.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$path/dedup_sizes")
    val nDocs = spark.read.parquet(s"$path/dedup_sizes").count()
    sh0.unpersist(false)
    Seq((n.toLong, dfCap.toLong, nDocs, FormatVersion))
      .toDF("n", "df_cap", "n_docs", "format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/dedup_meta")
  }

  /** Append a NEW batch's shingle state to a [[writeDedupIndex]] —
    * incremental maintenance without rewriting the corpus-sized
    * posting table (new parquet segments land beside the old; the
    * 1-row meta is rewritten with the new doc count — the
    * [[appendBm25]] discipline, including the new-ids contract).
    *
    * The HOT PROFILE STAYS FROZEN (the [[writeDedupIndex]] contract):
    * appended docs' postings and sizes are computed against the
    * build-time hot set, so an appended index is byte-equivalent to a
    * rebuild THAT USES THE ORIGINAL PROFILE — not to a from-scratch
    * rebuild whose df counts would shift with the new docs. q209
    * hash-checks exactly that equivalence; periodic full rebuilds
    * refresh the profile.
    */
  def appendDedupIndex(spark: SparkSession, path: String,
      newDocs: DataFrame): Unit = {
    import spark.implicits._
    val (n, _) = dedupIndexParams(spark, path)
    val hot = spark.read.parquet(s"$path/dedup_hot")
    val toks = newDocs.select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
    val sh = toks.select(col("doc_id"),
        explode(array_distinct(Quality.wordGramHashes(col("t"), n))).as("s"))
      .join(hot, Seq("s"), "left_anti")
      .persist()
    // CRASH ORDER (the compactBm25 atomicity discipline): sizes land
    // BEFORE postings. A crash between the two appends then leaves at
    // worst orphan sizes rows (harmless: no postings ever join to
    // them); the reverse order would leave posting rows whose old_id
    // has no sizes row, and dedupDeltaAgainstIndex's inner join to
    // oldSizes would silently drop those candidates (missed dups).
    // Neither order is atomic — a crashed append should be re-run
    // after removing the partial segment files.
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .write.mode("append").parquet(s"$path/dedup_sizes")
    sh.write.mode("append").parquet(s"$path/dedup_postings")
    val added = sh.select(countDistinct(col("doc_id"))).as[Long].head()
    sh.unpersist(false)
    val meta = spark.read.parquet(s"$path/dedup_meta")
      .select(col("n").cast("long"), col("df_cap").cast("long"),
        col("n_docs").cast("long"), col("format").cast("long"))
      .as[(Long, Long, Long, Long)].head()
    Seq((meta._1, meta._2, meta._3 + added, meta._4))
      .toDF("n", "df_cap", "n_docs", "format")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/dedup_meta")
  }

  /** Load + verify the [[writeDedupIndex]] meta; returns (n, dfCap). */
  private[graft] def dedupIndexParams(spark: SparkSession,
      path: String): (Int, Int) = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/dedup_meta")
      .select(col("n").cast("long"), col("df_cap").cast("long"),
        col("n_docs").cast("long"), col("format").cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    require(meta.length == 1 && meta.head._4 == FormatVersion,
      s"CurationIndex.dedupIndexParams($path): bad meta — not a " +
        "writeDedupIndex index")
    (meta.head._1.toInt, meta.head._2.toInt)
  }

  /** DELTA DEDUP against a [[writeDedupIndex]] — the per-batch ingest
    * manifest: for EVERY document of `newDocs`, its best-matching
    * indexed document by capped-shingle Jaccard (rounded to 6
    * decimals; ties to the smaller indexed id) and the `is_dup`
    * verdict at `minJaccard` (compared on the RAW ratio, the q39
    * threshold convention). Documents with no candidate (no shared
    * non-hot shingle, too short to shingle, all-boilerplate) ride
    * through with NULL match columns and is_dup = false — the
    * manifest is the admission decision, so every batch row must
    * appear in it.
    *
    * 100 TB posture: the corpus NEVER rescans — the batch side
    * shingles only `newDocs`; the join against `dedup_postings` is
    * bounded by the df cap (each batch shingle meets <= dfCap indexed
    * postings); sizes/meta are O(corpus) scans of two narrow columns
    * and a broadcast-sized hot list would be wrong to assume — the
    * hot table joins as a normal anti-join and Catalyst broadcasts it
    * when small. Per-batch cost is O(batch x dfCap), independent of
    * corpus size (held flat in the round-21 10x-corpus stress,
    * PLANS.md). NOTE: the result is frozen through an EAGER
    * `orderBy(doc_id).localCheckpoint(true)` — a global sort of the
    * manifest, bounded by the batch size; at very large batches that
    * sort is the caller's cost to pay (drop the ordering downstream if
    * a batch manifest need not be id-sorted).
    */
  def dedupDeltaAgainstIndex(spark: SparkSession, path: String,
      newDocs: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    import spark.implicits._
    val (n, _) = dedupIndexParams(spark, path)
    val postings = spark.read.parquet(s"$path/dedup_postings")
      .select(col("s"), col("doc_id").as("old_id"))
    val oldSizes = spark.read.parquet(s"$path/dedup_sizes")
      .select(col("doc_id").as("old_id"), col("n").as("n_old"))
    val hot = spark.read.parquet(s"$path/dedup_hot")
    val base = newDocs.select(col("doc_id").cast("long").as("doc_id"))
    val toks = newDocs.select(col("doc_id").cast("long").as("doc_id"),
        split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= n)
    val shNew = toks.select(col("doc_id"),
        explode(array_distinct(Quality.wordGramHashes(col("t"), n))).as("s"))
      .join(hot, Seq("s"), "left_anti")
      .persist()
    val newSizes = shNew.groupBy(col("doc_id")).agg(count(lit(1)).as("n_new"))
    val shared = shNew.join(postings, Seq("s"))
      .groupBy(col("doc_id"), col("old_id")).agg(count(lit(1)).as("c"))
    val scored = shared
      .join(newSizes, Seq("doc_id"))
      .join(oldSizes, Seq("old_id"))
      .withColumn("jacc",
        col("c").cast("double") / (col("n_new") + col("n_old") - col("c")))
    import org.apache.spark.sql.expressions.Window
    val best = scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(round(col("jacc"), 6).desc, col("old_id"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("old_id").as("best_old_id"),
        round(col("jacc"), 6).as("jaccard"),
        (col("jacc") >= minJaccard).as("is_dup"))
    val out = base.join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("best_old_id"), col("jaccard"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    shNew.unpersist(false)
    out
  }
}
