package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L2+ exact substring dedup, SUFFIX-RANKING edition — the
  * hash-free counterpart of [[SpanDedup.dupSpans]] (q100) and the
  * machinery core of the Lee-et-al suffix-array pass, distributed.
  *
  * q100 keys its gram stream by `xxhash64(gram)` — an accepted
  * ~n²/2⁶⁵ collision trade. This module removes the trade entirely:
  * gram identity is established by LITERAL equality through
  * prefix-doubling equivalence classes (Manber–Myers 1990, the rank
  * half of suffix-array construction), so two positions share a key
  * IFF their length-L substrings are bytewise identical. Zero
  * collision probability at any corpus size — the audit-grade pass.
  *
  * The classic algorithm sorts suffixes; for the duplicated-span
  * contract ORDER IS IRRELEVANT — only the equivalence classes
  * "same first 2^k characters" matter. So instead of a global sort
  * per round (the distributed-SA bottleneck), each doubling round
  * assigns a class id by GROUPING: the id of class (a, b) is the
  * minimum packed (doc, pos) holding that pair — deterministic,
  * collision-free, computed with one window shuffle, no total order
  * anywhere. Two strategies by L (see [[gramClassesWithHandles]]):
  * small L (≤ 24 chars) takes a DIRECT path — one class window over
  * the literal length-L substring, a single keyed shuffle whose key is
  * no wider than the doubling formulation's final pair key; long L
  * takes the doubling chain, which caps the shuffle key width the
  * literal key would grow linearly with L.
  *
  * 100 TB posture: every stage is a keyed shuffle or a map of the
  * n-row character stream — per level, one shift self-join on
  * (doc, pos+k) and one window class-min; no driver state, no global
  * sort, no per-round growth (level count is fixed by L). At the
  * default L=24 the whole class pass is ONE keyed shuffle (vs q100's
  * single hashed aggregate — the exactness price is the L-char vs
  * 8-byte key width, not extra shuffles); q100 stays the cheap
  * default, this is the collision-free audit pass. Gram classes for a
  * named corpus are additionally MEMOIZED per (session, dataset dir,
  * L) — the [[Similarity]] ivfCache discipline: dedup index state is
  * built once per (dataset, config) and shared by every consumer.
  * Downstream (cross-doc gate, island merge) is byte-identical to
  * q100's — the two INDEPENDENT algorithms must agree exactly, which
  * is what q107's oracle (the same SQL as q100's) checks end-to-end.
  */
object SuffixDedup {

  /** Character stream with packed global ids: one row per position of
    * every document — (doc_id, pos [1-based], packed, rem, text);
    * prefix extraction stays lazy (fused into the consuming stage's
    * codegen, the q100 grams() discipline — the text column never
    * crosses a shuffle). `packed`
    * = doc_id·(maxLen+1)+pos is a collision-free long id usable as a
    * deterministic class representative (min over a group). The
    * maxLen scalar is one tiny aggregate; the bound assert guards the
    * packing against overflow at extreme doc_id × doc-length products.
    */
  private def chars(docs: DataFrame): DataFrame = {
    val bounds = docs.agg(
      max(length(col("text"))).cast("long").as("ml"),
      max(col("doc_id")).cast("long").as("md")).head()
    val maxLen = if (bounds.isNullAt(0)) 0L else bounds.getLong(0)
    val maxDoc = if (bounds.isNullAt(1)) 0L else bounds.getLong(1)
    // packed = doc·(maxLen+1)+pos with pos ≤ maxLen, so the bound must
    // leave maxLen of headroom ABOVE the product — at the exact
    // Long.MaxValue/(maxLen+1) boundary the +pos addition still
    // overflows (advisor round 13).
    require(maxDoc <= (Long.MaxValue - maxLen) / (maxLen + 1),
      s"packed-id overflow: maxDoc=$maxDoc maxLen=$maxLen")
    docs
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("p"),
        col("text"))
      .select(col("doc_id"), col("p"), col("text"),
        col("p").cast("long").as("pos"),
        (col("doc_id").cast("long") * (maxLen + 1) + col("p")).as("packed"),
        (length(col("text")) - col("p") + 1).as("rem"))
  }

  /** Assign collision-free class ids for the key columns: every row
    * gets `min(packed)` over its (key...) group — rows are in the same
    * class IFF their keys are equal, and the id is deterministic under
    * any partitioning. One window shuffle.
    */
  private def classIds(df: DataFrame, out: String, keys: String*): DataFrame =
    df.withColumn(out,
        min(col("packed")).over(Window.partitionBy(keys.map(col): _*)))
      .drop(keys: _*)

  /** Rank table (doc_id, pos, packed, r) where `r` is the class id of
    * the first `k` characters at pos; rows exist only where the doc
    * has ≥ k characters remaining (truncated suffixes never alias).
    */
  private def doubled(rk: DataFrame, k: Int): DataFrame = {
    val right = rk.select(col("doc_id"), (col("pos") - k).as("pos"),
      col("r").as("rb"))
    val paired = rk.select(col("doc_id"), col("pos"), col("packed"),
        col("r").as("ra"))
      .join(right, Seq("doc_id", "pos")) // inner: both halves must exist
    classIds(paired, "r", "ra", "rb")
  }

  /** Direct class table for a short prefix length `k`: group by the
    * literal k-char substring. The doubling BASE — shuffling a k-char
    * key once beats log₂(k) doubling rounds of 16-byte pairs, so every
    * power-of-two level ≤ [[directBase]] is built this way and only
    * longer levels pay the doubling join (what makes long-L dedup
    * scale: the shuffle key width is capped at directBase chars
    * regardless of L).
    */
  private def directLevel(cs: DataFrame, k: Int): DataFrame = {
    val t = cs
      .filter(col("rem") >= k)
      .withColumn("pref", col("text").substr(col("p"), lit(k)))
      .select(col("doc_id"), col("pos"), col("packed"), col("pref"))
    classIds(t, "r", "pref")
  }

  private val directBase = 8

  /** (doc_id, pos, h) where `h` is the exact literal-equality class of
    * the length-`gramLen` substring at pos — the drop-in replacement
    * for q100's xxhash64 gram key. Strategy by L — flat chunk tuple
    * for ≤ 3 base chunks, doubling chain above — see
    * [[gramClassesWithHandles]]. EAGER: the returned frame is
    * checkpointed and the intermediate persists released before
    * returning.
    */
  def gramClasses(docs: DataFrame, gramLen: Int): DataFrame = {
    val (g, persisted) = gramClassesWithHandles(docs, gramLen)
    // EAGER: materialize before releasing the intermediate persists so
    // no cached block outlives the call (the dupSpansExact discipline)
    val out = g.localCheckpoint(true)
    persisted.foreach(_.unpersist(false))
    out
  }

  /** Process-lifetime gram-class memo — the [[Similarity]] ivfCache
    * discipline applied to dedup index state: at 100 TB (and at any
    * scale) the literal-equality class table of a corpus is computed
    * ONCE per (dataset, gram length) and shared by every downstream
    * consumer; recomputing it inside each query call charges
    * index-build cost to lookups. Keyed by (session identity,
    * caller-supplied dataset key, gramLen); the class assignment is
    * deterministic (min packed id over literal-equality groups), so a
    * memo hit is bit-identical to a fresh build. The cached frame is an
    * eager lineage-free localCheckpoint (built by [[gramClasses]]);
    * entries are a BOUNDED set (one per dataset variant) and stale
    * entries from stopped sessions are replaced on a lock-free
    * freshness check, never served.
    *
    * CONTRACT: `cacheKey` names the dataset, and the frame's
    * canonicalized-plan hash is folded into the physical key — a
    * filtered/derived frame passed under an existing name canonicalizes
    * differently, misses, and builds its own classes rather than being
    * served the named dataset's (the round-14 advice hole). Size
    * note: unlike the few-MB ANN indexes, a class table is one row per
    * corpus CHARACTER (~34 MB at sf0.1) — still one bounded entry per
    * named dataset, but budget for it when memoizing many datasets in
    * one process.
    */
  private val gramClassCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def gramClassesCached(docs: DataFrame, cacheKey: String,
      gramLen: Int): DataFrame = {
    // The frame's canonicalized-plan hash is folded into the key as a
    // cheap identity check: two constructions of the SAME dataset (the
    // same parquet read) canonicalize identically and still share one
    // entry, while a filtered/derived frame passed under an existing
    // name can no longer be served that name's classes — it misses and
    // builds its own. The named key still matters (it scopes the
    // documented budget and lets distinct logical datasets with equal
    // plans coexist conceptually); the hash closes the misuse hole.
    val key = s"${System.identityHashCode(docs.sparkSession)}#$cacheKey#" +
      s"$gramLen#${docs.queryExecution.analyzed.semanticHash()}"
    def fresh(e: DataFrame) =
      e != null && (e.sparkSession eq docs.sparkSession) &&
        !e.sparkSession.sparkContext.isStopped
    // Freshness on a LOCK-FREE get() first: compute() locks the bin even
    // on a present key, and the remapping function (a full class build)
    // must not run under the bin lock for unrelated hits.
    val cur = gramClassCache.get(key)
    if (fresh(cur)) cur
    else gramClassCache.compute(key, (_, c) =>
      // pinned: the memo'd frame is a lineage-truncated checkpoint —
      // BlockHygiene.sweep must never release it (unrecoverable)
      if (fresh(c)) c
      else graft.util.BlockHygiene.pin(gramClasses(docs, gramLen)))
  }

  /** [[gramClasses]] plus the persisted intermediate level tables the
    * plan reuses — the CALLER must unpersist them once the returned
    * frame is materialized. Multiply-referenced levels are persisted
    * because plain DataFrame reuse RE-EXECUTES the subtree per
    * reference: `doubled()` self-joins its input, so an unpersisted
    * half level would re-run its whole subtree (char explode included)
    * twice per doubling round.
    */
  private def gramClassesWithHandles(docs: DataFrame,
      gramLen: Int): (DataFrame, Seq[DataFrame]) = {
    require(gramLen >= 1, s"gramLen must be >= 1, got $gramLen")
    val cs = chars(docs)
    val persisted = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def keep(df: DataFrame): DataFrame = {
      val p = df.persist(); persisted += p; p
    }
    // DIRECT fast path for small L: one class assignment over the
    // literal length-L substring — a single window shuffle. The round-13
    // flat chunk-tuple formulation (base-8 classes joined shifted, then
    // a tuple window) was strictly worse for L <= 24: its FINAL window
    // key is already 3 longs = 24 bytes — the same width as the literal
    // gram — so the base window and two shifted joins it prepends are
    // pure extra shuffles of the char stream (measured ~6.0 s -> ~4.2 s
    // isolated at sf0.1 for q107). The doubling path remains the LONG-L
    // strategy — a literal key widens linearly with L, exactly what
    // doubling caps at directBase chars. Both paths produce identical
    // classes (same literal-equality relation, same min(packed)
    // representative over the same member sets); SuffixDedupSpec pins
    // both paths to the hash formulation (direct at L=16/24, doubling
    // at L=100).
    if (gramLen <= 3 * directBase) {
      return (directLevel(cs, gramLen)
        .select(col("doc_id"), col("pos"), col("r").as("h")), persisted.toSeq)
    }
    // power-of-two levels needed: the set bits of gramLen, plus each
    // doubled level's half down to directBase
    val bits = (0 to 30).filter(b => (gramLen & (1 << b)) != 0)
      .map(1 << _).reverse
    val needed = scala.collection.mutable.SortedSet[Int]()
    bits.foreach { b =>
      var k = b
      needed += k
      while (k > directBase) { k /= 2; needed += k }
    }
    // a level is persisted iff its plan is referenced more than once:
    // doubled() SELF-JOINS its input, so a doubling counts as TWO
    // references to the half level (undercounting it as one leaves the
    // half's subtree executing twice per round — the cost the persist
    // exists to remove), plus one reference per compose-step bit
    val refs = scala.collection.mutable.Map.empty[Int, Int].withDefaultValue(0)
    needed.foreach { k => if (k > directBase) refs(k / 2) += 2 }
    bits.foreach { b => refs(b) += 1 }
    var levels = Map.empty[Int, DataFrame]
    needed.foreach { k =>
      val lvl = if (k <= directBase) directLevel(cs, k)
                else doubled(levels(k / 2), k / 2)
      levels += k -> (if (refs(k) > 1) keep(lvl) else lvl)
    }
    var acc = levels(bits.head)
    var off = bits.head
    bits.tail.foreach { b =>
      val right = levels(b).select(col("doc_id"),
        (col("pos") - off).as("pos"), col("r").as("rb"))
      val paired = acc.select(col("doc_id"), col("pos"), col("packed"),
          col("r").as("ra"))
        .join(right, Seq("doc_id", "pos"))
      acc = classIds(paired, "r", "ra", "rb")
      off += b
    }
    (acc.select(col("doc_id"), col("pos"), col("r").as("h")), persisted.toSeq)
  }

  /** [[SpanDedup.dupSpans]] with literal-equality gram classes instead
    * of hashes: identical contract, identical downstream, zero
    * collision probability. EAGER (localCheckpoint + release of the
    * persisted level tables — the minhashNearDup persist discipline):
    * no cached block outlives the call.
    */
  def dupSpansExact(docs: DataFrame, gramLen: Int, minDocs: Int = 2,
      cacheKey: Option[String] = None): DataFrame = cacheKey match {
    case Some(k) =>
      // Named corpus: serve the class table from the memo (built once
      // per (session, dataset, L)); only the downstream dup gate +
      // island merge run per call. The key asserts `docs` IS that
      // dataset — see the gramClassCache contract; pass None for any
      // derived/filtered frame.
      SpanDedup.duplicatedIslands(
        gramClassesCached(docs, k, gramLen), gramLen, minDocs)
    case None =>
      val (g, persisted) = gramClassesWithHandles(docs, gramLen)
      val out = SpanDedup.duplicatedIslands(g, gramLen, minDocs)
        .localCheckpoint(true)
      persisted.foreach(_.unpersist(false))
      out
  }

  /** ORACLED exercise (q107): the q100 contract — repeated 24-char
    * spans across ≥ 2 distinct documents, merged islands — computed by
    * the suffix-ranking algorithm. Two INDEPENDENT algorithms, one
    * answer: the oracle is the very SQL that oracles q100, so the
    * hash-free path is checked span-for-span against DuckDB, and
    * `SuffixDedupSpec` additionally asserts bitwise equality with
    * q100's output frame on the same corpus.
    */
  def q107SuffixDedup(spark: SparkSession, dir: String): DataFrame =
    dupSpansExact(Sources.documents(spark, dir), gramLen = 24, minDocs = 2,
        cacheKey = Some(dir))
      .orderBy(col("doc_id"), col("span_start"))

  /** ORACLED exercise (q110): the cleaned corpus under the
    * SUFFIX-EXACT span list — [[SpanDedup.removeSpans]] composed with
    * [[dupSpansExact]], closing the loop for the collision-free path
    * the way q102 closes it for the hash path. The spans are provably
    * identical to q100's (q107's shared oracle), so the oracle is
    * q102's removal SQL verbatim: every byte of the audit-grade
    * cleaned corpus is hash-checked end-to-end.
    */
  def q110RemoveExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    SpanDedup.removeSpans(docs,
        dupSpansExact(docs, gramLen = 24, minDocs = 2, cacheKey = Some(dir)))
      .select(col("doc_id"), col("clean_text"),
        length(col("clean_text")).as("clean_len"))
      .orderBy(col("doc_id"))
  }
}
