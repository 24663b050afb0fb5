package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LEARNED byte-pair-encoding token counting (SURVEY §2.11 L7
  * extension) — the real-tokenizer upgrade over [[Packing.bpeishCount]]'s
  * fixed regex segmentation: merges are LEARNED from the corpus by the
  * classic BPE procedure (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — public) and token
  * counts/packing boundaries then follow the learned merges, the way a
  * production pretraining pipeline's do.
  *
  * Nothing here exists in the reference (its data is images); this
  * extends the example-shaping surface (q92's packing) toward the LLM
  * north star.
  *
  * Algorithm, exactly (shared with the DuckDB oracle):
  *   - vocabulary = per-word frequency table of the whitespace-split
  *     corpus (empty tokens dropped); initial symbols = the word's
  *     characters;
  *   - each round counts adjacent symbol pairs weighted by word
  *     frequency (overlapping occurrences all counted — Sennrich's
  *     `get_stats`), picks the max-count pair with the DETERMINISTIC
  *     tie-break (count desc, then pair lexicographically ascending),
  *     and rewrites every vocabulary word by merging that pair
  *     LEFT-TO-RIGHT NON-OVERLAPPING (in a run of self-pairs "aaaa",
  *     the 1st and 3rd positions merge);
  *   - fewer mergeable rounds than requested ⇒ training stops early.
  *
  * Applying the learned table to a word replays merges IN RANK ORDER,
  * one left-to-right pass per rank. That is EXACT, not an
  * approximation of the usual lowest-rank-first loop: merging pair r
  * only creates adjacencies involving its output symbol, and any pair
  * containing that symbol can first appear in training only AFTER
  * round r — so it has rank > r, and no pass can ever resurrect work
  * for an earlier rank (asserted against a lowest-rank-first reference
  * implementation in BpeSpec).
  *
  * 100 TB posture: the corpus-sized work is ONE distributed word-count
  * aggregate (map-side combined, one shuffle of (word, count) rows);
  * the merge loop then runs driver-side on the BOUNDED word-frequency
  * SUMMARY — `vocabCap` rows max, the same bounded-collect class as
  * [[Quality.charLm]]'s alphabet argument, and exactly what standard
  * BPE trainers (subword-nmt, HuggingFace, sentencepiece) train on.
  * The learned table is `numMerges` string pairs — kilobytes — and
  * ships to executors in the scoring UDF's closure; scoring is a pure
  * map stage. Tie-break caveat: pair order uses Scala's UTF-16 string
  * order, which matches DuckDB's UTF-8 binary order on ASCII/BMP
  * symbols (the fixture's alphabet) but diverges for astral-vs-high-BMP
  * comparisons; a multilingual deployment should pin a code-point
  * collation on both sides.
  */
object Bpe {

  /** A learned merge table: `pairs(r)` is the rank-r merge. */
  final case class Merges(pairs: IndexedSeq[(String, String)])

  private def symbols(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0; var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      out(k) = word.substring(i, i + n)
      i += n; k += 1
    }
    out
  }

  /** One left-to-right non-overlapping pass of a single merge. */
  private[graft] def applyMerge(syms: Array[String],
      a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Train `numMerges` merges from the corpus' word-frequency summary.
    * The distributed part is the word count; the loop runs on the
    * collected, `vocabCap`-bounded summary (see object scaladoc).
    */
  def fit(docs: DataFrame, numMerges: Int, textCol: String = "text",
      vocabCap: Int = 100000): Merges = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(vocabCap >= 1, s"vocabCap must be >= 1, got $vocabCap")
    import docs.sparkSession.implicits._
    val wf = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .orderBy($"freq".desc, $"word".asc)
      .limit(vocabCap)
      .as[(String, Long)].collect()
    var vocab = wf.map { case (w, f) => (symbols(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        // deterministic argmax: count desc, then (a, b) ascending —
        // the oracle's ORDER BY cnt DESC, a, b LIMIT 1
        var best: ((String, String), Long) = null
        counts.foreach { e =>
          if (best == null || e._2 > best._2 ||
              (e._2 == best._2 &&
                (e._1._1 < best._1._1 ||
                  (e._1._1 == best._1._1 && e._1._2 < best._1._2))))
            best = e
        }
        merges += best._1
        vocab = vocab.map { case (syms, f) =>
          (applyMerge(syms, best._1._1, best._1._2), f)
        }
      }
    }
    Merges(merges.toIndexedSeq)
  }

  /** Token count of one word under the learned table: replay merges in
    * rank order (exact — see object scaladoc).
    */
  private[graft] def tokenCount(word: String, merges: Merges): Long = {
    var syms = symbols(word)
    var r = 0
    while (r < merges.pairs.length && syms.length > 1) {
      val (a, b) = merges.pairs(r)
      syms = applyMerge(syms, a, b)
      r += 1
    }
    syms.length.toLong
  }

  /** Per-document token count under `merges` as a Column — the learned
    * drop-in for [[Packing.bpeishCount]] in q92/q116-style packing.
    * The table rides the UDF closure (kilobytes); a per-executor memo
    * caches word→count across rows, since natural-language corpora
    * repeat words heavily.
    */
  def bpeCount(merges: Merges): Column => Column = {
    val f = udf { text: String =>
      if (text == null) 0L
      else {
        val memo = BpeMemo.forTable(merges)
        var sum = 0L
        var start = 0
        val n = text.length
        while (start < n) {
          var end = start
          while (end < n && text.charAt(end) != ' ') end += 1
          if (end > start) sum += memo.count(text.substring(start, end))
          start = end + 1
        }
        sum
      }
    }
    (textCol: Column) => f(textCol)
  }

  /** ORACLED exercise (q118): q92's sequence packing under a LEARNED
    * 10-merge BPE table fit on the same corpus. The DuckDB oracle
    * re-derives the ENTIRE training loop relationally — per-stage pair
    * counts, the deterministic argmax, and the left-to-right
    * non-overlapping rewrite (overlap runs resolved with a
    * gaps-and-islands alternation — only self-pairs can produce
    * adjacent matches) — as 10 generated CTE stages, then re-tokenizes
    * every document and packs. Every learned merge thus perturbs every
    * downstream token count and example boundary, and all of it is
    * hash-checked.
    */
  def q118BpePack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    val merges = fit(docs, numMerges = 10)
    Packing.sequencePack(docs, "doc_id", bpeCount(merges)($"text"), 512L)
      .select($"doc_id", $"n_tokens", $"first_example", $"last_example",
        $"n_examples")
      .orderBy($"doc_id")
  }

  /** ORACLED exercise (q128): TOKENIZER-FERTILITY quality signal —
    * characters per learned-BPE token, per document. A corpus-fit
    * tokenizer compresses in-distribution text well (high chars/token)
    * and gibberish or out-of-alphabet text poorly (every char its own
    * token, ratio → 1) — the compression-ratio gate production
    * curation stacks run next to the LM gate. Uses the SAME 10-merge
    * table as q118, so the oracle reuses q118's generated training
    * stages verbatim and only the tail differs: per-doc token count
    * joined to the doc's length, micro-rounded ratio, and the gate
    * boolean at 1.5 chars/token.
    *
    * 100 TB posture = [[bpeCount]]'s: the only corpus-sized work is
    * the word-count fit; scoring is a pure map stage (merge table in
    * the closure), the ratio and gate fuse into the same stage.
    */
  def q128BpeFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    val merges = fit(docs, numMerges = 10)
    docs
      .select($"doc_id", bpeCount(merges)($"text").as("n_tokens"),
        length($"text").cast("long").as("n_chars"))
      .filter($"n_tokens" > 0L)
      .withColumn("chars_per_token", Quality.microRatio($"n_chars", $"n_tokens"))
      .withColumn("fertile", $"chars_per_token" >= 1.5)
      .orderBy($"doc_id")
  }
}

/** Executor-side word→count memo, keyed by merge-table identity so
  * concurrent queries with different tables never cross-pollinate.
  * Bounded: cleared when it outgrows `maxEntries` (natural vocabularies
  * plateau far below it; pathological unique-word streams just lose
  * the memo win, never memory).
  */
private[ops] object BpeMemo {
  private val maxEntries = 1 << 20
  // The OUTER table cache is bounded too (same clear-on-size
  // discipline as the inner word memo): each distinct merge table
  // pins a Memo of up to maxEntries words for process lifetime, so a
  // long-lived executor serving many learned tables would otherwise
  // accumulate tens of MB per table unboundedly. A handful of live
  // tables is the real workload; blowing past maxTables just resets
  // the memo win, never memory.
  private val maxTables = 8
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Bpe.Merges, Memo]()

  final class Memo(merges: Bpe.Merges) {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def count(word: String): Long = {
      val c = m.get(word)
      if (c != 0L) c
      else {
        if (m.size() > maxEntries) m.clear()
        val v = Bpe.tokenCount(word, merges)
        m.put(word, v)
        v
      }
    }
  }

  def forTable(merges: Bpe.Merges): Memo = {
    if (cache.size() > maxTables) cache.clear()
    cache.computeIfAbsent(merges, new Memo(_))
  }
}
