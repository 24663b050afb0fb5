package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UNIGRAM-LM (SentencePiece-style) tokenization — SURVEY §2.11 L11's
  * second real-tokenizer family beside [[Bpe]]: Kudo 2018 ("Subword
  * Regularization", the sentencepiece unigram model — public) segments
  * each word into the MINIMUM-COST piece sequence under a per-piece
  * cost table (Viterbi), where cost = −log p(piece).
  *
  * Two vocab-fitting arms, mirroring the engine's exact/production
  * splits:
  *
  *   - [[charGramVocab]] — the ORACLE-EXACT arm: costs are corpus
  *     char-gram frequencies on the integer micro-grid
  *     (floor(−ln(c/N)·1e6 + 0.5) — both engines floor the identical
  *     IEEE double), so the whole Viterbi DP runs on INTEGER scores
  *     and q171 hash-checks every piece boundary cross-engine;
  *   - [[fitEm]] — the LEARNED arm: Kudo's EM (forward–backward
  *     expected piece counts, M-step re-estimate, prune to a vocab
  *     budget keeping all single chars). Spec-verified (EM fits are
  *     the q97/q105 verification class); its output feeds the SAME
  *     [[tokenize]] kernel.
  *
  * Tie-break (shared with the oracle): equal-cost segmentations
  * resolve by the backward walk choosing the LONGEST piece at every
  * step from the word's end. Integer scores make ties exact, never
  * representational. Character units are UTF-16 code units on the
  * Scala side and UTF-8 characters in DuckDB — identical on the
  * fixture's ASCII alphabet (the [[Bpe]] tie-break caveat).
  *
  * 100 TB posture: the corpus-sized work is one word-count aggregate
  * and one gram-count aggregate (both map-side combined); the vocab is
  * alphabet + 2·kGram rows — the [[Quality.charLm]] bounded-collect
  * class — and rides the scoring UDF's closure; tokenization is a pure
  * map over DISTINCT words (natural corpora repeat words heavily — the
  * [[Bpe.bpeCount]] memo economics apply upstream).
  */
object Unigram {

  /** piece → cost on the integer micro-grid; `maxLen` bounds the DP
    * lookback (the longest piece length in the table).
    */
  final case class Vocab(pieces: Map[String, Long], maxLen: Int) {
    require(pieces.nonEmpty, "empty unigram vocab")
  }

  /** The oracle-exact frequency-scored vocab: ALL single chars of the
    * corpus word stream plus the top-`kGram` 2-grams and 3-grams
    * (count desc, gram asc tie-break), each costed
    * floor(−ln(cnt/N)·1e6 + 0.5) with N = total char count. Collects
    * are alphabet- and kGram-bounded.
    */
  def charGramVocab(docs: DataFrame, kGram: Int = 200,
      textCol: String = "text"): Vocab = {
    import docs.sparkSession.implicits._
    val wf = docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    val gs = (1 to 3).map { l =>
      wf.filter(length($"word") >= l)
        .select(explode(transform(
          sequence(lit(1), length($"word") - l + 1),
          i => $"word".substr(i, lit(l)))).as("gram"), $"freq", lit(l).as("l"))
    }.reduce(_ unionByName _)
      .groupBy($"l", $"gram").agg(sum($"freq").as("cnt"))
      .persist()
    val g1 = gs.filter($"l" === 1).select($"gram", $"cnt")
      .as[(String, Long)].collect()
    require(g1.nonEmpty, "charGramVocab: empty corpus")
    val n = g1.map(_._2).sum
    def top(l: Int) = gs.filter($"l" === l)
      .orderBy($"cnt".desc, $"gram".asc).limit(kGram)
      .select($"gram", $"cnt").as[(String, Long)].collect()
    val all = g1 ++ top(2) ++ top(3)
    gs.unpersist(false)
    Vocab(all.map { case (g, c) =>
      g -> math.floor(-math.log(c.toDouble / n) * 1e6 + 0.5).toLong
    }.toMap, 3)
  }

  private val Inf = Long.MaxValue / 4

  /** Minimum-cost segmentation of one word: integer-score Viterbi,
    * longest-piece-from-the-end tie-break (the oracle's rule). A word
    * containing a character absent from the vocab cannot be segmented
    * and returns (Array(word), -1) — callers decide whether that is a
    * data error (q171's corpus-fit vocab makes it impossible).
    */
  private[graft] def viterbi(word: String, vocab: Vocab): (Array[String], Long) = {
    val n = word.length
    val best = Array.fill(n + 1)(Inf)
    best(0) = 0L
    var p = 1
    while (p <= n) {
      var l = 1
      val lMax = math.min(vocab.maxLen, p)
      while (l <= lMax) {
        if (best(p - l) < Inf) {
          vocab.pieces.get(word.substring(p - l, p)) match {
            case Some(c) => if (best(p - l) + c < best(p)) best(p) = best(p - l) + c
            case None =>
          }
        }
        l += 1
      }
      p += 1
    }
    if (best(n) >= Inf) return (Array(word), -1L)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    p = n
    while (p > 0) {
      var chosen = 0
      var l = math.min(vocab.maxLen, p)
      while (chosen == 0 && l >= 1) {
        val piece = word.substring(p - l, p)
        if (best(p - l) < Inf && vocab.pieces.get(piece)
            .exists(c => best(p - l) + c == best(p))) chosen = l
        else l -= 1
      }
      out += word.substring(p - chosen, p)
      p -= chosen
    }
    (out.reverseIterator.toArray, best(n))
  }

  /** Segment every row of a one-word-per-row frame under `vocab`:
    * (word, n_pieces, cost_micro, seg — pieces joined with '|'). The
    * vocab rides the UDF closure (bounded by construction).
    */
  def tokenize(words: DataFrame, vocab: Vocab,
      wordCol: String = "word"): DataFrame = {
    val seg = udf { w: String =>
      val (pieces, cost) = viterbi(w, vocab)
      (pieces.length.toLong, cost, pieces.mkString("|"))
    }
    words
      .withColumn("r", seg(col(wordCol)))
      .select(col(wordCol).as("word"), col("r._1").as("n_pieces"),
        col("r._2").as("cost_micro"), col("r._3").as("seg"))
  }

  /** ORACLED exercise (q171): [[charGramVocab]] fit on `documents`'
    * word stream, then [[tokenize]] over every distinct word PLUS
    * every distinct adjacent-word compound ≤ 16 chars (the fixture's
    * words are ≤ 8 chars — compounds force genuinely multi-piece
    * segmentations). DuckDB re-derives the gram counts, the micro-grid
    * costs, the full 16-stage integer Viterbi DP, and the
    * longest-piece backward walk — every piece boundary, cost, and
    * piece count hash-checked.
    */
  def q171UnigramTokenize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    tokenize(tokenizeTargets(docs), charGramVocab(docs)).orderBy($"word")
  }

  /** The shared q171/q173 target set: every distinct word of the
    * corpus PLUS every distinct adjacent-word compound ≤ 16 chars (the
    * fixture's words are ≤ 8 chars — compounds force genuinely
    * multi-piece segmentations).
    */
  private def tokenizeTargets(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val words = docs.select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
    val ws = split($"text", " ")
    val compounds = docs
      .filter(size(ws) >= 2) // sequence(1, 0) would run DESCENDING in Spark
      .select(explode(transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), element_at(ws, i + 1)))).as("word"))
      .filter(length($"word") > 0 && length($"word") <= 16)
      // element_at concat of an empty neighbor could equal a plain word;
      // the distinct union below collapses those exactly like the oracle
    words.unionByName(compounds).distinct()
  }

  /** Handoff of the LAST [[fitEm]] vocab to q173's oracle: the EM
    * procedure itself is not SQL-replayable (iterative double-precision
    * forward–backward — q172 oracles the fit's contracts instead), but
    * `Verify` dumps `oracleSql` AFTER running every query, so q173's
    * oracle embeds the cost table THIS run actually fit as literal
    * VALUES and re-derives every tokenization boundary under it.
    */
  @volatile private[graft] var lastEmVocab: Option[Vocab] = None

  /** ORACLED exercise (q173) — the EM arm END TO END: [[fitEm]] on
    * `documents`, then [[tokenize]] over q171's exact target set
    * (distinct words + ≤16-char compounds). The oracle receives the
    * fitted (piece, cost_micro) table as literal CTEs (see
    * [[lastEmVocab]]) and re-runs the full 16-stage integer Viterbi DP
    * and longest-piece backward walk under those costs — every piece
    * boundary, cost, and piece count of the LEARNED tokenizer
    * hash-checked, closing the family's "fit feeds the same oracled
    * kernel" property that q171 (frequency arm) + q172 (fit contracts)
    * left spec-only.
    */
  def q173UnigramEmTokenize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    val learned = fitEm(docs, vocabSize = 120, iterations = 3)
    lastEmVocab = Some(learned)
    tokenize(tokenizeTargets(docs), learned).orderBy($"word")
  }

  /** ORACLED exercise (q174) — [[unigramCount]] as a LOAD-BEARING
    * packing consumer: q92's 512-token sequence packing of `documents`
    * under unigram-LM token counts ([[charGramVocab]]'s oracle-exact
    * arm) instead of the fixed-regex [[Packing.bpeishCount]]. The
    * oracle re-derives the vocab, runs the Viterbi DP + walk over
    * every distinct word, sums piece counts per document through the
    * word stream, and replays the packing prefix sum — every token
    * count and example boundary of the unigram-tokenized corpus
    * hash-checked.
    *
    * 100 TB posture: the fit is two bounded aggregates; scoring is a
    * pure memoized map ([[UnigramCountFn]]); packing adds q92's
    * checkpoint-frozen two-pass prefix sum. No new shuffle class.
    */
  def q174UnigramPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    val vocab = charGramVocab(docs)
    Packing.sequencePack(docs, "doc_id", unigramCount(vocab)($"text"), 512L)
      .select($"doc_id", $"n_tokens", $"first_example", $"last_example",
        $"n_examples")
      .orderBy($"doc_id")
  }

  /** ORACLED exercise (q175) — FIT-ONCE/APPLY-MANY made driver-visible
    * (the reference's own pickle-reload deployment shape,
    * /root/reference/main.py:345-363): fit the frequency vocab on the
    * EVEN-doc split only, round-trip it through [[CurationIndex
    * .writeUnigram]]/[[CurationIndex.loadUnigram]], then tokenize the
    * ODD split's distinct words under the RELOADED vocab — no refit
    * ever touches the apply batch. The oracle re-derives the vocab
    * from the fit split alone and every boundary over the apply
    * split's words; a word carrying a char the fit split never saw is
    * unsegmentable and reports (1 piece, cost −1, itself) in BOTH
    * engines — the delta batch's honest OOV contract.
    */
  def q175UnigramDeltaApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    val vocab = charGramVocab(docs.filter($"doc_id" % 2 === 0))
    // fixed per-session path + overwrite mode, NOT createTempDirectory:
    // Bench re-runs each query 2-3x and a fresh dir per invocation
    // would accumulate for the life of the machine
    val idx = s"${sys.props("java.io.tmpdir")}/graft-q175-vocab-" +
      spark.sparkContext.applicationId
    CurationIndex.writeUnigram(spark, idx, vocab)
    val loaded = CurationIndex.loadUnigram(spark, idx)
    val applyWords = docs.filter($"doc_id" % 2 === 1)
      .select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0).distinct()
    tokenize(applyWords, loaded).orderBy($"word")
  }

  /** Per-document token count under `vocab` as a Column — the
    * unigram-LM drop-in for [[graft.ops.Packing.bpeishCount]] /
    * [[Bpe.bpeCount]] in q92-style packing: whitespace words each
    * segment through [[viterbi]]; empty words contribute 0; a word
    * with an out-of-vocab character counts as ONE unsplittable token
    * (the standard unknown-piece fallback). Per-executor word→count
    * memo (the [[BpeMemo]] economics — corpora repeat words heavily);
    * the vocab rides the UDF closure, bounded by construction.
    */
  def unigramCount(vocab: Vocab): org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val f = udf(new UnigramCountFn(vocab): String => Long)
    (c: org.apache.spark.sql.Column) => f(c)
  }

  /** [[unigramCount]]'s kernel as a serializable function object: the
    * per-executor memo resolves ONCE per deserialized task (transient
    * lazy), not per row — `forVocab`'s ConcurrentHashMap lookup
    * structurally hashes the whole vocab Map, an O(|vocab|) cost that
    * would otherwise dominate the Viterbi work it memoizes. Cross-task
    * sharing still works because the cache key is the (structurally
    * equal) vocab itself.
    */
  private final class UnigramCountFn(vocab: Vocab)
      extends (String => Long) with Serializable {
    @transient private lazy val memo = UnigramMemo.forVocab(vocab)
    def apply(text: String): Long = {
      if (text == null) 0L
      else {
        var sum = 0L
        var start = 0
        val n = text.length
        var i = 0
        while (i <= n) {
          if (i == n || text.charAt(i) == ' ') {
            if (i > start) sum += memo.count(text.substring(start, i))
            start = i + 1
          }
          i += 1
        }
        sum
      }
    }
  }

  /** ORACLED gate (q172) — the EM arm's driver-visible verification
    * (the q97/q105 fit-invariant pattern): fit [[fitEm]] on
    * `documents`, then emit one row of invariants. `n_char_pieces` is
    * REAL parity — the char inventory the fit must keep equals the
    * corpus' distinct word-stream characters, which DuckDB re-derives;
    * the two booleans are Spark-measured contracts the oracle states
    * (`vocab_le_budget`: the prune respects max(budget, #chars);
    * `compresses`: tokenizing every distinct word under the learned
    * vocab uses strictly fewer pieces than the char baseline — the
    * point of learning multi-char pieces).
    */
  def q172UnigramEmGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    val learned = fitEm(docs, vocabSize = 120, iterations = 3)
    val nCharPieces = learned.pieces.keysIterator.count(_.length == 1).toLong
    val budgetOk =
      learned.pieces.size <= math.max(120, nCharPieces).toInt
    val words = docs.select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0).distinct()
    val (p, c) = tokenize(words, learned)
      .agg(sum($"n_pieces"), sum(length($"word")).cast("long"))
      .as[(Long, Long)].head()
    Seq((nCharPieces, budgetOk, p < c))
      .toDF("n_char_pieces", "vocab_le_budget", "compresses")
  }

  /** The LEARNED arm — Kudo's EM over the word-frequency summary:
    * candidate pieces = all grams ≤ `pieceMaxLen` of the corpus words;
    * each round computes every word's forward–backward expected piece
    * counts under the current probabilities (a distributed map over
    * the word summary, piece table in the closure), re-estimates, and
    * prunes to `vocabSize` by expected mass (single chars are never
    * pruned — segmentability). Returns costs on the same micro-grid as
    * [[charGramVocab]], so [[tokenize]] consumes either arm.
    *
    * Collects are piece-table-bounded (≤ max(vocabSize, initial
    * candidate cap) rows per round). EM fits are spec-verified (the
    * q97/q105 class): mass concentrates on repeated multi-char pieces
    * and the learned segmentation beats the char baseline —
    * `UnigramSpec`.
    */
  /** Per-executor word→piece-count memo for [[unigramCount]] — the
    * [[BpeMemo]] bounded-cache discipline (clear-on-size inner word
    * memo, clear-on-size outer vocab cache).
    */
  private object UnigramMemo {
    private val maxEntries = 1 << 20
    private val maxVocabs = 8
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[Vocab, Memo]()

    final class Memo(vocab: Vocab) {
      private val m = new java.util.concurrent.ConcurrentHashMap[String, Long]()
      def count(word: String): Long = {
        val c = m.get(word)
        if (c != 0L) c
        else {
          if (m.size() > maxEntries) m.clear()
          val (pieces, cost) = viterbi(word, vocab)
          val v = if (cost < 0) 1L else pieces.length.toLong
          m.put(word, v)
          v
        }
      }
    }

    def forVocab(vocab: Vocab): Memo = {
      if (cache.size() > maxVocabs) cache.clear()
      cache.computeIfAbsent(vocab, new Memo(_))
    }
  }

  def fitEm(docs: DataFrame, vocabSize: Int = 400, pieceMaxLen: Int = 3,
      iterations: Int = 3, candidateCap: Int = 2000,
      textCol: String = "text"): Vocab = {
    import docs.sparkSession.implicits._
    require(iterations >= 1 && vocabSize >= 1 && pieceMaxLen >= 1,
      s"bad fitEm args: $vocabSize, $pieceMaxLen, $iterations")
    val wf = docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length($"word") > 0)
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .persist()
    val gs = (1 to pieceMaxLen).map { l =>
      wf.filter(length($"word") >= l)
        .select(explode(transform(
          sequence(lit(1), length($"word") - l + 1),
          i => $"word".substr(i, lit(l)))).as("gram"), $"freq", lit(l).as("l"))
    }.reduce(_ unionByName _)
      .groupBy($"l", $"gram").agg(sum($"freq").as("cnt"))
      .persist()
    val chars = gs.filter($"l" === 1).select($"gram", $"cnt")
      .as[(String, Long)].collect()
    require(chars.nonEmpty, "fitEm: empty corpus")
    val multi = gs.filter($"l" > 1)
      .orderBy($"cnt".desc, $"gram".asc).limit(candidateCap)
      .select($"gram", $"cnt").as[(String, Long)].collect()
    gs.unpersist(false)
    val charSet = chars.map(_._1).toSet
    var probs: Map[String, Double] = {
      val init = chars ++ multi
      val tot = init.map(_._2).sum.toDouble
      init.map { case (g, c) => g -> c / tot }.toMap
    }
    var iter = 0
    while (iter < iterations) {
      val p = probs // stable closure capture per round
      val maxL = pieceMaxLen
      val eStep = udf { (word: String, freq: Long) =>
        val n = word.length
        val alpha = new Array[Double](n + 1); alpha(0) = 1.0
        var i = 1
        while (i <= n) {
          var l = 1; val lm = math.min(maxL, i)
          while (l <= lm) {
            p.get(word.substring(i - l, i))
              .foreach(pp => alpha(i) += alpha(i - l) * pp)
            l += 1
          }
          i += 1
        }
        if (alpha(n) <= 0.0) Seq.empty[(String, Double)]
        else {
          val beta = new Array[Double](n + 1); beta(n) = 1.0
          i = n - 1
          while (i >= 0) {
            var l = 1; val lm = math.min(maxL, n - i)
            while (l <= lm) {
              p.get(word.substring(i, i + l))
                .foreach(pp => beta(i) += pp * beta(i + l))
              l += 1
            }
            i -= 1
          }
          val out = scala.collection.mutable.HashMap[String, Double]()
          i = 0
          while (i < n) {
            var l = 1; val lm = math.min(maxL, n - i)
            while (l <= lm) {
              val piece = word.substring(i, i + l)
              p.get(piece).foreach { pp =>
                val e = alpha(i) * pp * beta(i + l) / alpha(n) * freq
                if (e > 0.0) out(piece) = out.getOrElse(piece, 0.0) + e
              }
              l += 1
            }
            i += 1
          }
          out.toSeq
        }
      }
      val mass = wf.select(explode(eStep($"word", $"freq")).as("e"))
        .select($"e._1".as("piece"), $"e._2".as("m"))
        .groupBy($"piece").agg(sum($"m").as("mass"))
        .as[(String, Double)].collect()
      // prune: keep every single char + the highest-mass multis
      val (single, multis) = mass.partition(e => charSet(e._1))
      val keptMultis = multis.sortBy(e => (-e._2, e._1))
        .take(math.max(0, vocabSize - charSet.size))
      // chars with zero mass this round keep a floor so segmentability
      // never breaks (Kudo keeps the char inventory unconditionally)
      val singleMap = single.toMap
      val kept = chars.map { case (g, _) =>
        g -> math.max(singleMap.getOrElse(g, 0.0), 1e-12)
      } ++ keptMultis
      val tot = kept.map(_._2).sum
      probs = kept.map { case (g, m) => g -> m / tot }.toMap
      iter += 1
    }
    wf.unpersist(false)
    Vocab(probs.map { case (g, pr) =>
      g -> math.floor(-math.log(pr) * 1e6 + 0.5).toLong
    }, pieceMaxLen)
  }
}
