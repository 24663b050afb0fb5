package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text operators — SURVEY.md §2.11 (L1, L5, L6) and
  * the §2.9 hash family, over the `documents` table.
  *
  * Nothing here exists in the reference (its corpus is images); these are
  * the north-star training-data-pipeline ops from the driver contract.
  *
  * 100 TB posture: every query is one scan + one grouped shuffle. Exact
  * dedup groups on xxhash64(text) — a 64-bit key — so the shuffle moves
  * 8-byte keys, not document bodies; survivor choice is deterministic
  * (min doc_id). Token analysis explodes to one row per token but
  * aggregates immediately (partial map-side combine), so the blowup
  * never persists past the first stage.
  */
object Text {

  /** Small function-word list for quality ratios; deliberately tiny and
    * deterministic (no external corpus in an offline build).
    */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** L1 — exact dedup with deterministic survivor: group on
    * xxhash64(text) (8-byte shuffle key at 100 TB, not the body), keep
    * min doc_id, count the duplicates. Output is hash-free so the DuckDB
    * oracle groups on the text itself — identical result barring a
    * 64-bit collision (~1e-9 at 1e5 docs).
    */
  def q21DedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.documents(spark, dir)
      .groupBy(xxhash64($"text").as("h"))
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select($"doc_id", $"dup_count")
      .orderBy($"doc_id")
  }

  /** L6 — per-(lang, source) quality stats: doc count, char lengths,
    * whitespace token counts, stopword ratio. All codegen'd scalar
    * expressions; one grouped pass.
    */
  def q23Quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = split($"text", " ")
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isInCollection(stopwords)))
    Sources.documents(spark, dir)
      .select(
        $"lang", $"source",
        length($"text").as("len"),
        nTok.as("n_tok"),
        nStop.as("n_stop"))
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg($"len"), 6).as("avg_len"),
        min($"n_tok").as("min_tok"),
        max($"n_tok").as("max_tok"),
        // corpus-level ratio from exact integer sums (order-independent),
        // not an average of per-doc doubles
        round(sum($"n_stop").cast("double") / sum($"n_tok"), 6).as("stop_ratio"))
      .orderBy($"lang", $"source")
  }

  /** L5 — term statistics: tokenize, drop stopwords, top-20 terms by
    * document frequency (countDistinct doc_id) with total term
    * frequency. explode → immediate aggregate keeps the token blowup
    * inside one stage.
    */
  def q24Terms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.documents(spark, dir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter(!$"token".isInCollection(stopwords))
      .groupBy($"token")
      .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("tf"))
      .orderBy($"df".desc, $"token")
      .limit(20)
      .orderBy($"token")
  }

  /** §2.9 hash family / document fingerprinting — md5 + sha2-256 per
    * document (both lowercase hex in Spark and DuckDB).
    */
  def q27Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Sources.documents(spark, dir)
      .select(
        $"doc_id",
        md5($"text").as("md5_hex"),
        sha2($"text", 256).as("sha256_hex"),
        length($"text").as("len"))
      .orderBy($"doc_id")
  }

  /** Reference formulation of the per-document SimHash — the
    * relational explode → xxhash64 → 64 conditional-sum bit votes →
    * `vote > 0` pipeline q38 executed through round 5. Kept as the
    * independent cross-check for the fused [[graft.expressions.SimHash64]]
    * kernel (`SimHashExprSpec` asserts bit-identical fingerprints); not
    * on the query path — it shuffles one row per (doc, token) for a
    * value that is derivable inside the map task.
    */
  private[graft] def simhashViaAggregation(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val toks = docs
      .select($"doc_id", explode(array_distinct(split($"text", " "))).as("token"))
      .select($"doc_id", xxhash64($"token").as("h"))
    val votes = (0 until 64).map(i =>
      sum(when(shiftright($"h", i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$i"))
    val simhash = (0 until 64)
      .map(i => when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    toks.groupBy($"doc_id").agg(votes.head, votes.tail: _*)
      .select($"doc_id", simhash.as("simhash"))
  }

  /** L2 (SimHash variant) — 64-bit token-level SimHash per document,
    * then near-dup candidates from 16-bit band collisions, verified by
    * Hamming distance (bit_count of xor). Candidate generation is a
    * band-bucket join, never all-pairs. Rows-only: xxhash64 is not
    * available to the oracle.
    *
    * Fingerprinting is the fused [[graft.expressions.SimHash64]] kernel
    * — a pure MAP stage (SimHash is a per-document reduction; the
    * round-5 explode + groupBy formulation, kept as
    * [[simhashViaAggregation]] for the parity test, shuffled one row
    * per (doc, token) and was ~4× this query's wall-clock). The first
    * shuffle in the plan is now the band self-join, which moves only
    * 8-byte fingerprints.
    *
    * The banded frame is persisted for the self-join — the planner does
    * NOT reuse the exchange across the two join sides, so without it
    * the scan + fingerprint pipeline executes twice. Released before
    * returning (minhashNearDup pattern).
    */
  def q38Simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.GraftColumns.simHash64
    val fp = Sources.documents(spark, dir)
      .select($"doc_id", simHash64($"text").as("simhash"))
    val bands = fp.select($"doc_id", $"simhash",
      posexplode(array((0 until 4).map(b =>
        shiftright($"simhash", b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band", "bval")))
      .persist()
    val out = bands.as("x").join(bands.as("y"),
        $"x.band" === $"y.band" && $"x.bval" === $"y.bval" &&
        $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("doc_a"), $"y.doc_id".as("doc_b"),
        call_function("bit_count", $"x.simhash".bitwiseXOR($"y.simhash")).as("hamming"))
      // hamming is functionally dependent on the pair, so filtering
      // BEFORE the dedup shuffle is equivalent — and shrinks the
      // distinct()'s exchange to near-duplicate pairs only, instead of
      // every band-collision candidate (the corpus is dup-heavy, so
      // candidates >> survivors).
      .filter($"hamming" <= 16)
      .distinct()
      .orderBy($"doc_a", $"doc_b")
      .localCheckpoint(true)
    bands.unpersist(false)
    out
  }

  /** L5 — BPE-ish token counting: word-piece-style segmentation by
    * regex (letter runs / digit runs / single non-space symbols — the
    * class shape GPT-2-era pre-tokenizers use before merges), counted
    * per document alongside the whitespace count. The pattern uses only
    * character classes so Spark's Java regex and the oracle's RE2 agree
    * exactly. One scan, all codegen'd expressions; the per-doc token
    * blowup collapses inside `size()` without materializing.
    */
  def q46TokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pieces = regexp_extract_all($"text", lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))
    Sources.documents(spark, dir)
      .select(
        $"doc_id",
        size(split($"text", " ")).as("n_ws_tokens"),
        size(pieces).as("n_bpeish_tokens"),
        size(filter(pieces, p => p.rlike("^[0-9]+$"))).as("n_number_runs"),
        size(filter(pieces, p => p.rlike("^[^A-Za-z0-9]$"))).as("n_symbols"))
      .orderBy($"doc_id")
  }

  /** L5/L2 — winnowing document fingerprints (Schleimer et al.,
    * SIGMOD'03, the MOSS algorithm) built from a polynomial rolling
    * hash: hash every char 8-gram (base-131 poly mod 2^31−1 — integer
    * math both engines reproduce bit-for-bit, unlike xxhash64 which the
    * oracle lacks), then keep the minimum hash of every 4-hash window.
    * Near-identical documents share most selected fingerprints even
    * under insertion/shift (the winnowing guarantee), so the distinct
    * fingerprint set is the plagiarism/near-dup index unit. Emitted as
    * per-doc summary (count/min/max/sum of the fingerprint set — all
    * integer-exact, hash-stable); the exploded (fp → doc) posting-list
    * form feeds the same bucket-join shape as q39.
    *
    * All computation is per-row Catalyst HOFs — no shuffle at all until
    * the final ORDER BY; at 100 TB this is a pure map stage.
    */
  def q47WinnowFingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.GraftColumns.winnowFingerprints
    val (k, w) = (8, 4)
    // The kernel is the custom codegen'd expression (a true O(1)-per-
    // gram rolling hash; the HOF composition re-folded k chars per gram
    // through interpreted lambdas with per-gram allocations — 13 s at
    // sf0.1 vs ~1 s). n_grams is arithmetic: every position yields a
    // gram, so it is len - k + 1, no gram array needed.
    Sources.documents(spark, dir)
      .filter(length($"text") >= k + w - 1) // >=1 full window
      .withColumn("fps", winnowFingerprints($"text", k, w))
      .select(
        $"doc_id",
        (length($"text") - (k - 1)).as("n_grams"),
        size($"fps").as("n_fps"),
        array_min($"fps").as("fp_min"),
        array_max($"fps").as("fp_max"),
        aggregate($"fps", lit(0L), (a, x) => a + x).as("fp_sum"))
      .orderBy($"doc_id")
  }

  /** L5 (TF-IDF, end-to-end + ORACLED) — the top-3 TF-IDF terms per
    * document as pure relational algebra: term frequency per (doc,
    * term), document frequency per term, idf = ln((N+1)/(df+1))
    * (the add-one-smoothed form, so a corpus-universal term still gets
    * a finite weight), ranked per document with deterministic ties
    * (term ascending). The [[tfidf]] ML stage produces vectors for
    * model pipelines; this query is the inspectable, DuckDB-checkable
    * dataflow equivalent.
    *
    * 100 TB posture: three keyed shuffles — (doc, term) aggregate with
    * map-side combine, term-df aggregate over the already-reduced tf
    * frame (one row per (doc, term), not per occurrence), tf⋈df on
    * term; the corpus row count joins as a 1-row broadcast; the final
    * top-k is one window pass per doc partition.
    */
  def q62TfidfTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    val tf = docs
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        $"tf" * log(($"n_docs" + 1).cast("double") / ($"df" + 1)))
    val w = Window.partitionBy($"doc_id").orderBy($"tfidf".desc, $"term")
    scored.withColumn("rk", row_number().over(w)).filter($"rk" <= 3)
      .select($"doc_id", $"rk".cast("int").as("rk"), $"term", $"tf", $"df",
        // tie-proof floor(x*1e6+0.5)/1e6 (q52/q56 form), NOT round():
        // Spark rounds the shortest decimal repr HALF_UP while DuckDB
        // rounds the binary double — divergent on representational ties
        (floor($"tfidf" * 1e6 + 0.5) / 1e6).as("tfidf"))
      .orderBy($"doc_id", $"rk")
  }

  /** L5 — TF-IDF featurization with an inspectable vocabulary:
    * whitespace tokenize → CountVectorizer (vocab on the driver, sized
    * for introspection/tests; HashingTF is the fixed-memory choice at
    * 100 TB vocab) → IDF. Returns (model stages, featurized frame).
    */
  def tfidf(docs: DataFrame, textCol: String = "text", vocabSize: Int = 1 << 16):
      (org.apache.spark.ml.PipelineModel, DataFrame) = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.{CountVectorizer, IDF, Tokenizer}
    val pipe = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol(textCol).setOutputCol("tokens"),
      new CountVectorizer().setInputCol("tokens").setOutputCol("tf")
        .setVocabSize(vocabSize),
      new IDF().setInputCol("tf").setOutputCol("tfidf")))
    val model = pipe.fit(docs)
    (model, model.transform(docs))
  }

  /** Character bigrams of a string column (the n-gram unit for language
    * ID), deduplicated. Splits to a char array ONCE and pairs adjacent
    * elements — `substr(i, 2)` mapped over positions re-walks the UTF-8
    * string per position (O(len²) per row, a scale-killer on long
    * documents). The `slice` drops the trailing empty string Java's
    * limit=-1 regex split can emit. Returns an empty array below 2
    * chars (callers should filter, mirroring the oracle's length guard).
    */
  def charBigrams(c: Column): Column =
    // The codegen'd kernel ([[graft.expressions.CharBigrams]]). Two HOF
    // drafts both lost badly: transform(sequence, i => element_at(chars,
    // i)...) inlines the split() subtree into the lambda and re-evaluates
    // it per ELEMENT (O(len²)/row — 174 s for q49 at sf0.1), and the
    // zip_with(adjacent slices) fix still paid interpreted-lambda +
    // per-element allocation costs for ~half the query's wall-clock.
    org.apache.spark.sql.graftshim.GraftColumns.charBigrams(c)

  /** Exploded (…, bigram) frame from a text column — the shared first
    * stage of [[langProfiles]] and [[classifyLang]]; q49 computes it
    * once and feeds both.
    */
  private[ops] def bigramFrame(df: DataFrame, keep: Seq[String]): DataFrame = {
    import df.sparkSession.implicits._
    df.select(keep.map(col) :+ explode(charBigrams(lower($"text"))).as("bigram"): _*)
  }

  /** [[langProfiles]] core over a pre-exploded (lang, bigram) frame. */
  private[ops] def profilesFromBigrams(big: DataFrame, topN: Int): DataFrame = {
    import big.sparkSession.implicits._
    val counts = big.groupBy($"lang", $"bigram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"bigram")
    counts.withColumn("rk", row_number().over(w)).filter($"rk" <= topN)
      .select($"lang", $"bigram")
  }

  /** L5 — n-gram-heuristic language ID, profile side: the topN most
    * frequent character bigrams per language from a labeled corpus.
    */
  def langProfiles(labeled: DataFrame, topN: Int = 50): DataFrame =
    profilesFromBigrams(bigramFrame(labeled, Seq("lang")), topN)

  /** L5 — classify each document to the language whose bigram profile
    * it overlaps most (ties broken lexicographically). A broadcast join
    * against the (languages × topN)-row profile table — no shuffle of
    * the corpus beyond the per-doc aggregate.
    */
  def classifyLang(docs: DataFrame, profiles: DataFrame): DataFrame =
    classifyFromBigrams(bigramFrame(docs, Seq("doc_id")), profiles)

  /** [[classifyLang]] core over a pre-exploded (doc_id, bigram) frame. */
  private[ops] def classifyFromBigrams(big: DataFrame, profiles: DataFrame): DataFrame = {
    import big.sparkSession.implicits._
    val hits = big.select($"doc_id", $"bigram")
      .join(broadcast(profiles), "bigram")
      .groupBy($"doc_id", $"lang").agg(count(lit(1)).as("overlap"))
    val w = Window.partitionBy($"doc_id").orderBy($"overlap".desc, $"lang")
    hits.withColumn("rk", row_number().over(w)).filter($"rk" === 1)
      .select($"doc_id", $"lang".as("predicted_lang"), $"overlap")
  }

  /** L5 (lang-ID, end-to-end + ORACLED) — [[langProfiles]] trained on
    * the corpus's own `lang` labels, then every document classified by
    * [[classifyLang]]. Every step is deterministic relational algebra
    * (bigram explode → count → row_number profiles → broadcast join →
    * argmax with lexicographic ties), so the full pipeline is
    * DuckDB-checkable — the mechanism is verified exactly even though
    * the synthetic corpus carries no real language signal (accuracy on
    * the fixture is not the point; the dataflow is).
    *
    * 100 TB posture: the profile table is (languages × topN) rows —
    * broadcast; the corpus side is one explode→aggregate pass with an
    * 8-byte-ish (doc_id, lang) shuffle key; no self-join anywhere.
    */
  def q49LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir).filter(length($"text") >= 2)
    // ONE tokenize+explode pass ([[bigramFrame]]) shared by both
    // consumers — calling [[langProfiles]] then [[classifyLang]]
    // directly would scan + explode the corpus twice, and at 100 TB the
    // explode is the dominant cost. The cores are the SAME functions the
    // public API composes, so the query and its oracle cannot drift from
    // them. Persist released before returning (minhashNearDup pattern).
    val big = bigramFrame(docs, Seq("doc_id", "lang")).persist()
    val out = classifyFromBigrams(big, profilesFromBigrams(big, topN = 50))
      .orderBy($"doc_id")
      .localCheckpoint(true)
    big.unpersist(false)
    out
  }

  /** L5 (lang-ID ACCURACY, ORACLED — q96). q49 proves the lang-ID
    * dataflow is exactly relational algebra, but the driver fixture's
    * `lang` labels carry no signal, so accuracy there is meaningless.
    * This query derives a SIGNAL-BEARING bilingual corpus
    * expression-only from `documents` (q89's planted-ground-truth
    * pattern): each doc_id deterministically becomes an "en"-vocab or
    * "fr"-vocab word sequence (tokens picked by `xxhash64(doc_id, i)`
    * over two disjoint 16-word vocabularies), profiles are trained on
    * the 80% train split and the 20% holdout is classified — so
    * accuracy against the planted labels is a real end-to-end
    * measurement, and the ≥0.95 floor lands in the DuckDB-oracled
    * output as a boolean. A holdout doc with no profile hit counts as
    * wrong (left join), so the floor cannot pass vacuously.
    *
    * 100 TB posture: identical to q49 — corpus-side explode→aggregate
    * with a broadcast profile join; the generation is a pure map stage
    * fused into the scan.
    */
  def q96LangIdAccuracy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocabEn = Seq("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "with", "bright", "morning", "light", "under",
      "stone", "bridge", "winter")
    val vocabFr = Seq("le", "renard", "brun", "saute", "par", "dessus",
      "chien", "paresseux", "avec", "lumiere", "matin", "sous", "pont",
      "pierre", "hiver", "neige")
    def gen(vocab: Seq[String]): Column = {
      val arr = array(vocab.map(lit): _*)
      array_join(
        transform(sequence(lit(0), lit(23)), i =>
          element_at(arr,
            (pmod(xxhash64($"doc_id", i), lit(vocab.size)) + 1).cast("int"))),
        " ")
    }
    val corpus = Sources.documents(spark, dir).select($"doc_id")
      .withColumn("lang",
        when(pmod($"doc_id", lit(2)) === 0, "en").otherwise("fr"))
      .withColumn("text",
        when($"lang" === "en", gen(vocabEn)).otherwise(gen(vocabFr)))
    val train = corpus.filter(pmod($"doc_id", lit(5)) =!= 0)
    val test = corpus.filter(pmod($"doc_id", lit(5)) === 0)
    val preds = classifyLang(test.select($"doc_id", $"text"),
      langProfiles(train, topN = 50))
    test.select($"doc_id", $"lang")
      .join(preds, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_test"),
        sum(when($"predicted_lang" === $"lang", 1L).otherwise(0L))
          .as("n_correct"),
        count_distinct($"predicted_lang").as("n_langs_pred"))
      .select(
        $"n_test",
        ($"n_correct" >= $"n_test" * 0.95).as("acc_ok"),
        ($"n_langs_pred" === 2).as("both_langs_predicted"))
  }

  /** Email/phone patterns for [[redactPii]]: character classes and
    * escaped literals ONLY, so Spark's Java regex and the oracle's RE2
    * match byte-identically (no lookaround, no \b, no shorthand classes
    * with locale-dependent semantics).
    */
  val emailPattern: String = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  val phonePattern: String = "\\+1-555-[0-9]{4}"

  /** L5/L6 (PII scrub) — count and redact email/phone substrings.
    * Replace-all in one pass per pattern; counts come from
    * `regexp_extract_all` so "how much PII" is recorded before the
    * destructive rewrite. Pure map-stage scalar expressions — at 100 TB
    * this fuses into the scan with zero shuffle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, phonePattern, "<PHONE>"),
      emailPattern, "<EMAIL>")

  /** PII detect + redact, ORACLED (q66). The driver fixture's word-soup
    * text contains no PII, so the query plants it DETERMINISTICALLY from
    * doc_id (doc_id%3≠0 → an email, doc_id%5=0 → a second one,
    * doc_id%2=0 → a phone) before scrubbing — the operator is exercised
    * with real signal (0/1/2 emails, 0/1 phones per doc) and the oracle
    * rebuilds the identical input from the same table. Output carries
    * the counts, the redacted length, and the md5 of the redacted text
    * (byte-parity proof without shipping the body twice).
    */
  def q66PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val id = $"doc_id"
    val aug = concat(
      $"text",
      when(id % 3 =!= 0,
        concat(lit(" contact user"), id.cast("string"),
          lit("@mail"), (id % 7).cast("string"), lit(".com")))
        .otherwise(""),
      when(id % 5 === 0,
        concat(lit(" or admin"), (id % 100).cast("string"),
          lit("@example.org")))
        .otherwise(""),
      when(id % 2 === 0,
        concat(lit(" call +1-555-"), lpad((id % 10000).cast("string"), 4, "0")))
        .otherwise(""))
    Sources.documents(spark, dir)
      .select($"doc_id", aug.as("aug"))
      .select(
        $"doc_id",
        size(regexp_extract_all($"aug", lit(emailPattern), lit(0))).as("n_emails"),
        size(regexp_extract_all($"aug", lit(phonePattern), lit(0))).as("n_phones"),
        length(redactPii($"aug")).as("clean_len"),
        md5(redactPii($"aug")).as("redacted_md5"))
      .orderBy($"doc_id")
  }

  /** Candidate primary-account-number pattern for [[luhnAudit]]:
    * contiguous 13–19 digit runs (ISO/IEC 7812 PAN lengths). Character
    * class + bounded quantifier only — byte-identical in Java regex
    * and RE2.
    */
  val panPattern: String = "[0-9]{13,19}"

  /** Per-candidate Luhn checksum (ISO/IEC 7812-1): from the rightmost
    * digit, double every second digit, subtract 9 when the double
    * exceeds 9, and require the sum ≡ 0 (mod 10). Pure integer HOF
    * arithmetic over the reversed digit string — no UDF, and the
    * identical CASE algebra runs in the oracle.
    */
  def luhnValid(pan: Column): Column = {
    val rev = reverse(pan)
    val total = aggregate(sequence(lit(1), length(rev)), lit(0),
      (acc, i) => {
        val d = rev.substr(i, lit(1)).cast("int")
        acc + when(i % 2 === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
    total % 10 === 0
  }

  /** L5/L6 (PII, CHECKSUM-VALIDATED) — credit-card-number audit with
    * Luhn validation, the step that separates a real PII pipeline
    * (Presidio-style validated recognizers; the StarCoder/BigCode PII
    * pass) from bare regex: a 16-digit run is only a card number if
    * its Luhn checksum holds, which kills the order-of-magnitude
    * false-positive rate of [[panPattern]] alone on ids/timestamps.
    * Per doc: candidate digit-runs found, how many validate, the
    * has-PII boolean, and the validated PANs masked to last-4 (the
    * auditable artifact — never the raw number).
    *
    * 100 TB posture: pure map-stage scalar expressions (regex extract
    * + integer HOF per candidate, bounded at 19 digits) — fuses into
    * the scan with zero shuffle, the [[redactPii]] shape.
    */
  def luhnAudit(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import docs.sparkSession.implicits._
    val cands = regexp_extract_all(col(textCol), lit(panPattern), lit(0))
    docs
      .withColumn("valid_pans", filter(cands, luhnValid(_)))
      .withColumn("n_candidates", size(cands).cast("long"))
      .withColumn("n_valid", size($"valid_pans").cast("long"))
      .withColumn("has_valid_pan", $"n_valid" > 0)
      .withColumn("masked_pans",
        array_join(transform($"valid_pans", p => concat(
          lit("*" * 19).substr(lit(1), length(p) - 4),
          p.substr(length(p) - 3, lit(4)))), ","))
      .drop("valid_pans")
  }

  /** ORACLED exercise (q148): [[luhnAudit]] over a deterministic
    * plant (the q66 technique) — %6==0 docs carry a Luhn-VALID 16-digit
    * test PAN, %6==3 the same PAN with a flipped check digit (the
    * regex finds it, the checksum rejects it), %10==7 a valid 15-digit
    * PAN, %9==4 a 12-digit run below the PAN floor (never a
    * candidate); docs hit multiple arms, so candidate and valid counts
    * diverge in both directions and every mask is hash-checked.
    */
  def q148LuhnAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val id = $"doc_id"
    val aug = concat($"text",
      when(id % 6 === 0, lit(" card 4532015112830366")).otherwise(""),
      when(id % 6 === 3, lit(" card 4532015112830367")).otherwise(""),
      when(id % 10 === 7, lit(" amex 371449635398431")).otherwise(""),
      when(id % 9 === 4, lit(" num 123456789012")).otherwise(""))
    luhnAudit(Sources.documents(spark, dir).select($"doc_id", aug.as("text")))
      .select($"doc_id", $"n_candidates", $"n_valid", $"has_valid_pan",
        $"masked_pans")
      .orderBy($"doc_id")
  }

  /** URL CANONICALIZATION (L62) — the first stage of every public
    * crawl-curation pipeline's URL handling (C4 strips fragments and
    * normalizes, RefinedWeb and Dolma dedup by canonical URL and gate
    * on domain blocklists): one codegen'd regexp chain, no UDF, fusing
    * into the scan. Rules, in order:
    *
    *   1. strip the `#fragment`;
    *   2. lowercase the scheme://host prefix (paths stay case-exact);
    *   3. drop default ports `:443`/`:80` (the chain expects the port
    *      directly before the path slash — RE2 has no lookahead, so
    *      the oracle-shared pattern anchors on `/`);
    *   4. strip the query iff it is tracking-only (`utm_*` chains —
    *      a real parameter like `?page=2` is MEANINGFUL and kept);
    *   5. strip one trailing `/`.
    *
    * The patterns use no lookaround/backreference so Java regex
    * (Spark) and RE2 (DuckDB) agree symbol for symbol.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^/]*//[^/]*)", 1)),
      regexp_extract(noFrag, "^[^/]*//[^/]*(.*)", 1))
    val noPort = regexp_replace(lowered, ":(443|80)/", "/")
    val noTrack = regexp_replace(noPort,
      "\\?(utm_[a-z]+=[^&#]*)(&utm_[a-z]+=[^&#]*)*$", "")
    regexp_replace(noTrack, "/$", "")
  }

  /** Registrable-domain blocklist gate over a canonical URL: blocked
    * iff the host IS a listed domain or a subdomain of one (suffix
    * match on `.domain`). The blocklist is a literal array in the plan
    * (UT1-style lists are a few MB — broadcast-bounded at any corpus
    * size); the whole gate is expression-only map work.
    */
  def urlBlocked(canonical: Column, blocklist: Seq[String]): Column = {
    val host = regexp_extract(canonical, "^[a-z]+://([^/:?#]+)", 1)
    exists(typedlit(blocklist),
      d => host === d || host.endsWith(concat(lit("."), d)))
  }

  /** q177's planted URL corpus — expression-only from (doc_id, source)
    * so DuckDB re-derives every URL byte: groups of 6 consecutive docs
    * share a base `https://sub{id%3}.{source}.com/docs/{id div 6}`,
    * and the variant exercises exactly one canonicalization rule:
    * ≡1 uppercased scheme+host and an explicit `:443`; ≡2 a
    * tracking-only query; ≡3 a trailing slash; ≡4 a fragment (all four
    * collapse onto ≡0's canonical); ≡5 a REAL `?page=2` parameter that
    * must survive (a distinct canonical — the negative case).
    */
  private[graft] def urlPlant(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val host = concat(lit("sub"), ($"doc_id" % 3).cast("string"), lit("."),
      $"source", lit(".com"))
    val path = concat(lit("/docs/"), ($"doc_id" / 6).cast("long").cast("string"))
    val base = concat(lit("https://"), host, path)
    docs.select($"doc_id", when($"doc_id" % 6 === 1,
        concat(lit("HTTPS://"), upper(host), lit(":443"), path))
      .when($"doc_id" % 6 === 2,
        concat(base, lit("?utm_source=feed&utm_campaign=x")))
      .when($"doc_id" % 6 === 3, concat(base, lit("/")))
      .when($"doc_id" % 6 === 4, concat(base, lit("#section-2")))
      .when($"doc_id" % 6 === 5, concat(base, lit("?page=2")))
      .otherwise(base).as("url"))
  }

  /** HTML → TEXT LINEARIZATION (L63) — the extraction stage every
    * crawl pipeline runs before any text filter sees a document
    * (C4 consumes pre-extracted WET; RefinedWeb and Dolma run their
    * own extractors and call it the highest-leverage stage). One
    * codegen'd regexp/replace chain, no UDF:
    *
    *   1. drop `<script>`/`<style>` blocks whole (content is code,
    *      not text — the boilerplate the quality gates otherwise eat);
    *   2. block-level closers (`</p>`, `</h1..6>`, `</title>`,
    *      `</div>`, `</li>`, `<br>`) become newlines — paragraph
    *      structure survives for the line-level filters (q144/q158)
    *      downstream;
    *   3. every remaining tag becomes a space;
    *   4. decode the five core entities (`&lt; &gt; &quot; &#39;
    *      &nbsp;`, and `&amp;` LAST so `&amp;lt;` single-decodes);
    *   5. collapse space runs, trim around newlines, collapse newline
    *      runs, trim.
    *
    * Patterns are lookaround-free (RE2-compatible); non-greedy `.*?`
    * is shared Java/RE2 syntax. This is deliberately the LINEAR
    * extractor shape (tag-structure-blind): planted fixtures keep
    * tags single-line and unnested, and the scaladoc contract is
    * "linearize well-formed markup", not "parse adversarial HTML".
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "<script>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "<style>.*?</style>", " ")
    val breaks = regexp_replace(noStyle,
      "</p>|</h[1-6]>|</title>|</div>|</li>|<br>", "\n")
    val noTags = regexp_replace(breaks, "<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&nbsp;", " "), "&amp;", "&")
    val oneSpace = regexp_replace(decoded, "[ \\t]+", " ")
    val trimmed = regexp_replace(oneSpace, " *\\n *", "\n")
    trim(regexp_replace(trimmed, "\\n+", "\n"), " \n")
  }

  /** q178's planted HTML corpus — expression-only from (doc_id, text):
    * the doc's text splits into a title (chars 1–20) and two body
    * chunks wrapped in head/style/script/h1/p/br/div boilerplate, with
    * an `&amp;`-entity seam between the chunks. Every byte of the
    * input page is re-derivable by DuckDB.
    */
  private[graft] def htmlPlant(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val title = substring($"text", 1, 20)
    val chunk1 = substring($"text", 21, 40)
    val chunk2 = substring($"text", 61, 1000000)
    docs.select($"doc_id", concat(
      lit("<html><head><title>"), title,
      lit("</title><style>p { color: red; }</style></head><body><h1>"),
      title, lit("</h1><p>"), chunk1,
      lit(" &amp; more</p><script>var x = 1;</script><p>"), chunk2,
      lit("</p><br><div class=\"footer\">footer text</div></body></html>"))
      .as("html"))
  }

  /** ORACLED exercise (q178) — HTML extraction end to end over the
    * [[htmlPlant]]ed corpus: [[stripHtml]] linearizes every planted
    * page and DuckDB re-builds the page bytes and replays the
    * identical replace chain — every extracted byte, newline boundary,
    * and length hash-checked.
    *
    * 100 TB posture: pure expression map work, fuses into the scan —
    * the same zero-shuffle class as q63/q66.
    */
  def q178HtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    htmlPlant(Sources.documents(spark, dir))
      .withColumn("extracted", stripHtml($"html"))
      .select($"doc_id", $"extracted",
        length($"extracted").cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  /** ORACLED composition (q179) — the crawl HEAD end to end: wrap the
    * q144 corpus ([[Quality.c4Plant]]'s multi-line pages) in real HTML
    * (one `<p>` per line, plus the style/script boilerplate
    * [[stripHtml]] must discard — note the style body carries a `{`
    * that must NOT reach the battery's brace check), EXTRACT with
    * [[stripHtml]], and run [[Quality.c4LineFilter]] on the extracted
    * lines. Because extraction round-trips the line structure
    * byte-exactly, q179's output EQUALS q144's row for row — the
    * composition proves the extractor preserves exactly what the
    * line-level filters consume (asserted directly in `TextSpec`, and
    * independently re-derived by the oracle through the full
    * wrap → extract → battery chain).
    *
    * 100 TB posture: wrap + extract + battery are all expression-only
    * map work fused into one scan — zero shuffle, the q144 class.
    */
  def q179ExtractClean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pages = Quality.c4Plant(Sources.documents(spark, dir))
      .select($"doc_id", concat(
        lit("<html><head><style>p { color: red; }</style></head><body><p>"),
        array_join($"lines", "</p><p>"),
        lit("</p><script>var x = 1;</script></body></html>")).as("html"))
    Quality.c4LineFilter(
        pages.select($"doc_id", split(stripHtml($"html"), "\n").as("lines")))
      .orderBy($"doc_id")
  }

  /** ORACLED exercise (q177) — URL curation end to end over the
    * [[urlPlant]]ed corpus: canonicalize ([[canonicalizeUrl]]), gate on
    * a domain blocklist ([[urlBlocked]] — `src1.com` and every
    * subdomain), and EXACT-DEDUP BY CANONICAL URL (the q21 survivor
    * rule on the canonical string: min doc_id ships). DuckDB re-builds
    * every planted URL and replays the identical regexp chain, the
    * suffix gate, and the survivor group — every canonical byte,
    * blocked flag, and survivor hash-checked.
    *
    * 100 TB posture: canonicalization and the gate fuse into the scan
    * (expression-only); the dedup groups on xxhash64 of the canonical
    * (8-byte shuffle keys, the q21 economics).
    */
  def q177UrlCuration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val urls = urlPlant(Sources.documents(spark, dir))
      .withColumn("canonical_url", canonicalizeUrl($"url"))
      .withColumn("blocked", urlBlocked($"canonical_url", Seq("src1.com")))
    val surv = urls.groupBy(xxhash64($"canonical_url").as("ch"))
      .agg(min($"doc_id").as("survivor_id"))
    urls
      .withColumn("ch", xxhash64($"canonical_url"))
      .join(surv, Seq("ch"))
      .withColumn("is_survivor", $"doc_id" === $"survivor_id")
      .select($"doc_id", $"canonical_url", $"blocked", $"survivor_id",
        $"is_survivor")
      .orderBy($"doc_id")
  }

  /** CRAWL OPT-OUT gate — honor `<meta name="robots">` `noindex`/`none`
    * (the Robots Exclusion Protocol's page-level directive; the
    * C4/RefinedWeb-class pipelines drop opted-out pages BEFORE
    * extraction, both for compliance and because opted-out pages skew
    * boilerplate). True = the page opted out. Case-insensitive and
    * attribute-order-insensitive (name-then-content OR
    * content-then-name), lookaround-free (the Java ∩ RE2 contract).
    * Matching is SUBSTRING over the content value (a `noindex`
    * anywhere in the directive list opts out) — conservative by
    * design: over-dropping respects more opt-outs, never fewer.
    *
    * ALL THREE legal HTML attribute quotings are honored — double-
    * quoted, single-quoted, and unquoted (`name=robots`,
    * `content=noindex`): real crawls carry every variant, and a
    * double-quote-only gate silently under-drops the others (the
    * round-18 advice hole). Backreference-free, so each content arm is
    * spelled per quote style: a quoted value may span spaces up to its
    * own closing quote; an unquoted value ends at whitespace/quote/`>`.
    * The name value is followed by a delimiter class (quote,
    * whitespace, `/`, `>`), so `name=robotsx` can never match.
    */
  def metaRobotsOptOut(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    html.rlike("(?i)<meta[^>]*name\\s*=\\s*[\"']?robots[\"'\\s/>][^>]*content\\s*=\\s*" +
        "(\"[^\"]*(noindex|none)|'[^']*(noindex|none)|[^\\s\"'>]*(noindex|none))") ||
      html.rlike("(?i)<meta[^>]*content\\s*=\\s*" +
        "(\"[^\"]*(noindex|none)[^\"]*\"|'[^']*(noindex|none)[^']*'|[^\\s\"'>]*(noindex|none)[^\\s\"'>]*)" +
        "[^>]*name\\s*=\\s*[\"']?robots[\"'\\s/>]")

  /** Deterministic meta-robots corpus for [[q183RobotsGate]] — four
    * page classes expression-only from doc_id, firing the gate BOTH
    * ways and through BOTH attribute orders plus the case-insensitive
    * arm: %4==0 name-first noindex (uppercase when %8==0), %4==1
    * content-first `none`, %4==2 a robots meta WITHOUT an opt-out
    * token (`nofollow` only — must be KEPT), %4==3 a non-robots meta
    * (viewport — must be KEPT).
    */
  /** The planted meta tag by doc_id class — shared by [[robotsPlant]]
    * and the q185 crawl-head capstone so the two oracles cannot
    * desynchronize: %8==0 uppercase name-first noindex, %8==4 UNQUOTED
    * attributes, %8==1 SINGLE-QUOTED attributes, %8==5 content-first
    * `none`, %4==2 robots without an opt-out token (kept), else a
    * non-robots meta (kept). The quoting split keeps every id's
    * opted-out VERDICT identical to the double-quote-only plant
    * (ids ≡ 0,1 mod 4 opt out) while firing all three attribute
    * quotings the gate honors.
    */
  private[graft] def robotsMetaExpr(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(id % 8 === 0,
      lit("<META NAME=\"ROBOTS\" CONTENT=\"NOINDEX, FOLLOW\">"))
      .when(id % 8 === 4,
        lit("<meta name=robots content=noindex>"))
      .when(id % 8 === 1,
        lit("<meta name='robots' content='noindex, follow'>"))
      .when(id % 4 === 1,
        lit("<meta content=\"none\" name=\"robots\">"))
      .when(id % 4 === 2,
        lit("<meta name=\"robots\" content=\"nofollow\">"))
      .otherwise(
        lit("<meta name=\"viewport\" content=\"width=device-width\">"))

  private[graft] def robotsPlant(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", concat(
      lit("<html><head>"), robotsMetaExpr($"doc_id"),
      lit("<title>t</title></head><body><p>"),
      substring($"text", 1, 40),
      lit("</p></body></html>")).as("html"))
  }

  /** ORACLED exercise (q183) — the opt-out gate composed with
    * extraction over the [[robotsPlant]]ed corpus: every page's
    * `opted_out` flag hash-checked through both attribute orders and
    * the uppercase arm, and the [[stripHtml]] extraction runs ONLY on
    * compliant pages (opted-out pages carry NULL — the bytes never
    * enter the pipeline, which is the point of the gate).
    *
    * 100 TB posture: two rlike probes + the extraction chain, all
    * expression-only map work fused into the scan — zero shuffle.
    */
  def q183RobotsGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    robotsPlant(Sources.documents(spark, dir))
      .withColumn("opted_out", metaRobotsOptOut($"html"))
      .withColumn("extracted",
        when(!$"opted_out", stripHtml($"html")))
      .select($"doc_id", $"opted_out", $"extracted")
      .orderBy($"doc_id")
  }

  /** ORACLED capstone (q185) — the COMPLETE crawl head in production
    * order over ONE planted page corpus: the c4Plant lines plus each
    * source's nav/footer template wrapped in real HTML (with a robots
    * meta by the q183 class rule, a style body carrying '{', and a
    * script), then
    *
    *   1. robots opt-out gate (q183 — opted-out pages never extracted),
    *   2. HTML → text linearization (q178's chain),
    *   3. site-boilerplate line removal (q184 — fit on the compliant
    *      extraction itself),
    *   4. the C4 line/page battery (q144).
    *
    * Every stage interacts: the gate shrinks the df counts the
    * boilerplate fit sees; the template removal happens BEFORE the
    * battery, so at fixture scale the cross-site "lorem ipsum" /
    * "javascript" injections are stripped as per-source boilerplate
    * and pages the battery would have killed are RESCUED (q150's
    * ordering rationale, here at the site level). DuckDB re-derives
    * the plant, the wrap, both gate probes, the extraction chain, the
    * df fit, the reassembly, and the battery — one stitched oracle
    * from five green fragments.
    *
    * 100 TB posture: gate + extraction fuse into the scan; the
    * boilerplate fit/apply is q184's one-explode + keyed-aggregate +
    * anti-join; the battery is pure map — ONE new shuffle class total
    * (the (source, line) aggregate).
    */
  def q185CrawlHead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
    // plant in ONE select (c4 lines + site template, source carried) \u2014
    // no plant-to-documents self-join in the head of the plan
    val sited = docs.select($"doc_id", $"source",
      concat(
        array(concat(lit("home | products | about \u2014 "), $"source")),
        Quality.c4PlantLinesExpr($"doc_id", $"text"),
        array(concat(lit("copyright "), $"source",
          lit(" all rights reserved")))).as("lines"))
    val pages = sited.select($"doc_id", $"source", concat(
      lit("<html><head>"), robotsMetaExpr($"doc_id"),
      lit("<style>p { color: red; }</style></head><body><p>"),
      array_join($"lines", "</p><p>"),
      lit("</p><script>var x = 1;</script></body></html>")).as("html"))
    val extracted = pages
      .filter(!metaRobotsOptOut($"html"))
      .select($"doc_id", $"source",
        split(stripHtml($"html"), "\n").as("lines"))
    val cleaned = Quality.removeBoilerplateLines(extracted,
        Quality.siteBoilerplateSet(extracted, minDocs = 3L))
      .select($"doc_id",
        split(coalesce($"cleaned_text", lit("")), "\n").as("lines"))
    Quality.c4LineFilter(cleaned).orderBy($"doc_id")
  }

  /** WRITING-SYSTEM (script) detection — the gate multilingual
    * curation runs BEFORE language ID (fastText/CCNet-class pipelines
    * bucket by script first: a char-n-gram language model is only
    * meaningful within one writing system, and mixed-script documents
    * are their own quality signal). Seven major script classes counted
    * per document by explicit BMP codepoint ranges (Latin incl. the
    * Latin-1/Extended-A/B letters, Cyrillic, Greek, CJK unified,
    * Arabic, Devanagari, Hangul syllables) — each count is one
    * length-difference over a codegen'd regexp_replace, all fused into
    * the scan (zero shuffle); `dominant_script` breaks exact ties in
    * the fixed priority order of the CASE chain, and the dominant
    * fraction rides the integer micro grid over the SCRIPTED total
    * (unscripted digits/punctuation don't dilute the verdict).
    * Ranges are spelled as literal `\uXXXX` character classes in both
    * engines (BMP-only, so Spark's and DuckDB's code-point `length`
    * agree; no property names, whose vocabularies differ between Java
    * regex and RE2).
    */
  def scriptProfile(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    def cnt(range: String) =
      (length($"text") - length(regexp_replace($"text", s"[$range]", "")))
        .cast("long")
    // Latin-1 range split around U+00D7 (\u00D7) and U+00F7 (\u00F7) \u2014 the two
    // non-letter symbols embedded in the letters block (advisor round
    // 19: counting them as Latin skews dominant_script on math-heavy
    // text). Mirrored verbatim in the DuckDB oracle.
    val profiled = docs.select($"doc_id",
      cnt("A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u024F").as("n_latin"),
      cnt("\u0400-\u04FF").as("n_cyrillic"),
      cnt("\u0370-\u03FF").as("n_greek"),
      cnt("\u4E00-\u9FFF").as("n_cjk"),
      cnt("\u0600-\u06FF").as("n_arabic"),
      cnt("\u0900-\u097F").as("n_devanagari"),
      cnt("\uAC00-\uD7AF").as("n_hangul"))
    val scripted = $"n_latin" + $"n_cyrillic" + $"n_greek" + $"n_cjk" +
      $"n_arabic" + $"n_devanagari" + $"n_hangul"
    profiled
      .withColumn("n_scripted", scripted)
      .withColumn("dominant_script",
        when($"n_latin" >= $"n_cyrillic" && $"n_latin" >= $"n_greek" &&
            $"n_latin" >= $"n_cjk" && $"n_latin" >= $"n_arabic" &&
            $"n_latin" >= $"n_devanagari" && $"n_latin" >= $"n_hangul",
          "latin")
          .when($"n_cyrillic" >= $"n_greek" && $"n_cyrillic" >= $"n_cjk" &&
            $"n_cyrillic" >= $"n_arabic" && $"n_cyrillic" >= $"n_devanagari" &&
            $"n_cyrillic" >= $"n_hangul", "cyrillic")
          .when($"n_greek" >= $"n_cjk" && $"n_greek" >= $"n_arabic" &&
            $"n_greek" >= $"n_devanagari" && $"n_greek" >= $"n_hangul",
            "greek")
          .when($"n_cjk" >= $"n_arabic" && $"n_cjk" >= $"n_devanagari" &&
            $"n_cjk" >= $"n_hangul", "cjk")
          .when($"n_arabic" >= $"n_devanagari" && $"n_arabic" >= $"n_hangul",
            "arabic")
          .when($"n_devanagari" >= $"n_hangul", "devanagari")
          .otherwise("hangul"))
      .withColumn("dominant_micro",
        when($"n_scripted" === 0L, 0L)
          .otherwise(expr(
            """(greatest(n_latin, n_cyrillic, n_greek, n_cjk, n_arabic,
              |n_devanagari, n_hangul) * 1000000L) div n_scripted""".stripMargin)))
      .drop("n_scripted")
  }

  /** q203's PLANT: four of five doc classes swap most of their Latin
    * text for a repeated non-Latin token (six copies dominate the
    * 8-char Latin remnant), the fifth rides unchanged — so the CASE
    * chain, every range counter, and the micro fraction all fire on
    * real variety. Every non-ASCII byte is `\uXXXX` here and `chr(N)`
    * in the SQL mirror (the cross-engine unicode-literal rule).
    */
  private[graft] def scriptPlant(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val cyr = "\u043C\u0438\u0440 "            // Cyrillic word + space
    val cjk = "\u4E2D\u6587\u5904\u7406"      // four CJK ideographs
    val ara = "\u0646\u0635 "                   // Arabic word + space
    val grk = "\u03BB\u03CC\u03B3\u03BF\u03C2 " // Greek word + space
    docs.select($"doc_id", concat(
      when($"doc_id" % 5 === 0, lit(cyr * 6))
        .when($"doc_id" % 5 === 1, lit(cjk * 6))
        .when($"doc_id" % 5 === 2, lit(ara * 6))
        .when($"doc_id" % 5 === 3, lit(grk * 6))
        .otherwise(lit("")),
      when($"doc_id" % 5 === 4, $"text")
        .otherwise(substring($"text", 1, 8))).as("text"))
  }

  /** ORACLED exercise (q203): [[scriptProfile]] over the
    * [[scriptPlant]]ed corpus — every per-script count, dominant
    * verdict, and micro fraction re-derived by DuckDB through the
    * identical literal codepoint ranges and integer arithmetic.
    *
    * 100 TB posture: seven regexp_replace length-differences and a
    * CASE chain, all expression-only map work fused into the scan —
    * the q144 zero-shuffle class.
    */
  def q203ScriptProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scriptProfile(scriptPlant(Sources.documents(spark, dir)))
      .orderBy($"doc_id")
  }
}
