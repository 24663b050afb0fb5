package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
