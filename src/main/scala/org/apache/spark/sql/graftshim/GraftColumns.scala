package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils

import graft.expressions.{CharBigrams, CharBigramStream, CosineSimilarity, DHash56, EmnistFeatures, InterleaveBits, SimHash64, UnicodeFold, WinnowedGramMins, WinnowFingerprints, WordGramHashes, WordGrams}

/** Column wrappers for graft's custom Catalyst expressions.
  *
  * Lives under `org.apache.spark.sql` solely because Spark 4's
  * Column↔Expression bridge (`classic.ExpressionUtils`) is
  * `private[sql]` — the standard shim pattern for third-party
  * expression libraries. No Spark internals are modified.
  */
object GraftColumns {

  /** Fused single-pass cosine similarity of two array<double> columns
    * (see [[graft.expressions.CosineSimilarity]]).
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Winnowing fingerprints of a string column — sorted distinct
    * window-minima of a rolling k-gram hash (see
    * [[graft.expressions.WinnowFingerprints]]).
    */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(c), k, w))

  /** Positional winnowing — selected (pos, fingerprint) window minima
    * of the rolling k-gram hash, leftmost ties, 1-based positions (see
    * [[graft.expressions.WinnowedGramMins]]).
    */
  def winnowedGramMins(c: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowedGramMins(ExpressionUtils.expression(c), k, w))

  /** Distinct adjacent char bigrams, first-appearance order (see
    * [[graft.expressions.CharBigrams]]).
    */
  def charBigrams(c: Column): Column =
    ExpressionUtils.column(CharBigrams(ExpressionUtils.expression(c)))

  /** ALL adjacent char bigrams with multiplicity — the LM count stream
    * (see [[graft.expressions.CharBigramStream]]).
    */
  def charBigramStream(c: Column): Column =
    ExpressionUtils.column(CharBigramStream(ExpressionUtils.expression(c)))

  /** 64-bit token-level SimHash of a string column, map-only (see
    * [[graft.expressions.SimHash64]]).
    */
  def simHash64(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))

  /** 56-bit perceptual difference hash of a 32×32 grayscale image
    * vector, map-only (see [[graft.expressions.DHash56]]).
    */
  def dHash56(c: Column): Column =
    ExpressionUtils.column(DHash56(ExpressionUtils.expression(c)))

  /** Unicode accent fold — NFD → strip combining marks (Mn/Mc/Me, the
    * utf8proc STRIPMARK set) → NFC; matches DuckDB `strip_accents` on
    * canonical text (see [[graft.expressions.UnicodeFold]]).
    */
  def accentFold(c: Column): Column =
    ExpressionUtils.column(UnicodeFold(ExpressionUtils.expression(c), nfkc = false))

  /** [[accentFold]] with an NFKC compatibility pass first (ﬁ → fi,
    * ① → 1, full-width → ASCII) — the full pipeline normalization; not
    * oracle-able (DuckDB has no NFKC), spec-tested.
    */
  def nfkcFold(c: Column): Column =
    ExpressionUtils.column(UnicodeFold(ExpressionUtils.expression(c), nfkc = true))

  /** All space-joined word n-grams of a token array, in order, with
    * multiplicity — the codegen'd single-pass form of the interpreted
    * `transform(sequence(...), concat_ws)` HOF (see
    * [[graft.expressions.WordGrams]]). Inputs shorter than n yield an
    * empty array; guard call sites with `size(t) >= n` exactly as the
    * HOF form required.
    */
  def wordGrams(c: Column, n: Int): Column =
    ExpressionUtils.column(WordGrams(ExpressionUtils.expression(c), n))

  /** [[wordGrams]] fused with per-gram xxhash64(seed 42) — the shingle
    * stream as one pass (see [[graft.expressions.WordGramHashes]]).
    */
  def wordGramHashes(c: Column, n: Int): Column =
    ExpressionUtils.column(WordGramHashes(ExpressionUtils.expression(c), n))

  /** Morton (Z-order) interleave of two long bucket-rank columns into a
    * 64-bit sort key (see [[graft.expressions.InterleaveBits]]).
    */
  def interleaveBits(x: Column, y: Column): Column =
    ExpressionUtils.column(InterleaveBits(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y)))

  /** One EMNIST-fixture feature row from (label, row_id) — bit-identical
    * to the xxhash64 HOF formulation (see
    * [[graft.expressions.EmnistFeatures]]).
    */
  def emnistFeatures(label: Column, rowId: Column, dim: Int, seed: Long): Column =
    ExpressionUtils.column(EmnistFeatures(
      ExpressionUtils.expression(label), ExpressionUtils.expression(rowId), dim, seed))

  /** True when the session's CacheManager holds no cached plans — the
    * test probe for "no persist outlives its query" (the CacheManager is
    * `private[sql]`, hence exposed through this shim).
    */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** The checkpointed RDD backing a `localCheckpoint`'d Dataset, if that
    * is what the Dataset is. Lets iterative algorithms release each
    * round's checkpoint blocks as soon as the next round is materialized
    * (`Dataset` itself exposes no unpersist for checkpoint storage, and
    * leaving every round's blocks to the ContextCleaner piles them up
    * across a long session — the round-3 bench's `Block ... already
    * exists` tail). `LogicalRDD` is `private[sql]`, hence this shim.
    */
  def checkpointRdd(df: org.apache.spark.sql.Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }
}
