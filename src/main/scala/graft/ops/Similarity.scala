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
    * the oracle accumulate identically).
    */
  def q22CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Sources.embeddings(spark, dir)
      .withColumn("vec", transform($"embedding", _.cast("double")))
    val query = emb.filter($"vec_id" === 0).select($"vec".as("qv"))
    emb.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(query))
      .select(
        $"vec_id", $"label",
        (dot($"vec", $"qv") /
          (sqrt(dot($"vec", $"vec")) * sqrt(dot($"qv", $"qv")))).as("cos"))
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
}
