package graft

import org.apache.spark.sql.functions._

/** LLM-data text-op unit tests (SURVEY §2.11 L1/L5/L6, §2.9 hash). */
class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("exact dedup keeps the min-id survivor and counts duplicates") {
    val docs = Seq(
      (10L, "alpha beta"), (3L, "alpha beta"), (7L, "alpha beta"),
      (5L, "gamma")).toDF("doc_id", "text")
    val out = docs.groupBy(xxhash64($"text").as("h"))
      .agg(min($"doc_id").as("doc_id"), count(lit(1)).as("dup_count"))
      .select($"doc_id", $"dup_count")
      .as[(Long, Long)].collect().toMap
    assert(out === Map(3L -> 3L, 5L -> 1L))
  }

  test("dedup is idempotent") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val once = docs.groupBy($"text").agg(min($"doc_id").as("doc_id"))
    val twice = once.groupBy($"text").agg(min($"doc_id").as("doc_id"))
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("stopword ratio from integer sums") {
    val toks = split($"text", " ")
    val out = Seq("the cat sat on the mat").toDF("text")
      .select(size(toks).as("n"),
        size(filter(toks, t => t.isInCollection(ops.Text.stopwords))).as("s"))
      .as[(Int, Int)].head()
    assert(out === ((6, 2))) // "the" twice
  }

  test("md5 fingerprint matches the RFC 1321 reference value") {
    val got = Seq("abc").toDF("text").select(md5($"text")).as[String].head()
    assert(got === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("sha2-256 fingerprint matches the NIST reference value") {
    val got = Seq("abc").toDF("text").select(sha2($"text", 256)).as[String].head()
    assert(got === "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("term stats: document frequency counts distinct docs, tf counts occurrences") {
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("doc_id", "text")
    val out = docs.select($"doc_id", explode(split($"text", " ")).as("token"))
      .groupBy($"token")
      .agg(countDistinct($"doc_id").as("df"), count(lit(1)).as("tf"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("x") === ((2L, 3L)))
    assert(out("y") === ((1L, 1L)))
    assert(out("z") === ((1L, 1L)))
  }
}
