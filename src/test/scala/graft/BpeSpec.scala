package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** Learned-BPE trainer/tokenizer (SURVEY §2.11 L7 extension, q118). */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("fit learns the hand-computable merge sequence") {
    // corpus: "low" x4, "lower" x2 -> pair counts round 1:
    // (l,o)=6, (o,w)=6, (w,e)=2, (e,r)=2 -> tie (l,o) vs (o,w) breaks
    // lexicographically to (l,o); round 2: (lo,w)=6 wins; round 3:
    // ties (low,e)/(w... -> (low,e)=2, (e,r)=2 -> (e,r) ... compare:
    // after (lo,w): words are [low] and [low,e,r]; pairs: (low,e)=2,
    // (e,r)=2 -> lexicographic: "e" < "low" -> (e,r) first.
    val docs = Seq(
      (1L, "low low low"),
      (2L, "low lower lower")).toDF("doc_id", "text")
    val m = Bpe.fit(docs, numMerges = 4)
    assert(m.pairs === IndexedSeq(
      ("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
  }

  test("fit stops early when the vocabulary runs out of pairs") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    // only 2 merges are learnable: (a,b), (c,d), then every word is one
    // symbol and the pair table is empty
    val m = Bpe.fit(docs, numMerges = 10)
    assert(m.pairs === IndexedSeq(("a", "b"), ("c", "d")))
  }

  test("rank-order replay equals the lowest-rank-first reference tokenizer") {
    // the classic BPE encode loop: repeatedly merge the lowest-rank
    // pair present anywhere in the word
    def reference(word: String, m: Bpe.Merges): Int = {
      val rank = m.pairs.zipWithIndex.toMap
      var syms = word.map(_.toString).toArray
      var done = false
      while (!done && syms.length > 1) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
          if (r < bestRank) bestRank = r
          i += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val (a, b) = m.pairs(bestRank)
          syms = Bpe.applyMerge(syms, a, b)
        }
      }
      syms.length
    }
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde"
    val words = (0 until 200).map(_ =>
      (0 until (1 + rnd.nextInt(10)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val docs = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val m = Bpe.fit(docs, numMerges = 15)
    assert(m.pairs.length === 15, "dense random corpus must fill all merges")
    words.distinct.foreach { w =>
      assert(Bpe.tokenCount(w, m) === reference(w, m).toLong, w)
    }
  }

  test("bpeCount column sums per-word token counts; empty and null texts are 0") {
    val docs = Seq((1L, "low lower low"), (2L, "unseen xyz"))
      .toDF("doc_id", "text")
    val m = Bpe.fit(docs, numMerges = 3)
    val counted = docs
      .withColumn("n", Bpe.bpeCount(m)($"text"))
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    def manual(text: String) = text.split(" ").filter(_.nonEmpty)
      .map(w => Bpe.tokenCount(w, m)).sum
    assert(counted(1L) === manual("low lower low"))
    assert(counted(2L) === manual("unseen xyz"))
    val edge = Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .withColumn("n", Bpe.bpeCount(m)($"text"))
      .select($"n").as[Long].collect()
    assert(edge.toSeq === Seq(0L, 0L, 0L))
  }

  test("self-pair runs merge left-to-right non-overlapping") {
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "b", "a", "b"), "a", "b").toSeq ===
      Seq("ab", "ab"))
  }

  test("merge table round-trips through CurationIndex: fit once, load in " +
      "a later session, tokenize a NEW batch with no refit") {
    val corpus = Seq((1L, "low lower lowest low low"),
      (2L, "newer lower low wide")).toDF("doc_id", "text")
    val fit = Bpe.fit(corpus, numMerges = 6)
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    ops.CurationIndex.writeBpe(spark, dir, fit)
    val loaded = ops.CurationIndex.loadBpe(spark, dir)
    assert(loaded === fit, "exact table round-trip, rank order included")
    // the delta apply path: a batch the fit never saw tokenizes
    // identically under the loaded table — no corpus pass
    val newBatch = Seq((10L, "lower and slower"), (11L, "lowest low"))
      .toDF("doc_id", "text")
    val a = newBatch.select($"doc_id", Bpe.bpeCount(fit)($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    val b = newBatch.select($"doc_id", Bpe.bpeCount(loaded)($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(a === b)
    // a marker-less directory fails descriptively, not silently
    val bad = java.nio.file.Files.createTempDirectory("graft-bpe-bad").toString
    Seq((0, "l", "o")).toDF("rank", "a", "b")
      .write.parquet(s"$bad/bpe_merges")
    Seq(99L).toDF("other").write.parquet(s"$bad/bpe_meta")
    val e = intercept[IllegalArgumentException] {
      ops.CurationIndex.loadBpe(spark, bad)
    }
    assert(e.getMessage.contains("format"))
    // a rank gap fails loudly — rank order IS the algorithm
    val gap = java.nio.file.Files.createTempDirectory("graft-bpe-gap").toString
    Seq((0, "l", "o"), (2, "lo", "w")).toDF("rank", "a", "b")
      .write.parquet(s"$gap/bpe_merges")
    Seq(2L).toDF("format").write.parquet(s"$gap/bpe_meta")
    val g = intercept[IllegalArgumentException] {
      ops.CurationIndex.loadBpe(spark, gap)
    }
    assert(g.getMessage.contains("0..n-1"))
  }

  test("fertility discriminates: in-distribution text compresses better than gibberish") {
    // corpus dominated by a few repeated words -> merges learn their
    // bigrams -> those words tokenize short (high chars/token); a
    // gibberish doc over characters the merges never cover stays
    // 1 token per char (ratio -> 1, modulo its repeated-word prefix)
    val indist = "hello world hello world hello world hello world"
    val docs = ((1L to 8L).map(i => (i, indist)) :+
      (9L, "hello xq zv kj wp yf xq zv kj wp yf")).toDF("doc_id", "text")
    val m = Bpe.fit(docs, numMerges = 8)
    val out = docs
      .select($"doc_id", Bpe.bpeCount(m)($"text").as("n_tokens"),
        length($"text").cast("long").as("n_chars"))
      .withColumn("cpt", $"n_chars".cast("double") / $"n_tokens")
      .select($"doc_id", $"cpt").as[(Long, Double)].collect().toMap
    assert(out(1L) > out(9L),
      s"in-distribution ${out(1L)} must compress better than gibberish ${out(9L)}")
    assert(out(1L) > 2.0, s"learned merges must compress the dominant words: ${out(1L)}")
  }
}
