package graft

import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer tests (SURVEY §2.11 L11, second family): the
  * integer Viterbi kernel against brute-force enumeration, the
  * frequency-scored vocab against hand math, and the EM fit's learned
  * behavior (the q97/q105 verification class for fits).
  */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  test("viterbi matches brute-force minimum over all segmentations, " +
      "with the longest-piece-from-the-end tie-break") {
    val rnd = new scala.util.Random(7)
    def bruteBest(word: String, v: ops.Unigram.Vocab): Long = {
      def rec(p: Int): Long =
        if (p == word.length) 0L
        else (1 to math.min(v.maxLen, word.length - p)).flatMap { l =>
          v.pieces.get(word.substring(p, p + l)).flatMap { c =>
            val rest = rec(p + l)
            if (rest < 0) None else Some(c + rest)
          }
        }.foldLeft(-1L)((acc, x) => if (acc < 0 || x < acc) x else acc)
      rec(0)
    }
    (0 until 50).foreach { _ =>
      val alphabet = "abc"
      val pieces = scala.collection.mutable.Map[String, Long]()
      alphabet.foreach(ch => pieces(ch.toString) = 1 + rnd.nextInt(10).toLong)
      (0 until 6).foreach { _ =>
        val len = 2 + rnd.nextInt(2)
        val s = Seq.fill(len)(alphabet(rnd.nextInt(3))).mkString
        pieces(s) = 1 + rnd.nextInt(12).toLong
      }
      val v = ops.Unigram.Vocab(pieces.toMap, 3)
      val word = Seq.fill(4 + rnd.nextInt(8))(alphabet(rnd.nextInt(3))).mkString
      val (seg, cost) = ops.Unigram.viterbi(word, v)
      assert(seg.mkString === word, "segmentation must concatenate back")
      assert(cost === bruteBest(word, v), s"word $word vocab $pieces")
      assert(seg.map(v.pieces).sum === cost, "piece costs must sum to cost")
      // tie-break: walking from the end, no longer piece could have
      // been chosen at the same total cost
      var p = word.length
      seg.reverse.foreach { piece =>
        val prefixCost = ops.Unigram.viterbi(word.substring(0, p - piece.length), v)._2
        ((piece.length + 1) to math.min(3, p)).foreach { l =>
          val longer = word.substring(p - l, p)
          v.pieces.get(longer).foreach { c =>
            val viaLonger = ops.Unigram.viterbi(word.substring(0, p - l), v)._2
            if (viaLonger >= 0)
              assert(viaLonger + c > prefixCost + v.pieces(piece),
                s"longest-piece tie-break violated at pos $p of $word")
          }
        }
        p -= piece.length
      }
    }
    // unsegmentable: a char outside the vocab
    val v = ops.Unigram.Vocab(Map("a" -> 1L), 3)
    val (useg, ucost) = ops.Unigram.viterbi("ab", v)
    assert(useg.toSeq === Seq("ab") && ucost === -1L)
  }

  test("charGramVocab: hand-checked micro costs and top-k selection") {
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val v = ops.Unigram.charGramVocab(docs, kGram = 1)
    // chars: a x2, b x3 -> N = 5; 2-grams: ab x2 (only one, kept)
    def cost(c: Long) = math.floor(-math.log(c / 5.0) * 1e6 + 0.5).toLong
    assert(v.pieces === Map("a" -> cost(2), "b" -> cost(3), "ab" -> cost(2)))
    // "ab" (one piece, cost(2)) beats "a|b" (cost(2) + cost(3))
    val (seg, _) = ops.Unigram.viterbi("ab", v)
    assert(seg.toSeq === Seq("ab"))
  }

  test("fitEm concentrates mass on repeated multi-char pieces and beats " +
      "the char baseline") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, "abab ababab cd abab cd ababab")).toDF("doc_id", "text")
    val learned = ops.Unigram.fitEm(docs, vocabSize = 10, iterations = 3)
    assert(learned.pieces.size <= 10)
    // segmentability: every corpus char survives pruning
    Seq("a", "b", "c", "d").foreach(c => assert(learned.pieces.contains(c)))
    // the dominant repeated piece is learned cheap: tokenizing "ababab"
    // uses multi-char pieces, not 6 chars
    val (seg, _) = ops.Unigram.viterbi("ababab", learned)
    assert(seg.length <= 3, s"learned vocab must compress: ${seg.toSeq}")
    assert(seg.forall(p => p.length >= 2), s"chars-only segmentation: ${seg.toSeq}")
    // the learned arm feeds the same tokenize() surface
    val out = ops.Unigram.tokenize(Seq("ababab", "cd").toDF("word"), learned)
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out("ababab")._2 === seg.length.toLong)
    assert(out("cd")._4.split('|').forall(learned.pieces.contains))
  }

  test("unigramCount packs: per-doc counts equal the per-word tokenize " +
      "sums and drive sequencePack") {
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val vocab = ops.Unigram.charGramVocab(docs)
    val viaCount = docs
      .select($"doc_id", ops.Unigram.unigramCount(vocab)($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    val viaTokenize = docs
      .select($"doc_id", explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0)
      .as[(Long, String)].collect()
      .groupBy(_._1)
      .map { case (id, ws) =>
        id -> ws.map(w => ops.Unigram.viterbi(w._2, vocab)._1.length.toLong).sum
      }
    viaTokenize.foreach { case (id, n) =>
      assert(viaCount(id) === n, s"doc $id")
    }
    // the count column drops into the packing family unchanged
    val packed = ops.Packing.sequencePack(docs, "doc_id",
      ops.Unigram.unigramCount(vocab)($"text"), 512L)
    assert(packed.count() > 0)
    val total = packed.agg(sum($"n_tokens")).head.getLong(0)
    assert(total === viaTokenize.values.sum)
  }

  test("unigram tokenize applies UNCHANGED to a streaming frame") {
    // the segmentation UDF is stateless, so the BATCH FUNCTION is the
    // streaming twin — the semanticDecontaminate precedent
    implicit val sql = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val vocab = ops.Unigram.charGramVocab(docs)
    val words = docs.select(explode(split($"text", " ")).as("word"))
      .filter(length($"word") > 0).distinct()
    val batch = ops.Unigram.tokenize(words, vocab)
      .as[(String, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val input = MemoryStream[String]
    val q = ops.Unigram.tokenize(input.toDF().withColumnRenamed("value", "word"),
        vocab)
      .writeStream.format("memory").queryName("unigram_stream")
      .outputMode("append").start()
    try {
      input.addData(batch.keys.toSeq: _*)
      q.processAllAvailable()
      val out = spark.table("unigram_stream")
        .as[(String, Long, Long, String)].collect()
      assert(out.length === batch.size)
      out.foreach(r => assert(r === batch(r._1), s"word ${r._1}"))
    } finally q.stop()
  }

  test("q173 tokenizes the q171 target set under the EM vocab and " +
      "publishes the fitted table for the oracle; q174 packs under " +
      "unigram counts") {
    val dir = "/root/testdata/sf0.001"
    ops.Unigram.lastEmVocab = None
    val em = ops.Unigram.q173UnigramEmTokenize(spark, dir)
      .as[(String, Long, Long, String)].collect()
    assert(em.nonEmpty)
    val fitted = ops.Unigram.lastEmVocab
    assert(fitted.nonEmpty, "q173 must hand its vocab to the oracle")
    em.foreach { case (w, np, cost, seg) =>
      assert(seg.split('|').mkString === w, s"round-trip $w")
      assert(np === seg.split('|').length.toLong && cost > 0L)
    }
    // same target set as q171 — the two arms differ ONLY in costs
    val freq = ops.Unigram.q171UnigramTokenize(spark, dir)
      .select($"word").as[String].collect()
    assert(em.map(_._1).sorted === freq.sorted)
    // q174: packed totals equal the sum of per-doc unigram counts
    val docs = ops.Sources.documents(spark, dir)
    val vocab = ops.Unigram.charGramVocab(docs)
    val expected = docs
      .select(ops.Unigram.unigramCount(vocab)($"text").as("n"))
      .filter($"n" > 0).agg(sum($"n")).head.getLong(0)
    val packed = ops.Unigram.q174UnigramPack(spark, dir)
    assert(packed.agg(sum($"n_tokens")).head.getLong(0) === expected)
    val last = packed.agg(max($"last_example")).head.getLong(0)
    assert(last === (expected - 1) / 512, "boundaries lay out one tape")
  }

  test("unigram vocab round-trips through CurationIndex: both fitting " +
      "arms persist, reload, and tokenize a NEW batch with no refit") {
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    Seq(
      "freq" -> ops.Unigram.charGramVocab(docs, kGram = 50),
      "em" -> ops.Unigram.fitEm(docs, vocabSize = 80, iterations = 2)
    ).foreach { case (arm, fit) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-unigram-$arm").toString
      ops.CurationIndex.writeUnigram(spark, dir, fit)
      val loaded = ops.CurationIndex.loadUnigram(spark, dir)
      assert(loaded === fit,
        s"$arm: exact round-trip (integer micro-grid costs, maxLen)")
      // the delta apply path: words the fit session never materialized
      // segment identically under the loaded vocab — boundaries, costs
      val newWords = Seq("freshcompound", "neverseen", "ab")
        .toDF("word")
      val a = ops.Unigram.tokenize(newWords, fit)
        .as[(String, Long, Long, String)].collect().sortBy(_._1)
      val b = ops.Unigram.tokenize(newWords, loaded)
        .as[(String, Long, Long, String)].collect().sortBy(_._1)
      assert(a === b, s"$arm: tokenize parity under the loaded vocab")
    }
    // a marker-less directory fails descriptively
    val bad = java.nio.file.Files
      .createTempDirectory("graft-unigram-bad").toString
    Seq(("a", 5L)).toDF("piece", "cost_micro")
      .write.parquet(s"$bad/unigram_pieces")
    Seq(3).toDF("max_len").write.parquet(s"$bad/unigram_meta")
    val e = intercept[IllegalArgumentException] {
      ops.CurationIndex.loadUnigram(spark, bad)
    }
    assert(e.getMessage.contains("format"))
    // a lookback shorter than the longest piece fails loudly — the DP
    // would silently never consider long pieces
    val short = java.nio.file.Files
      .createTempDirectory("graft-unigram-short").toString
    Seq(("a", 5L), ("abc", 2L)).toDF("piece", "cost_micro")
      .write.parquet(s"$short/unigram_pieces")
    Seq((1, 2L)).toDF("max_len", "format")
      .write.parquet(s"$short/unigram_meta")
    val s = intercept[IllegalArgumentException] {
      ops.CurationIndex.loadUnigram(spark, short)
    }
    assert(s.getMessage.contains("max_len"))
  }

  test("q171 targets cover words and compounds; every row round-trips") {
    val out = ops.Unigram.q171UnigramTokenize(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (w, np, cost, seg) =>
      assert(seg.split('|').mkString === w, s"round-trip $w")
      assert(np === seg.split('|').length.toLong)
      assert(cost > 0L)
    }
    assert(out.exists(_._1.length > 8), "compounds present (words are <= 8)")
    assert(out.exists(_._2 >= 3L), "multi-piece segmentations present")
  }
}
