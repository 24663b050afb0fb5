package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Packing

/** Training-example shaping (hash split / sequence packing / chunking).
  * The packing prefix sum is checked against the single-partition global
  * window (the oracle formulation) and for partition-count invariance;
  * chunking is checked for exact coverage and overlap reconstruction.
  */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int, seed: Long): org.apache.spark.sql.DataFrame = {
    val gen = Gen.listOfN(n, Gen.choose(0, 40))
    val lens = gen.apply(Gen.Parameters.default, Seed(seed)).get
    lens.zipWithIndex.map { case (l, i) => (i.toLong, "x " * l) }
      .toDF("doc_id", "text")
  }

  test("sequencePack matches the global-window prefix sum exactly") {
    val df = docs(300, 1L)
    val tokens = size(split($"text", " ", -1)).cast("long")
    val packed = Packing.sequencePack(df, "doc_id", tokens, 16L)
      .select($"doc_id", $"n_tokens", $"first_example", $"last_example", $"n_examples")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    val gw = Window.orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val oracle = df.select($"doc_id", tokens.as("n_tokens"))
      .filter($"n_tokens" > 0)
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(gw), lit(0L)))
      .select($"doc_id", $"n_tokens",
        expr("cum_before div 16").as("f"),
        expr("(cum_before + n_tokens - 1) div 16").as("l"))
      .withColumn("n", $"l" - $"f" + 1L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)

    assert(packed.toSeq === oracle.toSeq)
    // spot global invariants: first doc starts at example 0, spans abut
    assert(packed.head._3 === 0L)
    packed.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b._3 === a._4 || b._3 === a._4 + 1,
          s"doc ${b._1} first_example ${b._3} vs prior last ${a._4}")
      case _ => ()
    }
  }

  test("exampleSpans: windows tile exactly, per-doc spans sum to its " +
      "tokens, and the incidence set matches sequencePackWithOffsets") {
    val df = docs(300, 7L)
    val tokens = size(split($"text", " ", -1)).cast("long")
    val ctx = 16L
    val spans = Packing.exampleSpans(df, "doc_id", tokens, ctx)
      .as[(Long, Long, Long, Long, Long)].collect()
    val packed = Packing.sequencePackWithOffsets(df, "doc_id", tokens, ctx)
      .select($"doc_id", $"n_tokens", $"first_example", $"last_example",
        $"tok_start")
      .as[(Long, Long, Long, Long, Long)].collect()
    // every span inside its window, non-empty, window-local
    spans.foreach { case (id, e, s, t, n) =>
      assert(s >= 0 && s < t && t <= ctx && n === t - s,
        s"doc $id window $e span [$s,$t)")
    }
    // incidence set == the packed doc->window ranges
    val expectedPairs = packed.flatMap { case (id, _, f, l, _) =>
      (f to l).map(e => (id, e)) }.toSet
    assert(spans.map(r => (r._1, r._2)).toSet === expectedPairs)
    // per-doc span totals give back the doc's token count
    val perDoc = spans.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    packed.foreach { case (id, n, _, _, _) =>
      assert(perDoc(id) === n, s"doc $id span sum") }
    // every window is tiled end to end: spans abut from 0 to ctx
    // (the last window ends at the tape's end instead)
    val total = packed.map(_._2).sum
    val lastExample = (total - 1) / ctx
    spans.groupBy(_._2).foreach { case (e, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"window $e must start at 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._4, s"window $e gap at ${a._4}")
        case _ => ()
      }
      val end = sorted.last._4
      if (e < lastExample) assert(end === ctx, s"window $e underfilled")
      else assert(end === total - e * ctx, s"last window $e end $end")
    }
  }

  test("shard integrity: digests are order-independent, verify flags " +
      "exactly the tampered shards, and a lost shard reads as corrupt") {
    val df = docs(200, 11L)
    val tokens = size(split($"text", " ", -1)).cast("long")
    val packed = Packing.sequencePack(df, "doc_id", tokens, 16L)
    val manifest = Packing.shardIntegrityManifest(packed, 4)
    // clean round trip verifies everywhere
    val clean = Packing.verifyShards(manifest, packed, 4)
      .select($"shard_id", $"ok").as[(Long, Boolean)].collect().toMap
    assert(clean.size === 4 && clean.values.forall(identity))
    // tampering: drop one doc from the received packing — the packing
    // FRAME is tampered (not repacked), the transport-corruption model
    val tampered = packed.filter($"doc_id" =!= 7L)
    val flagged = Packing.verifyShards(manifest, tampered, 4)
      .select($"shard_id", $"ok").as[(Long, Boolean)].collect().toMap
    val doc7Shards = packed.filter($"doc_id" === 7L)
      .select(explode(sequence($"first_example", $"last_example")).as("e"))
      .select($"e" % 4)
      .as[Long].collect().toSet
    assert(doc7Shards.nonEmpty)
    flagged.foreach { case (sid, ok) =>
      assert(ok === !doc7Shards.contains(sid),
        s"shard $sid: expected flagged=${doc7Shards.contains(sid)}")
    }
    // a shard missing entirely verifies false, not null/true
    val lost = Packing.verifyShards(manifest,
        Packing.sequencePack(df.filter($"doc_id" % 4 =!= 0), "doc_id",
          tokens, 16L).filter(lit(false)), 4)
      .select($"ok").as[Boolean].collect()
    assert(lost.length === 4 && lost.forall(_ == false))
    // XOR-cancelling corruption (round-18 advice): a member present 3x
    // contributes h^h^h = h — the digest alone verifies ok; the member
    // COUNTS must catch it. Triplicate doc 7's packing rows and assert
    // exactly its shards flag false (and digest equality alone would
    // have passed — asserted via the received_digest column).
    val doc7 = packed.filter($"doc_id" === 7L)
    val tripled = packed.union(doc7).union(doc7)
    val xorCancelled = Packing.verifyShards(manifest, tripled, 4)
      .select($"shard_id", $"ok", $"digest" <=> $"received_digest")
      .as[(Long, Boolean, Boolean)].collect()
    xorCancelled.foreach { case (sid, ok, digestOk) =>
      assert(digestOk, s"shard $sid: XOR digest must cancel under 3x")
      assert(ok === !doc7Shards.contains(sid),
        s"shard $sid: counts must flag the triplication")
    }
  }

  test("sequencePackByGroup equals sequencePack run on each group's " +
      "slice — the base-subtraction recovers every per-group tape") {
    val df = docs(300, 13L)
      .withColumn("grp", concat(lit("g"), (col("doc_id") % 4).cast("string")))
    val tokens = size(split($"text", " ", -1)).cast("long")
    val grouped = Packing.sequencePackByGroup(df, "grp", "doc_id", tokens, 16L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(grouped.nonEmpty && grouped.map(_._1).distinct.length === 4)
    grouped.groupBy(_._1).foreach { case (g, rows) =>
      val expected = Packing.sequencePack(df.filter($"grp" === g),
          "doc_id", tokens, 16L)
        .select($"doc_id", $"n_tokens", $"first_example", $"last_example",
          $"n_examples")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      assert(rows.length === expected.size, s"group $g row count")
      rows.foreach { case (_, id, n, f, l, ne) =>
        assert(expected(id) === ((id, n, f, l, ne)),
          s"group $g doc $id: grouped tape must equal the single-group pack")
      }
      // each group's tape starts at window 0
      assert(rows.map(_._4).min === 0L, s"group $g must start at example 0")
    }
  }

  test("q196: re-ship verdicts fire both ways and shard taint traces " +
      "back to q112's contaminated docs") {
    val out = ops.Packing
      .q196ContaminationShards(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    assert(out.length === 8)
    assert(out.exists(_._5) && out.exists(!_._5),
      "the fixture must ship both clean and tainted shards")
    out.foreach { case (sid, nEx, nTd, nTe, reship) =>
      assert(reship === (nTe > 0), s"shard $sid verdict")
      assert(nTe <= nEx && (nTd == 0) == (nTe == 0), s"shard $sid counts")
    }
    // every contaminated doc lands in >= 1 shard: summed per-shard doc
    // counts bound the distinct q112 doc list from above
    val contaminated = ops.SpanDedup
      .q112Decontaminate(spark, "/root/testdata/sf0.01").count()
    assert(out.map(_._3).sum >= contaminated,
      "shard rollup must cover every contaminated doc")
  }

  test("sequencePack is invariant to the shuffle partition count") {
    val df = docs(200, 2L)
    val tokens = size(split($"text", " ", -1)).cast("long")
    def run(): Seq[(Long, Long, Long, Long, Long)] =
      Packing.sequencePack(df, "doc_id", tokens, 32L)
        .select($"doc_id", $"n_tokens", $"first_example", $"last_example", $"n_examples")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val base = run()
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      for (p <- Seq("1", "5", "17")) {
        spark.conf.set(key, p)
        assert(run() === base, s"partitions=$p")
      }
    } finally spark.conf.set(key, saved)
  }

  test("sequencePack plans no single-partition exchange (scale posture)") {
    val df = docs(100, 3L)
    val tokens = size(split($"text", " ", -1)).cast("long")
    val plan = Packing.sequencePack(df, "doc_id", tokens, 64L)
      .queryExecution.executedPlan.toString
    // the global prefix sum must come from the pid-keyed window + the
    // broadcast offsets, never from an ORDER-BY-all window
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("hashSplit is deterministic, exhaustive, and disjoint") {
    val df = (0L until 500L).toDF("doc_id")
    val s1 = Packing.hashSplit(df, "doc_id")
      .select($"doc_id", $"bucket", $"split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    val s2 = Packing.hashSplit(df.repartition(7), "doc_id")
      .select($"doc_id", $"bucket", $"split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(s1.toSeq === s2.toSeq)          // layout-independent
    assert(s1.length === 500)              // exhaustive
    assert(s1.forall(r => r._2 >= 0 && r._2 < 1000))
    val bySplit = s1.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    // ~80/10/10 with hash noise: train must dominate clearly
    assert(bySplit("train") > 350 && bySplit("train") < 450)
  }

  test("chunkDocs covers every char; overlap region repeats exactly") {
    val texts = Seq("", "a", "a" * 127, "a" * 128, "b" * 129,
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val chunks = Packing.chunkDocs(df, "doc_id", "text", 128, 96)
      .select($"doc_id", $"chunk_id", $"chunk_text")
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    assert(!chunks.contains(0L))           // empty text yields no chunks
    texts.zipWithIndex.filter(_._1.nonEmpty).foreach { case (t, i) =>
      val cs = chunks(i.toLong)
      // stride-96 prefixes reconstruct the document exactly
      val rebuilt = cs.init.map(_.take(96)).mkString + cs.last
      assert(rebuilt === t, s"doc $i")
      // every chunk but the last is full-width
      assert(cs.init.forall(_.length === 128))
      // consecutive chunks share the 32-char overlap
      cs.sliding(2).foreach {
        case Seq(a, b) => assert(a.drop(96) === b.take(a.length - 96))
        case _         => ()
      }
    }
  }

  test("shard manifest: examples balanced within one, covers every example, " +
      "partition-invariant") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, "tok " * (i % 37 + 1).toInt))
      .toDF("doc_id", "text")
    val packed = ops.Packing.sequencePack(docs, "doc_id",
      size(split($"text", " ")).cast("long"), 64L)
    val man = ops.Packing.shardManifest(packed, 5)
      .orderBy($"shard_id").collect()
    assert(man.length === 5)
    val counts = man.map(_.getLong(1))
    assert(counts.max - counts.min <= 1L,
      s"round-robin must balance within one example: ${counts.toSeq}")
    // every example id 0..max appears in exactly one shard
    val maxEx = packed.agg(max($"last_example")).as[Long].head()
    assert(counts.sum === maxEx + 1L)
    // pure function of the example id — repartitioning changes nothing
    val man2 = ops.Packing.shardManifest(
      ops.Packing.sequencePack(docs.repartition(13), "doc_id",
        size(split($"text", " ")).cast("long"), 64L), 5)
      .orderBy($"shard_id").collect()
    assert(man.toSeq === man2.toSeq)
  }

  test("q92/q93/q94 run green on the sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    val pack = graft.SparkEntry.queries("q92_sequence_pack")(spark, dir)
    val packRows = pack.collect()
    assert(packRows.nonEmpty)
    val split = graft.SparkEntry.queries("q93_hash_split")(spark, dir)
    assert(split.select("split").distinct().count() === 3)
    val chunk = graft.SparkEntry.queries("q94_chunk_docs")(spark, dir)
    assert(chunk.count() > 0)
  }

  test("leakageFreeSplit: duplicate families never straddle splits, and " +
    "the cluster keying is load-bearing vs per-doc hashSplit") {
    val out = ops.Packing.leakageFreeSplit(
        ops.Sources.documents(spark, "/root/testdata/sf0.001"))
      .select($"doc_id", $"cluster_id", $"split")
      .as[(Long, Long, String)].collect()
    // defining invariant: one split per near-dup cluster
    out.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"cluster $c straddles splits: ${members.toSeq}")
    }
    // singletons (cluster_id == own id) reproduce plain hashSplit
    val plain = ops.Packing.q93HashSplit(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    out.filter(r => r._1 == r._2).foreach { r =>
      assert(plain(r._1) === r._3)
    }
    // the operator must be doing real work on this fixture: at least
    // one multi-member family exists whose members' PER-DOC hash
    // splits disagree (i.e. hashSplit alone would leak it)
    val leaky = out.groupBy(_._2).values.exists(m =>
      m.length > 1 && m.map(r => plain(r._1)).distinct.length > 1)
    assert(leaky, "fixture has no family that plain hashSplit would split" +
      " — the test proves nothing; grow the fixture")
  }

  test("lengthBucketedBatches: full coverage, bounded batches, bounded " +
    "in-batch spread, and less padding waste than id-order batching") {
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val counted = docs.select($"doc_id",
        ops.Packing.bpeishCount($"text").as("n"))
      .filter($"n" > 0).as[(Long, Long)].collect()
    val out = ops.Packing.lengthBucketedBatches(docs, "doc_id",
        ops.Packing.bpeishCount($"text"))
      .select($"bucket", $"batch_in_bucket", $"n_examples", $"max_len",
        $"sum_tokens", $"waste_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // coverage and batch-size cap
    assert(out.map(_._3).sum === counted.length)
    assert(out.forall(_._3 <= 8))
    // every batch's max_len lives in its bucket's length band
    assert(out.forall(b => b._4 / 32 === b._1))
    // the point of the operator: less padding than naive id-order
    // batching of the same examples
    val naive = counted.sortBy(_._1).grouped(8)
      .map(g => g.map(_._2).max * g.length - g.map(_._2).sum).sum
    assert(out.map(_._6).sum <= naive,
      s"bucketed waste ${out.map(_._6).sum} > id-order waste $naive")
  }

  test("splitLeakageAudit: cluster-keyed splitting strictly reduces " +
    "cross-split gram sharing on a corpus with duplicate families") {
    val rows = ops.Packing.splitLeakageAudit(
        ops.Sources.documents(spark, "/root/testdata/sf0.001"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val doc = rows("doc_hash"); val clus = rows("cluster_hash")
    // same corpus both schemes; singleton docs keep their assignment
    assert(doc._2 + doc._3 > 0 && clus._2 + clus._3 > 0)
    assert(clus._4 < doc._4,
      s"cluster split should share fewer grams: ${clus._4} vs ${doc._4}")
    assert(clus._5 <= doc._5)
  }

  test("deletionBlastRadius: interval algebra hand-checked, clean " +
      "examples never appear, boundary-straddling docs split exactly") {
    // tape (ctx=10): doc1 tokens [0,7], doc2 [8,14], doc3 [15,24],
    // doc4 [25,29] -> examples: e0=[0,9], e1=[10,19], e2=[20,29]
    val docs = Seq(
      (1L, 8L), (2L, 7L), (3L, 10L), (4L, 5L)
    ).toDF("doc_id", "n_tokens")
    val packed = ops.Packing.sequencePackWithOffsets(
      docs, "doc_id", $"n_tokens", 10L)
    // delete doc2 (straddles e0/e1): tainted = {e0, e1}; e2 untouched
    val got = ops.Packing.deletionBlastRadius(packed, $"doc_id" === 2L, 10L)
      .orderBy($"example_id")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length === 2, "e2 has no deleted tokens and must not appear")
    // e0: doc1 8 surviving + doc2 2 deleted; e1: doc2 5 deleted +
    // doc3 5 surviving
    assert(got(0) === ((0L, 2L, 8L, 2L, 1L)))
    assert(got(1) === ((1L, 5L, 5L, 2L, 1L)))
    // deleting a doc wholly inside one example taints exactly that one
    val got3 = ops.Packing.deletionBlastRadius(packed, $"doc_id" === 4L, 10L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got3 === Array((2L, 5L, 5L, 2L, 1L)))
  }

  test("repackAfterDeletion: every doc before the first deleted token " +
      "keeps its coordinates; the tape only shifts left after it") {
    val out = ops.Packing.q153RepackDeleted(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"tok_start", $"old_first", $"old_last",
        $"new_first", $"new_last", $"moved")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
    assert(out.nonEmpty && out.forall(_._1 % 37 != 5),
      "deleted docs never appear in the repack")
    // first deleted doc's tape offset bounds the stable prefix
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val firstDeletedStart = ops.Packing.sequencePackWithOffsets(
        docs, "doc_id", ops.Packing.bpeishCount($"text"), 512L)
      .filter($"doc_id" % 37 === 5)
      .agg(min($"tok_start")).as[Long].head()
    out.foreach { r =>
      if (r._2 < firstDeletedStart)
        assert(!r._7, s"doc ${r._1} precedes the first deletion but moved")
    }
    assert(out.exists(_._7), "docs after a deletion must shift")
    // examples only ever shift LEFT (tokens were removed)
    assert(out.forall(r => r._5 <= r._3 && r._6 <= r._4))
  }

  test("sequencePackWithOffsets: range shuffle frozen once (checkpoint " +
      "barrier in the plan) and offsets equal the global prefix sum") {
    val rnd = new scala.util.Random(41)
    val docs = (0L until 5000L).map(i => (i, 1L + rnd.nextInt(200).toLong))
      // adversarial partitioning: ids scattered across 17 input splits
      .toDF("doc_id", "n_tokens").repartition(17)
    val packed = ops.Packing.sequencePackWithOffsets(
      docs, "doc_id", $"n_tokens", 512L)
    // the two passes must read ONE materialized range shuffle — the
    // checkpoint shows up as an ExistingRDD scan; without it the
    // RangePartitioner re-samples per job and the pid→offset map can
    // misapply at scale (partial-sample bound drift)
    assert(packed.queryExecution.executedPlan.toString
        .contains("ExistingRDD"),
      "the ranged frame must be checkpointed before the offset passes")
    val got = packed.select($"doc_id", $"tok_start")
      .as[(Long, Long)].collect().sortBy(_._1)
    // driver-side oracle: the global id-ordered running sum
    val toks = docs.as[(Long, Long)].collect().sortBy(_._1)
    var run = 0L
    val oracle = toks.map { case (id, n) => val o = run; run += n; (id, o) }
    assert(got.toSeq === oracle.toSeq)
  }

  test("budgetTruncate: kept set is the longest quality-order prefix " +
      "whose total fits, never overshoots, partition-invariant") {
    val rnd = new scala.util.Random(43)
    val docs = (0L until 400L)
      .map(i => (i, rnd.nextDouble() * 10.0, 1L + rnd.nextInt(50).toLong))
      .toDF("doc_id", "q", "toks").repartition(11)
    val out = ops.Packing.budgetTruncate(docs, "doc_id", $"q", $"toks", 3000L)
      .as[(Long, Double, Long, Long, Boolean)].collect()
    assert(out.length === 400)
    val ordered = out.sortBy(r => (r._2, r._1))
    // tok_start is the exact running sum in (score, id) order
    var run = 0L
    ordered.foreach { r =>
      assert(r._4 === run, s"tok_start drift at doc ${r._1}")
      run += r._3
    }
    // kept = the longest prefix with total <= budget; nothing after it
    val kept = ordered.takeWhile(_._5)
    assert(kept.map(_._3).sum <= 3000L)
    assert(kept.map(_._3).sum + ordered(kept.length)._3 > 3000L)
    assert(ordered.drop(kept.length).forall(!_._5),
      "a doc after the cut must not be kept")
    // pure function of the rows — partitioning changes nothing
    val out2 = ops.Packing
      .budgetTruncate(docs.repartition(3), "doc_id", $"q", $"toks", 3000L)
      .as[(Long, Double, Long, Long, Boolean)].collect()
    assert(out.sortBy(_._1).toSeq === out2.sortBy(_._1).toSeq)
  }

  test("epochShuffleKey: exact bijection of the dense domain, distinct " +
      "orders across epochs, deterministic, and shuffle-free") {
    // halfBits = 5 -> domain [0, 1024); a dense id range must map onto
    // EXACTLY the whole domain (Feistel is a permutation, not a hash)
    val ids = spark.range(1024).toDF("id")
    def keys(epoch: Int): Array[Long] = ids
      .select(ops.Packing.epochShuffleKey($"id", lit(epoch.toLong),
        halfBits = 5).as("k"))
      .as[Long].collect()
    val e0 = keys(0)
    assert(e0.sorted === (0L until 1024L).toArray,
      "epoch-0 keys must be a permutation of [0, 1024)")
    assert(keys(0) === e0, "pure function: same epoch, same keys")
    val e1 = keys(1)
    assert(e1.sorted === (0L until 1024L).toArray)
    assert(!(e0 === e1), "different epoch, different permutation")
    // the order must actually scramble: a long prefix of id order should
    // not survive in key order
    val orderE0 = e0.zipWithIndex.sortBy(_._1).map(_._2.toLong)
    assert(orderE0.take(20).toSeq !== (0L until 20L).toSeq)
    // pure map: no Exchange anywhere in the plan
    val plan = ids
      .withColumn("k", ops.Packing.epochShuffleKey($"id", lit(0L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle-free manifest:\n$plan")
    // guard rails
    intercept[IllegalArgumentException] {
      ops.Packing.epochShuffleKey($"id", lit(0L), halfBits = 40)
    }
    intercept[IllegalArgumentException] {
      ops.Packing.epochShuffleKey($"id", lit(0L), rounds = 2)
    }
  }
}
