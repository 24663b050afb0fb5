package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** FIXTURES.md §B3 scripted event (top-level so its Encoder resolves
  * without an outer scope).
  */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Fingerprinted document for the streaming near-dup tests. */
case class NDoc(doc_id: Long, simhash: Long, ts: Timestamp)

/** Raw-text document for the text-level near-dup entry point. */
case class TDoc(doc_id: Long, text: String, ts: Timestamp)

/** Language-tagged document for the per-language CCNet bucket stream. */
case class LDoc(doc_id: Long, lang: String, text: String, ts: Timestamp)

/** Source-tagged lines document for the site-boilerplate stream. */
case class SDoc(doc_id: Long, source: String, lines: Seq[String], ts: Timestamp)

/** Search query row for the BM25 serving stream. */
case class QRow(query_id: Long, text: String, ts: Timestamp)

/** Embedded document for the streaming semantic near-dup tests. */
case class EDoc(doc_id: Long, embedding: Seq[Double], ts: Timestamp)

/** Decoded image for the streaming perceptual-dedup test. */
case class PImg(img_id: Long, img: Seq[Float])

/** Structured Streaming tests (SURVEY §2.10 T1–T6, §5.2) via
  * MemoryStream — windows, watermark late-drop, streaming dedup, and the
  * stream-static join, with batch/stream plan parity.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, time: String, user: Long = 1L,
      typ: String = "view", v: Double = 1.0): Ev =
    Ev(id, Timestamp.valueOf(time), user, typ, v, "{}")

  private def withQuery[A](q: StreamingQuery)(body: => A): A =
    try body finally q.stop()

  test("T1 tumbling window aggregates per hour and type (batch = stream plan)") {
    val batch = Seq(
      ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:55:00"),
      ev(3, "2024-01-01 11:05:00", typ = "click")).toDF()
    val out = ops.Streaming.hourlyTypeAgg(batch)
      .select(date_format($"window.start", "HH:mm").as("h"), $"event_type", $"n")
      .as[(String, String, Long)].collect().toSet
    assert(out === Set(("10:00", "view", 2L), ("11:00", "click", 1L)))
  }

  test("T4 watermark drops events later than the delay, keeps in-horizon ones") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = ops.Streaming.hourlyTypeAggStream(input.toDF())
      .select($"window.start".as("start"), $"event_type", $"n")
      .writeStream.format("memory").queryName("wm_agg").outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:20:00"))
      q.processAllAvailable()
      // watermark = 10:20 - 10min = 10:10; 10:00 window still open → no output
      assert(spark.table("wm_agg").count() === 0)
      // advance event time past 11:10 so the 10:00 window closes
      input.addData(ev(3, "2024-01-01 11:30:00"))
      q.processAllAvailable()
      // a late event for the closed 10:00 window must be dropped
      input.addData(ev(4, "2024-01-01 10:30:00"))
      // and a fresh event advances nothing backwards
      input.addData(ev(5, "2024-01-01 11:40:00"))
      q.processAllAvailable()
      val rows = spark.table("wm_agg")
        .select(date_format($"start", "HH:mm").as("s"), $"n")
        .as[(String, Long)].collect().toMap
      assert(rows("10:00") === 2L) // late event 4 did NOT bump the count
    }
  }

  test("T5 streaming dedup drops duplicate event_ids within the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = ops.Streaming.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(1, "2024-01-01 10:00:30"),
        ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      input.addData(ev(1, "2024-01-01 10:02:00"), ev(3, "2024-01-01 10:03:00"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select($"event_id").as[Long].collect().sorted
      assert(ids === Array(1L, 2L, 3L))
    }
  }

  test("T3 session window merges events within the gap, splits across it") {
    val batch = Seq(
      ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:20:00"),
      ev(3, "2024-01-01 10:49:00"),              // still chained: 29 min gap
      ev(4, "2024-01-01 12:00:00"),              // new session
      ev(5, "2024-01-01 09:00:00", user = 2L)).toDF()
    val out = ops.Streaming.sessionAgg(batch)
      .select($"user_id", $"n_events")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out(1L) === Seq(1L, 3L))
    assert(out(2L) === Seq(1L))
  }

  test("T2 sliding windows assign one event to window_size/slide windows") {
    val batch = Seq(ev(1, "2024-01-01 10:32:00")).toDF()
    val out = ops.Streaming.slidingTypeAgg(batch)
      .select(date_format($"window.start", "HH:mm").as("s"))
      .as[String].collect().sorted
    assert(out === Array("09:45", "10:00", "10:15", "10:30"))
  }

  test("T6 stream-static join enriches stream rows from the broadcast dim") {
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("cust_id", "tier")
    val input = MemoryStream[Ev]
    val q = ops.Streaming.enrichWithDim(input.toDF(), dim, "cust_id")
      .select($"event_id", $"tier")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:00:00", user = 1L),
        ev(2, "2024-01-01 10:01:00", user = 9L)) // no dim row → dropped (inner)
      q.processAllAvailable()
      val rows = spark.table("enriched").as[(Long, String)].collect().toSet
      assert(rows === Set((1L, "gold")))
    }
  }

  test("T3 streaming session window closes sessions once the watermark passes") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = ops.Streaming.sessionAgg(
        input.toDF().withWatermark("ts", "10 minutes"))
      .select($"user_id", $"n_events")
      .writeStream.format("memory").queryName("sess_stream").outputMode("append").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      assert(spark.table("sess_stream").count() === 0) // session still open
      // jump event time far ahead: watermark passes the session end
      input.addData(ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      val rows = spark.table("sess_stream").as[(Long, Long)].collect().toSeq
      assert(rows === Seq((1L, 2L))) // the merged 2-event session emitted once
    }
  }

  test("T3/T4 session-window lifecycle (q205 replay): end-based strict " +
      "acceptance, non-strict emission, and the stale-divergence flag, " +
      "pinned against MemoryStream") {
    implicit val sql = spark.sqlContext
    def us(time: String): Long = Timestamp.valueOf(time).getTime * 1000L

    // streaming arm: 10-min session gap, 10-min watermark, append mode
    def streamSessions(name: String, batches: Seq[Seq[Ev]])
        : Set[(Long, Long, Long, Long)] = {
      val input = MemoryStream[Ev]
      val q = input.toDF().withWatermark("ts", "10 minutes")
        .groupBy(session_window($"ts", "10 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"user_id", unix_micros($"session_window.start").as("s"),
          unix_micros($"session_window.end").as("e"), $"n")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      withQuery(q) {
        batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
        spark.table(name).as[(Long, Long, Long, Long)].collect().toSet
      }
    }
    // replay arm: arrival_us = batch ordinal, batchSpanUs = 1 pins the
    // replay's micro-batch assignment to the scripted addData batches
    def replay(batches: Seq[Seq[Ev]]) = {
      val arr = batches.zipWithIndex
        .flatMap { case (b, i) => b.map(e => (e.event_id, e.user_id, e.ts, i.toLong)) }
        .toDF("event_id", "user_id", "ts", "arrival_us")
        .select($"event_id", $"user_id", unix_micros($"ts").as("ts_us"),
          $"arrival_us")
      ops.Streaming.sessionAcceptanceFromArrival(arr,
        gapMs = 600000L, delayMs = 600000L, batchSpanUs = 1L)
    }
    def emittedOf(replayed: org.apache.spark.sql.DataFrame) =
      replayed.filter($"accepted" && $"emitted")
        .select($"user_id", $"sess_start_us", $"sess_end_us", $"n_events")
        .distinct().as[(Long, Long, Long, Long)].collect().toSet

    // Scenario A — the acceptance edges. Batch 0 sets wm(b1) = 10:50:00
    // (11:00 max, ms-truncated, minus 10 min). Batch 1 then lands four
    // probes around it: u2 ts<wm but window end>wm (accepted: the
    // end-based rule), u3 end<wm (dropped), u4 end==wm exactly
    // (dropped: STRICT), u5 end 1 ms past (accepted).
    val a = Seq(
      Seq(ev(1, "2024-01-01 10:00:00"), ev(900, "2024-01-01 11:00:00", user = 9L)),
      Seq(ev(2, "2024-01-01 10:45:00", user = 2L),
        ev(3, "2024-01-01 10:39:59.999", user = 3L),
        ev(4, "2024-01-01 10:40:00", user = 4L),
        ev(5, "2024-01-01 10:40:00.001", user = 5L)),
      Seq(ev(901, "2024-01-01 15:00:00", user = 9L)),
      Seq(ev(902, "2024-01-01 20:00:00", user = 9L)))
    val repA = replay(a).cache()
    val accA = repA.select($"event_id", $"accepted")
      .as[(Long, Boolean)].collect().toMap
    assert(accA(2L) && accA(5L), "end-based acceptance must keep u2/u5")
    assert(!accA(3L) && !accA(4L),
      "end<wm and end==wm must both drop (strict compare)")
    // u2 is accepted with ts <= wm — STALE — but with no prior emitted
    // session nearby the replay still matches the stream exactly; the
    // conservative flag goes false without an actual divergence
    assert(repA.filter($"event_id" === 2L).select($"stale")
      .as[Boolean].head(), "u2 must be flagged stale")
    // u9's 20:00 session: final wm 19:50 has not reached its end → in
    // state at shutdown, not emitted, on BOTH arms
    assert(streamSessions("sess_audit_a", a) === emittedOf(repA),
      "replay emitted-session set must equal the streaming emission")
    repA.unpersist()

    // Scenario B — the documented divergence: u1's first session
    // ([10:00,10:10)) is emitted by batch 1's watermark 10:10:00.001;
    // the stale-accepted 10:05 event in batch 2 then opens a FRESH
    // OVERLAPPING session in the stream, while the island replay
    // merges — and must say so via sess_exact = false.
    val b = Seq(
      Seq(ev(1, "2024-01-01 10:00:00")),
      Seq(ev(900, "2024-01-01 10:20:00.001", user = 9L)),
      Seq(ev(2, "2024-01-01 10:05:00")),
      Seq(ev(902, "2024-01-01 23:00:00", user = 9L)))
    val streamB = streamSessions("sess_audit_b", b)
    assert(streamB.filter(_._1 == 1L) === Set(
      (1L, us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00"), 1L),
      (1L, us("2024-01-01 10:05:00"), us("2024-01-01 10:15:00"), 1L)),
      "stream must emit two OVERLAPPING u1 sessions in the stale edge")
    val repB = replay(b).cache()
    val u1 = repB.filter($"user_id" === 1L && $"accepted")
      .select($"sess_start_us", $"sess_end_us", $"n_events", $"sess_exact")
      .distinct().as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(u1 === Seq((us("2024-01-01 10:00:00"),
      us("2024-01-01 10:15:00"), 2L, false)),
      "replay must merge the stale edge into one island AND flag it")
    // the exact (stale-free) sessions still agree stream-vs-replay
    assert(streamB.filter(_._1 == 9L) ===
      emittedOf(repB).filter(_._1 == 9L))
    assert(repB.filter($"user_id" === 9L && $"accepted")
      .select($"sess_exact").distinct().as[Boolean].collect().toSeq
      === Seq(true))
    repB.unpersist()
  }

  test("streaming delta dedup: two arriving micro-batches gate against " +
      "the persisted shingle index exactly like the batch op") {
    implicit val sql = spark.sqlContext
    val idx = java.nio.file.Files.createTempDirectory("dedup-stream-idx").toString
    val old = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (102L, "pack my box with five dozen liquor jugs right now please")
    ).toDF("doc_id", "text")
    ops.CurationIndex.writeDedupIndex(spark, idx, old, n = 3, dfCap = 10)
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "entirely unrelated material with no overlap at all"))
    val b2 = Seq(
      (5L, "pack my box with five dozen liquor jugs right now thanks"))
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer[(Long, Option[Long], Boolean)]()
    val q = ops.Streaming.dedupDeltaStream(spark, idx,
      input.toDF().toDF("doc_id", "text"),
      out => got ++= out.select($"doc_id", $"best_old_id", $"is_dup")
        .as[(Long, Option[Long], Boolean)].collect())
    withQuery(q) {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    }
    val byId = got.sortBy(_._1).toSeq
    assert(byId.map(_._1) === Seq(1L, 3L, 5L))
    assert(byId(0)._2 === Some(100L) && byId(0)._3)
    assert(byId(1)._2.isEmpty && !byId(1)._3)
    assert(byId(2)._2 === Some(102L) && byId(2)._3)
    // batch parity: the union of streamed manifests == one batch call
    val batchOut = ops.CurationIndex.dedupDeltaAgainstIndex(spark, idx,
        (b1 ++ b2).toDF("doc_id", "text"))
      .select($"doc_id", $"best_old_id", $"is_dup")
      .as[(Long, Option[Long], Boolean)].collect().sortBy(_._1).toSeq
    assert(byId === batchOut)
  }

  test("T5 flatMapGroupsWithState accumulates per-user counts across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = ops.Streaming.runningUserCounts(input.toDF())
      .writeStream.format("memory").queryName("state_out").outputMode("update").start()
    withQuery(q) {
      input.addData(ev(1, "2024-01-01 10:00:00", user = 1L),
        ev(2, "2024-01-01 10:01:00", user = 1L),
        ev(3, "2024-01-01 10:02:00", user = 2L))
      q.processAllAvailable()
      input.addData(ev(4, "2024-01-01 10:03:00", user = 1L))
      q.processAllAvailable()
      // update mode appends one row per key per batch; the latest row
      // per user carries the running total
      val latest = spark.table("state_out")
        .groupBy($"user_id").agg(max($"n_events").as("n"))
        .as[(Long, Long)].collect().toMap
      assert(latest === Map(1L -> 3L, 2L -> 1L))
    }
  }

  test("J7 stream-stream interval join matches in-window, drops out-of-window and cross-user") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val q = ops.Streaming.clickViewIntervalJoin(clicks.toDF(), views.toDF())
      .select($"click_id", $"view_id")
      .writeStream.format("memory").queryName("interval_join").outputMode("append").start()
    withQuery(q) {
      views.addData(
        ev(100, "2024-01-01 10:00:00", user = 1L, v = 5.0),  // in window for click@10:05
        ev(101, "2024-01-01 09:50:00", user = 1L, v = 6.0),  // 15 min before → outside
        ev(102, "2024-01-01 10:01:00", user = 2L, v = 7.0))  // other user
      clicks.addData(ev(1, "2024-01-01 10:05:00", user = 1L, typ = "click"))
      q.processAllAvailable()
      val matches = spark.table("interval_join").as[(Long, Long)].collect().toSet
      assert(matches === Set((1L, 100L)))
      // A view AFTER the click must not match (interval is [ts-10m, ts]).
      views.addData(ev(103, "2024-01-01 10:06:00", user = 1L, v = 8.0))
      q.processAllAvailable()
      assert(spark.table("interval_join").count() === 1)
    }
  }

  test("J7 interval join evicts state past the watermark (late click finds nothing)") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val q = ops.Streaming.clickViewIntervalJoin(clicks.toDF(), views.toDF())
      .select($"click_id", $"view_id")
      .writeStream.format("memory").queryName("interval_state").outputMode("append").start()
    withQuery(q) {
      views.addData(ev(100, "2024-01-01 10:00:00", user = 1L))
      clicks.addData(ev(1, "2024-01-01 10:02:00", user = 1L, typ = "click"))
      q.processAllAvailable()
      assert(spark.table("interval_state").count() === 1)
      // Advance BOTH watermarks far past 10:00 so the buffered view is
      // evicted from join state (distinct users so the advancers can't
      // match each other)...
      views.addData(ev(200, "2024-01-01 12:00:00", user = 8L))
      clicks.addData(ev(2, "2024-01-01 12:00:00", user = 9L, typ = "click"))
      q.processAllAvailable()
      // ...then a late click that WOULD have matched view 100 must find
      // nothing: its match window is behind the watermark.
      clicks.addData(ev(3, "2024-01-01 10:05:00", user = 1L, typ = "click"))
      q.processAllAvailable()
      val got = spark.table("interval_state").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 100L)), s"late click must not match evicted state: $got")
    }
  }

  test("J7 left-outer interval join emits unmatched clicks once the watermark closes them") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    // the REAL operator with joinType — not an inline copy of its plan
    val joined = ops.Streaming.clickViewIntervalJoin(
      clicks.toDF(), views.toDF(), joinType = "left_outer")
    val q = joined.select($"click_id", $"view_id")
      .writeStream.format("memory").queryName("outer_interval").outputMode("append").start()
    withQuery(q) {
      views.addData(ev(100, "2024-01-01 10:00:00", user = 1L))
      clicks.addData(
        ev(1, "2024-01-01 10:05:00", user = 1L, typ = "click"),  // matches view 100
        ev(2, "2024-01-01 10:05:00", user = 2L, typ = "click"))  // no view
      q.processAllAvailable()
      // the unmatched click cannot emit yet: a matching view may still arrive
      val early = spark.table("outer_interval").as[(Long, Option[Long])].collect().toSet
      assert(early === Set((1L, Some(100L))))
      // advance both watermarks far past the click's match window
      views.addData(ev(200, "2024-01-01 12:00:00", user = 8L))
      clicks.addData(ev(3, "2024-01-01 12:00:00", user = 9L, typ = "click"))
      q.processAllAvailable()
      val late = spark.table("outer_interval").as[(Long, Option[Long])].collect().toSet
      // click 2 now emitted with a null view side (outer semantics)
      assert(late.contains((2L, None)), s"unmatched click must emit null-padded: $late")
    }
  }

  test("S9 parquet file sink + checkpoint recovers exactly-once across restart") {
    import java.nio.file.{Files, Paths}
    val base = Files.createTempDirectory("graft-s9").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val schema = implicitly[org.apache.spark.sql.Encoder[Ev]].schema
    def addFile(tag: String, evs: Ev*): Unit = {
      val tmp = s"$base/stage_$tag"
      evs.toDF().coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.createDirectories(Paths.get(inDir))
      Files.move(part, Paths.get(s"$inDir/$tag.parquet"))
    }
    def startQuery() = spark.readStream.schema(schema).parquet(inDir)
      .select($"event_id", $"user_id", $"value")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    addFile("batch1", ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"))
    val q1 = startQuery()
    withQuery(q1) { q1.processAllAvailable() }
    // kill (q1 stopped), add more input, restart from the SAME checkpoint
    addFile("batch2", ev(3, "2024-01-01 10:02:00"))
    val q2 = startQuery()
    withQuery(q2) { q2.processAllAvailable() }
    val ids = spark.read.parquet(outDir).select($"event_id").as[Long].collect().sorted
    // exactly-once: batch1 not re-emitted after recovery, batch2 present once
    assert(ids === Array(1L, 2L, 3L))
  }

  // --- streaming near-dup detection (T5 + L2) -------------------------
  // Hand-constructed fingerprints pin the banding math exactly: H's
  // bands are bits [0,16), [16,32), [32,48), [48,64).
  private val H = 0x0123456789ABCDEFL

  private def nd(id: Long, hash: Long, time: String): NDoc =
    NDoc(id, hash, Timestamp.valueOf(time))

  test("T5+L2 streaming near-dup emits in-hamming pairs, rejects candidates past the cutoff") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[NDoc]
    val q = ops.Streaming.nearDupPairsStream(input.toDF())
      .writeStream.format("memory").queryName("neardup_raw").outputMode("append").start()
    withQuery(q) {
      input.addData(
        nd(1, H, "2024-01-01 10:00:00"),
        // 2 flips, both in band 0 → collides with doc 1 in bands 1-3,
        // hamming 2 ≤ 3 → pair (cross-batch match exercised below)
        nd(2, H ^ 0x3L, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      input.addData(
        // 1 flip in EVERY band → no band collision with doc 1 (all 4
        // differ) nor doc 2 (band 0 differs via bit 1, bands 1-3 via
        // the per-band flips) → silent, despite hamming 4 being "close"
        nd(3, H ^ (1L << 0) ^ (1L << 16) ^ (1L << 32) ^ (1L << 48),
          "2024-01-01 10:03:00"),
        // 4 flips all in band 0 → candidate vs doc 1 via bands 1-3 but
        // hamming 4 > 3 → the exact residual rejects it; vs doc 2 the
        // symmetric difference is 6 bits → rejected too
        nd(4, H ^ 0xF0L, "2024-01-01 10:04:00"))
      q.processAllAvailable()
      val rows = spark.table("neardup_raw")
        .select($"doc_prev", $"doc_new", $"hamming")
        .as[(Long, Long, Int)].collect()
      // the (1,2) pair collides in bands 1,2,3 → emitted once per band
      assert(rows.toSet === Set((1L, 2L, 2)), s"unexpected pairs: ${rows.toSet}")
      assert(rows.length === 3, s"pair should surface once per colliding band: ${rows.toList}")
    }
  }

  test("T5+L2 distinct wrapper collapses cross-band duplicates exactly-once") {
    // the fMGWS → windowed-agg chain needs the static multi-stateful
    // check off (see nearDupPairsStreamDistinct's scaladoc for why its
    // emissions are provably never late); restored in the finally
    val checkConf = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(checkConf, "false")
    try {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[NDoc]
    val q = ops.Streaming.nearDupPairsStreamDistinct(input.toDF())
      .writeStream.format("memory").queryName("neardup_distinct").outputMode("append").start()
    withQuery(q) {
      input.addData(
        nd(1, H, "2024-01-01 10:00:00"),
        nd(2, H ^ 0x3L, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      // advance the watermark past the hit's 1-minute window in two
      // steps (the watermark a batch uses comes from the PREVIOUS
      // batch's max event time); ~H shares no band with anything
      input.addData(nd(98, ~H, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      input.addData(nd(99, 0x0F0F0F0F0F0F0F0FL, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      val rows = spark.table("neardup_distinct")
        .select($"doc_prev", $"doc_new", $"hamming")
        .as[(Long, Long, Int)].collect()
      assert(rows.toSet === Set((1L, 2L, 2)), s"unexpected: ${rows.toSet}")
      assert(rows.length === 1, s"cross-band duplicates must collapse: ${rows.toList}")
    }
    } finally spark.conf.set(checkConf, "true")
  }

  test("T5+L2 near-dup state evicts fingerprints past the event-time horizon") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[NDoc]
    // 1-minute horizon: doc 5 arrives 31 minutes after its twin
    val q = ops.Streaming.nearDupPairsStream(
        input.toDF(), delay = "1 minute", horizonMs = 60L * 1000)
      .writeStream.format("memory").queryName("neardup_horizon").outputMode("append").start()
    withQuery(q) {
      input.addData(nd(1, H, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      // push the watermark to 10:29 so doc 1's entries (last useful at
      // 10:01) are evicted before the twin arrives
      input.addData(nd(9, ~H, "2024-01-01 10:30:00"))
      q.processAllAvailable()
      input.addData(nd(5, H, "2024-01-01 10:31:00"))
      q.processAllAvailable()
      assert(spark.table("neardup_horizon").count() === 0,
        "an identical fingerprint beyond the horizon must not pair")
      // …while a twin INSIDE the horizon of a fresh doc still pairs
      input.addData(nd(6, H, "2024-01-01 10:31:30"))
      q.processAllAvailable()
      val got = spark.table("neardup_horizon")
        .select($"doc_prev", $"doc_new", $"hamming")
        .as[(Long, Long, Int)].collect().toSet
      assert(got === Set((5L, 6L, 0)), s"in-horizon twin must pair: $got")
      // idle-bucket TIMEOUT bounds state — the actual 100 TB risk (the
      // visit-time eviction filter only fires on buckets still receiving
      // data, and a stale entry it misses is also rejected per-match;
      // an idle bucket nothing revisits would otherwise live forever).
      // Advance the watermark (10:39) past every timeout — doc 9's
      // buckets (newest 10:30 + 1 min) AND the shared H buckets
      // (newest 10:31:30 + 1 min): all must be REMOVED, leaving only
      // doc 8's 4 buckets in the store.
      input.addData(nd(8, 0x0F0F0F0F0F0F0F0FL, "2024-01-01 10:40:00"))
      q.processAllAvailable()
      val stateKeys = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateKeys === 4,
        s"timed-out idle buckets must leave the store, got $stateKeys keys")
    }
  }

  test("T5+L2 text-level entry fingerprints with SimHash64 and pairs near-identical docs") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[TDoc]
    val q = ops.Streaming.nearDupTextPairsStream(input.toDF())
      .writeStream.format("memory").queryName("neardup_text").outputMode("append").start()
    withQuery(q) {
      val boiler = (1 to 40).map(i => s"tok$i").mkString(" ")
      input.addData(
        TDoc(1, boiler, Timestamp.valueOf("2024-01-01 10:00:00")),
        // one token swapped in 40 → few SimHash bits flip; the exact
        // duplicate path (distance 0) is doc 3
        TDoc(3, boiler, Timestamp.valueOf("2024-01-01 10:02:00")),
        // unrelated text must not pair
        TDoc(7, "completely different content entirely", Timestamp.valueOf("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val rows = spark.table("neardup_text")
        .select($"doc_prev", $"doc_new", $"hamming")
        .as[(Long, Long, Int)].collect()
      // identical text → identical fingerprint → all 4 bands collide
      assert(rows.toSet === Set((1L, 3L, 0)), s"unexpected: ${rows.toSet}")
      assert(rows.length === 4)
    }
  }

  // Randomized equivalence: the banding is EXACT for hamming <= 3
  // (pigeonhole), so the streamed pair set must equal a local
  // brute-force oracle over every in-horizon pair — including hashes
  // built to straddle band boundaries, which hand-picked cases miss.
  for (seed <- Seq(101, 202, 303))
  test(s"T5+L2 near-dup stream equals the brute-force pair oracle (seed $seed)") {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(seed)
    val base = rnd.nextLong()
    // 30 docs over 10 minutes: half are perturbations of base (0-5 bit
    // flips at random positions — some inside one band, some spread),
    // half independent random hashes
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val docs = (0 until 30).map { i =>
      val h =
        if (i % 2 == 0) (0 until rnd.nextInt(6))
          .foldLeft(base)((acc, _) => acc ^ (1L << rnd.nextInt(64)))
        else rnd.nextLong()
      NDoc(i.toLong, h, new Timestamp(t0 + i * 20000L))
    }
    val horizonMs = 60L * 60 * 1000 // 1h — nothing evicts mid-test
    val want = (for {
      j <- docs.indices; i <- 0 until j
      a = docs(i); b = docs(j)
      ham = java.lang.Long.bitCount(a.simhash ^ b.simhash)
      if ham <= 3 && math.abs(a.ts.getTime - b.ts.getTime) <= horizonMs
    } yield {
      val (p, n) =
        if (a.ts.getTime < b.ts.getTime ||
          (a.ts.getTime == b.ts.getTime && a.doc_id < b.doc_id)) (a, b) else (b, a)
      (p.doc_id, n.doc_id, ham)
    }).toSet
    val input = MemoryStream[NDoc]
    val q = ops.Streaming.nearDupPairsStream(input.toDF(), horizonMs = horizonMs)
      .writeStream.format("memory").queryName(s"neardup_prop_$seed")
      .outputMode("append").start()
    withQuery(q) {
      // split across three batches to exercise cross-batch state
      docs.grouped(10).foreach { g => input.addData(g: _*); q.processAllAvailable() }
      val got = spark.table(s"neardup_prop_$seed")
        .select($"doc_prev", $"doc_new", $"hamming")
        .as[(Long, Long, Int)].collect().toSet
      assert(got === want, s"stream pairs != oracle (seed $seed)")
    }
  }

  // ---- streaming EMBEDDING near-dup (the semantic-dedup pair stage) ----

  /** Mirrors embNearDupPairsStream's candidate rule exactly: cells
    * ranked by the assignment score u·c − ‖c‖²/2 descending (ties →
    * higher cell id first, matching reverse(array_sort) on the
    * (score, cell) struct), top `nProbe` kept. Same left-fold order as
    * the Catalyst `aggregate`, so scores are bit-identical doubles.
    */
  private def probeCells(unit: Seq[Double], centroids: Seq[Seq[Double]],
      nProbe: Int): Set[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      val score = c.zip(unit).foldLeft(0.0) { case (acc, (ci, ui)) =>
        acc + ui * ci
      } - c.foldLeft(0.0)((acc, x) => acc + x * x) / 2.0
      (score, i)
    }.sortBy { case (s, i) => (-s, -i) }.take(nProbe).map(_._2).toSet

  private def unitize(v: Seq[Double]): Seq[Double] = {
    val nrm = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
    val d = if (nrm == 0.0) 1.0 else nrm
    v.map(_ / d)
  }

  test("T5+L2 embedding near-dup stream pairs an identical vector across batches") {
    implicit val sql = spark.sqlContext
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0, 1.0))
    val v = Seq(0.9, 0.1, 0.0, 0.0)
    val input = MemoryStream[EDoc]
    val q = ops.Streaming.embNearDupPairsStream(
        input.toDF(), cents, minCos = 0.95, nProbe = 2)
      .writeStream.format("memory").queryName("emb_neardup_hand")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(EDoc(1, v, Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // doc 1's unit vector lives only in the cell state now; its twin
      // arrives a batch later and must still collide in BOTH probed cells
      input.addData(EDoc(2, v, Timestamp.valueOf("2024-01-01 10:01:00")),
        EDoc(3, Seq(0.0, 0.0, 1.0, 0.0), Timestamp.valueOf("2024-01-01 10:02:00")))
      q.processAllAvailable()
      val rows = spark.table("emb_neardup_hand")
        .select($"doc_prev", $"doc_new", $"cosine")
        .as[(Long, Long, Double)].collect()
      assert(rows.toSet === Set((1L, 2L, 1.0)), s"unexpected: ${rows.toSet}")
      assert(rows.length === 2, // identical vectors probe identical cells
        s"expected one emission per shared probed cell: ${rows.toList}")
    }
  }

  // Randomized equivalence vs a brute-force oracle over every
  // in-horizon pair. Candidacy (probe-set intersection) and the exact
  // cosine are both replicated locally, so the streamed MULTISET must
  // match: each qualifying pair appears once per shared probed cell.
  for (seed <- Seq(11, 47, 83))
  test(s"T5+L2 embedding near-dup stream equals the IVF pair oracle (seed $seed)") {
    implicit val sql = spark.sqlContext
    val rnd = new scala.util.Random(seed)
    val d = 6
    val cents = Seq.fill(5)(Seq.fill(d)(rnd.nextGaussian()))
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    // 36 docs over 12 minutes: a third are jittered copies of earlier
    // docs (near-dups at high cosine), the rest independent gaussians
    val docs = scala.collection.mutable.ArrayBuffer.empty[EDoc]
    (0 until 36).foreach { i =>
      val vec =
        if (i % 3 == 0 || docs.isEmpty) Seq.fill(d)(rnd.nextGaussian())
        else {
          val base = docs(rnd.nextInt(docs.length)).embedding
          base.map(_ + rnd.nextGaussian() * 0.05)
        }
      docs += EDoc(i.toLong, vec, new Timestamp(t0 + i * 20000L))
    }
    val (minCos, nProbe) = (0.9, 2)
    val horizonMs = 60L * 60 * 1000 // 1h — nothing evicts mid-test
    val units = docs.map(e => e.doc_id -> unitize(e.embedding)).toMap
    val probes = docs.map(e => e.doc_id -> probeCells(units(e.doc_id), cents, nProbe)).toMap
    val want = (for {
      j <- docs.indices; i <- 0 until j
      a = docs(i); b = docs(j)
      shared = (probes(a.doc_id) intersect probes(b.doc_id)).size
      if shared > 0 && math.abs(a.ts.getTime - b.ts.getTime) <= horizonMs
      cos = units(a.doc_id).zip(units(b.doc_id))
        .foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      if cos >= minCos
    } yield {
      val (p, n) =
        if (a.ts.getTime < b.ts.getTime ||
          (a.ts.getTime == b.ts.getTime && a.doc_id < b.doc_id)) (a, b) else (b, a)
      ((p.doc_id, n.doc_id, math.rint(cos * 1e6) / 1e6), shared)
    }).toMap
    val input = MemoryStream[EDoc]
    val q = ops.Streaming.embNearDupPairsStream(
        input.toDF(), cents, minCos = minCos, nProbe = nProbe,
        horizonMs = horizonMs)
      .writeStream.format("memory").queryName(s"emb_neardup_prop_$seed")
      .outputMode("append").start()
    withQuery(q) {
      // split across three batches to exercise cross-batch state
      docs.grouped(12).foreach { g => input.addData(g.toSeq: _*); q.processAllAvailable() }
      val got = spark.table(s"emb_neardup_prop_$seed")
        .select($"doc_prev", $"doc_new", $"cosine")
        .as[(Long, Long, Double)].collect()
        .groupBy(identity).map { case (k, v) => (k, v.length) }
      assert(got === want, s"stream pair multiset != oracle (seed $seed)")
    }
  }

  test("T5+L2 near-dup bucket state survives a checkpoint restart") {
    import java.nio.file.Files
    implicit val sql = spark.sqlContext
    val base = Files.createTempDirectory("graft-neardup-ckpt").toString
    val (outDir, ckpt) = (s"$base/out", s"$base/ckpt")
    val input = MemoryStream[NDoc]
    def startQuery() = ops.Streaming.nearDupPairsStream(input.toDF())
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .start()
    val q1 = startQuery()
    withQuery(q1) {
      input.addData(nd(1, H, "2024-01-01 10:00:00"))
      q1.processAllAvailable()
    }
    // doc 1's fingerprints live only in the state store now; the twin
    // arrives after a restart from the same checkpoint
    input.addData(nd(2, H ^ 0x1L, "2024-01-01 10:01:00"))
    val q2 = startQuery()
    withQuery(q2) { q2.processAllAvailable() }
    val pairs = spark.read.parquet(outDir)
      .select($"doc_prev", $"doc_new", $"hamming")
      .as[(Long, Long, Int)].collect()
    assert(pairs.toSet === Set((1L, 2L, 1)),
      s"recovered state must still pair the twin: ${pairs.toList}")
    assert(pairs.length === 3, // one per colliding band (bands 1-3)
      s"expected one emission per colliding band: ${pairs.toList}")
  }

  test("file streaming source over events parquet equals the batch tumbling agg") {
    // S9 oracle against the REAL fixture (not MemoryStream): the round-11
    // regression hid because no test read events.parquet through the
    // streaming source. Complete mode emits every window (open ones too),
    // and the single initial micro-batch means the watermark drops
    // nothing — so the streamed result must EQUAL the batch q29 plan.
    val dir = "/root/testdata/sf0.001"
    val stream = ops.Sources.eventsStream(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val q = ops.Streaming.hourlyTypeAggStream(stream)
      .writeStream.format("memory").queryName("file_stream_agg")
      .outputMode("complete").start()
    withQuery(q) {
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select(unix_micros($"window.start").as("h"), $"event_type", $"n",
          round($"sum_value", 6).as("sum_value"))
        .orderBy($"h", $"event_type")
        .collect().toSeq
      val streamed = canon(spark.table("file_stream_agg"))
      val batch = canon(ops.Streaming.hourlyTypeAgg(ops.Sources.events(spark, dir)))
      assert(streamed.nonEmpty)
      assert(streamed === batch, "streamed windows != batch windows")
    }
  }

  test("streaming curation kernel hash is bit-identical to Spark's xxhash64") {
    val samples = Seq("abcdefghijklmnopqrstuvwx",
      "the quick brown fox jump", "0123456789 0123456789 ab", "")
    val sparkH = samples.toDF("g").select(xxhash64($"g")).as[Long].collect().toSeq
    val kernel = samples.map(g =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(g), 42L))
    assert(kernel === sparkH)
  }

  test("multi-set coverage kernel equals per-set single calls") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val ref = Seq(
      (0L, s"intro $shared outro"), (1L, s"$shared different tail"))
      .toDF("doc_id", "text")
    val bench = Seq((9L, "a held out benchmark question about arithmetic"))
      .toDF("doc_id", "text")
    val setA = ops.SpanDedup.dupGramHashes(ref, 24).as[Long].collect().sorted
    val setB = ops.SpanDedup.benchGramHashes(bench, 24).as[Long].collect().sorted
    val probes = Seq(
      s"x $shared y",
      "training doc quoting a held out benchmark question about arithmetic",
      s"both: $shared plus a held out benchmark question about arithmetic",
      "neither matches anything at all in either set of grams",
      "short")
    probes.foreach { t =>
      val multi = ops.Streaming.gramCoverageMulti(t, Array(setA, setB), 24)
      assert(multi(0) === ops.Streaming.gramCoverage(t, setA, 24), t)
      assert(multi(1) === ops.Streaming.gramCoverage(t, setB, 24), t)
    }
  }

  test("streaming curation coverage equals the batch span coverage per doc") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val ref = Seq(
      (0L, s"intro $shared outro padding text here"),
      (1L, s"$shared completely different tail content"),
      (2L, "nothing in common with anything else at all, plain text")
    ).toDF("doc_id", "text")
    val set = ops.SpanDedup.dupGramHashes(ref, gramLen = 24)
      .as[Long].collect().sorted
    assert(set.nonEmpty)
    val batchCov = ops.SpanDedup.dupSpans(ref, gramLen = 24)
      .groupBy($"doc_id").agg(sum($"span_len").as("c"))
      .as[(Long, Long)].collect().toMap
    ref.as[(Long, String)].collect().foreach { case (id, text) =>
      val got = ops.Streaming.gramCoverage(text, set, 24)
      assert(got === batchCov.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("streaming curation coverage handles multi-byte text (parity with batch)") {
    // é (2 UTF-8 bytes) and an emoji (4 bytes) around a shared run: the
    // byte-offset table must keep kernel gram hashes aligned with the
    // Spark-side xxhash64(substr) values the dup set is built from.
    val emoji = new String(Character.toChars(0x1F680))
    val shared = "caf\u00e9 quality r\u00e9sum\u00e9 shared run contents here"
    val ref = Seq(
      (0L, s"$emoji intro $shared tail one"),
      (1L, s"pr\u00e9fixe $shared tail two"),
      (2L, "nothing shared with the others, plain ascii filler")
    ).toDF("doc_id", "text")
    val set = ops.SpanDedup.dupGramHashes(ref, gramLen = 24)
      .as[Long].collect().sorted
    assert(set.nonEmpty)
    val batchCov = ops.SpanDedup.dupSpans(ref, gramLen = 24)
      .groupBy($"doc_id").agg(sum($"span_len").as("c"))
      .as[(Long, Long)].collect().toMap
    ref.as[(Long, String)].collect().foreach { case (id, text) =>
      assert(ops.Streaming.gramCoverage(text, set, 24) ===
        batchCov.getOrElse(id, 0L), s"doc $id")
    }
  }

  test("streaming admission: contamination and LM bits gate alongside coverage") {
    implicit val sql = spark.sqlContext
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val ref = Seq(
      (100L, s"ref one $shared ref one tail"),
      (101L, s"ref two $shared ref two tail")).toDF("doc_id", "text")
    val dupSet = ops.SpanDedup.dupGramHashes(ref, gramLen = 24)
      .as[Long].collect()
    val benchRun = "held out benchmark question about arithmetic sums"
    val bench = Seq((200L, s"Q: $benchRun A: forty-two"))
      .toDF("doc_id", "text")
    val benchSet = ops.SpanDedup.benchGramHashes(bench, gramLen = 24)
      .as[Long].collect()
    // LM reference: plain English-like text, so garbled strings score
    // far above the cap while normal sentences stay under it
    val lmRef = Seq(
      (300L, "plenty of plain reference words repeated over and over here"),
      (301L, "more plain reference words with the usual letters in them"))
      .toDF("doc_id", "text")
    val lm = ops.Quality.charLm(lmRef)
    val cleanText = "plain words over and over with the usual letters here"
    val garbled = "zq zq vk vk xj xj wp wp zq vk xj wp zq vk xj wp"
    assert(lm.bits(cleanText) < lm.bits(garbled))
    val maxBits = (lm.bits(cleanText) + lm.bits(garbled)) / 2
    val input = MemoryStream[TDoc]
    val q = ops.Streaming.admissionStream(input.toDF(), dupSet, benchSet,
        lm, maxBits = maxBits)
      .writeStream.format("memory").queryName("admission")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(
        TDoc(1L, cleanText, Timestamp.valueOf("2024-01-01 10:00:00")),
        // contains a full benchmark run -> contaminated -> dropped
        TDoc(2L, s"training doc quoting $benchRun verbatim inside",
          Timestamp.valueOf("2024-01-01 10:01:00")),
        // out-of-distribution under the LM -> dropped
        TDoc(3L, garbled, Timestamp.valueOf("2024-01-01 10:02:00")),
        // mostly the shared dup run -> coverage gate -> dropped
        TDoc(4L, s"x $shared y", Timestamp.valueOf("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val rows = spark.table("admission")
        .select($"doc_id", $"contaminated_chars", $"lm_bits", $"keep")
        .as[(Long, Long, Double, Boolean)].collect()
        .map(t => t._1 -> (t._2, t._3, t._4)).toMap
      assert(rows.keySet === Set(1L, 2L, 3L, 4L))
      assert(rows(1L)._3 === true, "clean doc must pass every gate")
      assert(rows(1L)._1 === 0L)
      assert(rows(2L)._3 === false, "benchmark containment must gate")
      assert(rows(2L)._1 >= benchRun.length,
        "contaminated mass must cover at least the quoted run")
      assert(rows(3L)._3 === false, "LM bits must gate")
      assert(rows(3L)._2 > maxBits)
      assert(rows(4L)._3 === false, "dup coverage must still gate")
      // per-row contamination mass equals the batch decontaminate rollup
      val streamDocs = Seq(
        (1L, cleanText),
        (2L, s"training doc quoting $benchRun verbatim inside"),
        (3L, garbled),
        (4L, s"x $shared y")).toDF("doc_id", "text")
      val batchContam = ops.SpanDedup.decontaminate(streamDocs, bench, 24)
        .select($"doc_id", $"contaminated_chars")
        .as[(Long, Long)].collect().toMap
      rows.foreach { case (id, (mass, _, _)) =>
        assert(mass === batchContam.getOrElse(id, 0L), s"doc $id")
      }
    }
  }

  test("bloom admission: bounded-memory dup gate preserves batch decisions " +
      "on an adversarially duplicated corpus") {
    implicit val sql = spark.sqlContext
    // adversarially duplicated reference: every doc repeats one of two
    // long boilerplate runs -> the dup-gram set is a large fraction of
    // the corpus' grams (the regime where the exact broadcast array
    // stops being "small" at scale)
    val runA = "the quick brown fox jumps over the lazy dog again and again"
    val runB = "pack my box with five dozen liquor jugs every single time now"
    val ref = (0L until 40L).map(i =>
        (100L + i, s"mirror $i ${if (i % 2 == 0) runA else runB} mirror $i tail"))
      .toDF("doc_id", "text")
    val exactSet = ops.SpanDedup.dupGramHashes(ref, gramLen = 24)
      .as[Long].collect()
    assert(exactSet.length > 100, "fixture must produce a heavy dup set")
    val bloom = ops.SpanDedup.dupGramBloom(ref, gramLen = 24, fpp = 0.05)
    // no false negatives: every exact dup gram must probe positive
    exactSet.foreach(h => assert(bloom.mightContainLong(h)))
    val lmRef = Seq(
      (300L, "plenty of plain reference words repeated over and over here"),
      (301L, "more plain reference words with the usual letters in them"))
      .toDF("doc_id", "text")
    val lm = ops.Quality.charLm(lmRef)
    val benchSet = ops.SpanDedup.benchGramHashes(
      Seq((200L, "held out benchmark question about arithmetic sums"))
        .toDF("doc_id", "text"), gramLen = 24).as[Long].collect()
    val cands = Seq(
      TDoc(1L, "totally novel content with plenty of fresh words in it",
        Timestamp.valueOf("2024-01-01 10:00:00")),
      TDoc(2L, s"x $runA y", Timestamp.valueOf("2024-01-01 10:01:00")),
      TDoc(3L, s"half fresh words here half boilerplate follows $runB",
        Timestamp.valueOf("2024-01-01 10:02:00")),
      TDoc(4L, s"$runA $runB", Timestamp.valueOf("2024-01-01 10:03:00")),
      TDoc(5L, "more novel writing with genuinely distinct content words",
        Timestamp.valueOf("2024-01-01 10:04:00")))
    def run(name: String, make: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Map[Long, Map[String, Any]] = {
      val input = MemoryStream[TDoc]
      val q = make(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      withQuery(q) {
        input.addData(cands: _*)
        q.processAllAvailable()
        spark.table(name).collect().map { r =>
          r.getAs[Long]("doc_id") -> r.schema.fieldNames
            .map(f => f -> r.getAs[Any](f)).toMap
        }.toMap
      }
    }
    val exact = run("adm_exact",
      df => ops.Streaming.admissionStream(df, exactSet, benchSet, lm))
    val bl = run("adm_bloom",
      df => ops.Streaming.admissionStreamBloom(df, bloom, benchSet, lm))
    assert(exact.keySet === bl.keySet)
    exact.keySet.foreach { id =>
      // non-coverage signals are computed identically in both arms
      assert(bl(id)("contaminated_chars") === exact(id)("contaminated_chars"), s"doc $id")
      assert(bl(id)("lm_bits") === exact(id)("lm_bits"), s"doc $id")
      // a bloom PASS is exact (upper bound under the cap)
      if (bl(id)("keep") == true)
        assert(exact(id)("keep") === true, s"doc $id: bloom admitted, exact dropped")
      // any doc the bloom fails on coverage alone is flagged for recheck
      if (exact(id)("keep") == true && bl(id)("keep") == false)
        assert(bl(id)("dup_recheck") === true,
          s"doc $id: silently lost to a bloom false positive")
    }
    // resolving the flagged rows with the exact kernel restores FULL parity
    val textById = cands.map(d => d.doc_id -> d.text).toMap
    val sortedExact = exactSet.sorted
    val resolved = bl.map { case (id, row) =>
      val keep =
        if (row("dup_recheck") == true) {
          val cov = ops.Streaming.gramCoverage(textById(id), sortedExact, 24)
          val len = textById(id).codePointCount(0, textById(id).length)
          math.floor(cov * 1e6 / len + 0.5) / 1e6 <= 0.5
        } else row("keep") == true
      id -> keep
    }
    resolved.foreach { case (id, keep) =>
      assert(keep === (exact(id)("keep") == true), s"doc $id: resolved decision diverges")
    }
  }

  test("curation index round-trips: a loaded index yields identical admission state") {
    val ref = Seq(
      (100L, "ref one the quick brown fox jumps over the lazy dog tail"),
      (101L, "ref two the quick brown fox jumps over the lazy dog tail"))
      .toDF("doc_id", "text")
    val bench = Seq((200L, "a held out benchmark question about arithmetic"))
      .toDF("doc_id", "text")
    val lmRef = Seq((300L, "plain reference words with the usual letters"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft-curidx").toString
    ops.CurationIndex.write(spark, base, ref, bench, lmRef)
    val idx = ops.CurationIndex.load(spark, base)
    // gram sets equal the frames they were built from
    assert(idx.dupGrams.toSeq ===
      ops.SpanDedup.dupGramHashes(ref, 24).as[Long].collect().sorted.toSeq)
    assert(idx.benchGrams.toSeq ===
      ops.SpanDedup.benchGramHashes(bench, 24).as[Long].collect().sorted.toSeq)
    assert(idx.dupGrams.nonEmpty && idx.benchGrams.nonEmpty)
    // the loaded LM scores every probe identically to a fresh fit
    val fresh = ops.Quality.charLm(lmRef)
    Seq("plain words again", "zxqj vwkp", "The Usual LETTERS").foreach { t =>
      assert(idx.lm.bits(t) === fresh.bits(t), t)
    }
    // a pre-code-point index (no format marker in lm_meta) must fail
    // the load DESCRIPTIVELY — its 16-bit-packed keys would otherwise
    // load cleanly and silently never match the 64-bit lookup
    Seq(7L).toDF("vocab")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/lm_meta")
    val old = intercept[Exception] { ops.CurationIndex.load(spark, base) }
    assert(old.getMessage.contains("format"), old.getMessage)
    // and a FUTURE format version is refused too, not misread
    Seq((7L, 99L)).toDF("vocab", "format")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/lm_meta")
    val future = intercept[Exception] { ops.CurationIndex.load(spark, base) }
    assert(future.getMessage.contains("format 99"), future.getMessage)
  }

  test("moore-lewis stream matches the q163 batch selection per document " +
      "(real fixture)") {
    implicit val sql = spark.sqlContext
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val inLm = ops.Quality.charLm(docs.filter($"source".isin("src0", "src1")))
    val genLm = ops.Quality.charLm(docs.filter($"doc_id" % 3 === 0))
    val batch = ops.Quality.mooreLewisSelect(docs,
        docs.filter($"source".isin("src0", "src1")),
        docs.filter($"doc_id" % 3 === 0))
      .select($"doc_id", $"bits_in", $"bits_gen", $"xent_diff", $"selected")
      .as[(Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    // the deployment path: BOTH models persisted standalone and
    // reloaded (each its own directory — write() bundles only one LM)
    val base = java.nio.file.Files.createTempDirectory("graft-ml").toString
    ops.CurationIndex.writeLm(spark, s"$base/in", inLm)
    ops.CurationIndex.writeLm(spark, s"$base/gen", genLm)
    val inL = ops.CurationIndex.loadLm(spark, s"$base/in")
    val genL = ops.CurationIndex.loadLm(spark, s"$base/gen")
    val input = MemoryStream[TDoc]
    val q = ops.Streaming.mooreLewisStream(input.toDF(), inL, genL)
      .writeStream.format("memory").queryName("moore_lewis_stream")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(rows.toIndexedSeq.map { case (id, t) =>
        TDoc(id, t, new Timestamp(1700000000000L + id * 1000L)) }: _*)
      q.processAllAvailable()
      val out = spark.table("moore_lewis_stream")
        .as[(Long, Double, Double, Double, Boolean)].collect()
      assert(out.length === batch.size, "stream must score every batch doc")
      out.foreach { case (id, bi, bg, d, sel) =>
        val b = batch(id)
        assert(math.abs(bi - b._2) <= 1e-6, s"bits_in doc $id")
        assert(math.abs(bg - b._3) <= 1e-6, s"bits_gen doc $id")
        assert(math.abs(d - b._4) <= 1e-6, s"diff doc $id")
        if (math.abs(b._4) > 1e-5)
          assert(sel === b._5, s"selection diverges on doc $id (diff ${b._4})")
      }
    }
  }

  test("unified gopher stream matches gopherFullBattery column-for-column " +
      "(planted repetition corpus)") {
    implicit val sql = spark.sqlContext
    val raw = ops.Sources.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // plant both repetition breaches in test code (both arms see the
    // identical rows, so any deterministic plant works)
    val planted = raw.map { case (id, t) =>
      val w = t.split(" ").filter(_.nonEmpty)
      val l8 = w.take(8).mkString(" ")
      val p6 = w.take(6).mkString(" ")
      val t2 =
        if (id % 5 == 0) t + "\n" + l8 + "\n" + l8
        else if (id % 7 == 0) t + " " + p6 + " " + p6 + " " + p6 + " " + p6
        else t
      (id, t2)
    }
    val batch = ops.Quality
      .gopherFullBattery(planted.toSeq.toDF("doc_id", "text"),
        minWords = 30L, minStop = 1L)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(batch.values.exists(r => r(4) == false), "line gate fires")
    assert(batch.values.exists(r => r(14) == false), "ngram gate fires")
    val input = MemoryStream[TDoc]
    val q = ops.Streaming
      .gopherFullBatteryStream(input.toDF(), minWords = 30L, minStop = 1L)
      .writeStream.format("memory").queryName("gopher_full_stream")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(planted.toIndexedSeq.map { case (id, t) =>
        TDoc(id, t, new Timestamp(1700000000000L + id * 1000L)) }: _*)
      q.processAllAvailable()
      val out = spark.table("gopher_full_stream").collect()
      assert(out.length === batch.size, "stream must gate every doc")
      out.foreach { r =>
        assert(r.toSeq === batch(r.getLong(0)),
          s"doc ${r.getLong(0)} diverges from the batch battery")
      }
    }
  }

  test("ccnet bucket stream matches the q120 batch assignment per document " +
      "(real fixture)") {
    implicit val sql = spark.sqlContext
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val cands = docs.filter($"doc_id" % 3 =!= 0)
    val ref = docs.filter($"doc_id" % 3 === 0)
    val batch = ops.Quality.q120CcnetBuckets(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(batch.values.map(_._3).toSet === Set("head", "middle", "tail"))
    val (c1, c2) = ops.Quality.ccnetCutoffs(cands, ref)
    val lm = ops.Quality.charLm(ref)
    val rows = cands.select($"doc_id", $"text").as[(Long, String)].collect()
    val input = MemoryStream[TDoc]
    val q = ops.Streaming.ccnetBucketStream(input.toDF(), lm, c1, c2)
      .writeStream.format("memory").queryName("ccnet_bucket_stream")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(rows.toIndexedSeq.map { case (id, t) =>
        TDoc(id, t, new Timestamp(1700000000000L + id * 1000L)) }: _*)
      q.processAllAvailable()
      val out = spark.table("ccnet_bucket_stream")
        .as[(Long, Long, String)].collect()
      assert(out.length === batch.size, "stream must bucket every doc")
      out.foreach { case (id, micro, bucket) =>
        val b = batch(id)
        assert(math.abs(micro - b._2) <= 1L, s"bits_micro doc $id")
        // a 1-micro kernel/batch rounding delta can only flip the
        // bucket when the doc sits exactly on a cutoff
        if (micro != c1 && micro != c2 && b._2 != c1 && b._2 != c2)
          assert(bucket === b._3, s"bucket doc $id (micro $micro vs ${b._2})")
      }
    }
  }

  test("per-language ccnet bucket stream matches the q180 batch assignment " +
      "per document (real fixture)") {
    implicit val sql = spark.sqlContext
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val cands = docs.filter($"doc_id" % 3 =!= 0)
    val ref = docs.filter($"doc_id" % 3 === 0)
    val batch = ops.Quality.q180CcnetLangBuckets(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(batch.values.map(_._2).toSet.size > 1, "fixture must be multilingual")
    val models = ops.Quality.ccnetLangModels(cands, ref)
    assert(models.keySet === batch.values.map(_._2).toSet,
      "one fitted model per language the batch arm scored")
    val rows = cands.select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    val input = MemoryStream[LDoc]
    val q = ops.Streaming.ccnetBucketStreamByLang(input.toDF(), models)
      .writeStream.format("memory").queryName("ccnet_lang_stream")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(rows.toIndexedSeq.map { case (id, l, t) =>
        LDoc(id, l, t, new Timestamp(1700000000000L + id * 1000L)) }: _*)
      q.processAllAvailable()
      val out = spark.table("ccnet_lang_stream")
        .as[(Long, String, Long, String)].collect()
      assert(out.length === batch.size, "stream must bucket every doc")
      out.foreach { case (id, lang, micro, bucket) =>
        val (_, bLang, bMicro, bBucket) = batch(id)
        assert(lang === bLang, s"lang doc $id")
        assert(math.abs(micro - bMicro) <= 1L, s"bits_micro doc $id")
        // same boundary caveat as the global twin: a 1-micro
        // kernel/batch rounding delta can only flip the bucket when
        // the doc sits exactly on its language's cutoff
        val (_, c1, c2) = models(lang)
        if (micro != c1 && micro != c2 && bMicro != c1 && bMicro != c2)
          assert(bucket === bBucket,
            s"bucket doc $id (micro $micro vs $bMicro, lang $lang)")
      }
    }
  }

  test("per-language ccnet bucket stream drops unmodeled-language docs " +
      "(batch inner-join contract)") {
    implicit val sql = spark.sqlContext
    val models = Map("en" ->
      ((ops.Quality.charLm(Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")),
        1500000L, 3000000L)))
    val input = MemoryStream[LDoc]
    val q = ops.Streaming.ccnetBucketStreamByLang(input.toDF(), models)
      .writeStream.format("memory").queryName("ccnet_lang_drop_stream")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(
        LDoc(1L, "en", "the cat sat", new Timestamp(1700000000000L)),
        LDoc(2L, "xx", "unmodeled language text", new Timestamp(1700000001000L)),
        LDoc(3L, "en", "x", new Timestamp(1700000002000L))) // < 2 code points
      q.processAllAvailable()
      val out = spark.table("ccnet_lang_drop_stream")
        .as[(Long, String, Long, String)].collect()
      assert(out.map(_._1).toSet === Set(1L),
        "unmodeled-language and sub-2-codepoint docs must be dropped")
    }
  }

  test("soft-dedup stream matches the q162 batch weights per document " +
      "(real fixture)") {
    implicit val sql = spark.sqlContext
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val batch = ops.Similarity.softDedupWeights(docs)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(batch.values.exists(_._3 > 1L), "fixture must carry clusters")
    // the deployment shape: cluster state from the (offline) batch CC
    // fit, the ingest stream probing it via a stream-static join
    val state = batch.values.toSeq.map(r => (r._1, r._2, r._3))
      .toDF("doc_id", "cluster_id", "cluster_size")
      // singleton rows withheld: the stream must re-derive weight-1
      // membership through its left-join coalesce, not read it
      .filter($"cluster_size" > 1L)
    val rows = docs.select($"doc_id", $"text").as[(Long, String)].collect()
    val input = MemoryStream[TDoc]
    val q = ops.Streaming.softDedupStream(input.toDF(), state)
      .writeStream.format("memory").queryName("soft_dedup_stream")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(rows.toIndexedSeq.map { case (id, t) =>
        TDoc(id, t, new Timestamp(1700000000000L + id * 1000L)) }: _*)
      q.processAllAvailable()
      val out = spark.table("soft_dedup_stream")
        .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      assert(out.length === batch.size, "stream must weight every doc")
      out.foreach { r =>
        assert(r === batch(r._1), s"doc ${r._1} diverges from batch")
      }
    }
  }

  test("bm25 query stream matches the batch scorer per micro-batch " +
      "against a persisted index") {
    implicit val sql = spark.sqlContext
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val tf = ops.Similarity.bm25TermFreqs(docs)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-stream").toString
    ops.CurationIndex.writeBm25(spark, dir, tf)
    org.apache.spark.sql.graftshim.GraftColumns
      .checkpointRdd(tf).foreach(_.unpersist(false))
    val index = ops.CurationIndex.loadBm25(spark, dir).persist()
    val qrows = docs.filter($"doc_id" % 7 === 0)
      .select($"doc_id", array_join(slice(split($"text", " "), 1, 5), " "))
      .as[(Long, String)].collect()
    assert(qrows.length >= 4, "fixture must supply several queries")
    val (b1, b2) = qrows.splitAt(qrows.length / 2)
    val got = scala.collection.mutable.ArrayBuffer[Array[
      (Long, Int, Long, Long)]]()
    val input = MemoryStream[QRow]
    val q = ops.Streaming.bm25QueryStream(input.toDF(), index,
      out => got.synchronized {
        got += out.as[(Long, Int, Long, Long)].collect()
      }, k = 3)
    withQuery(q) {
      Seq(b1, b2).foreach { b =>
        input.addData(b.toIndexedSeq.map { case (id, t) =>
          QRow(id, t, new Timestamp(1700000000000L + id * 1000L)) }: _*)
        q.processAllAvailable()
      }
    }
    assert(got.length === 2, "one sink call per micro-batch")
    Seq(b1, b2).zip(got).foreach { case (b, out) =>
      val expect = ops.Similarity.bm25TopKFrom(index,
          b.toSeq.toDF("query_id", "text"), k = 3)
        .as[(Long, Int, Long, Long)].collect()
        .sortBy(r => (r._1, r._2))
      assert(out.sortBy(r => (r._1, r._2)) === expect,
        "micro-batch diverges from the batch scorer")
    }
    index.unpersist()
  }

  test("site-boilerplate stream matches the batch apply per micro-batch " +
      "against a static fitted set") {
    implicit val sql = spark.sqlContext
    val fitCorpus = ops.Quality.sitePlant(
      ops.Sources.documents(spark, "/root/testdata/sf0.001"))
    val bp = ops.Quality.siteBoilerplateSet(fitCorpus, minDocs = 3L)
      .persist()
    assert(bp.count() > 0, "fixture must fit a non-empty boilerplate set")
    val rows = fitCorpus.as[(Long, String, Seq[String])].collect()
    val (batch1, batch2) = rows.sortBy(_._1).splitAt(rows.length / 2)
    val got = scala.collection.mutable.ArrayBuffer[Array[
      (Long, Long, Long, String)]]()
    val input = MemoryStream[SDoc]
    val q = ops.Streaming.siteBoilerplateStream(input.toDF(), bp,
      out => got.synchronized {
        got += out.as[(Long, Long, Long, String)].collect()
      })
    withQuery(q) {
      Seq(batch1, batch2).foreach { b =>
        input.addData(b.toIndexedSeq.map { case (id, s, ls) =>
          SDoc(id, s, ls, new Timestamp(1700000000000L + id * 1000L)) }: _*)
        q.processAllAvailable()
      }
    }
    assert(got.length === 2, "one sink call per micro-batch")
    Seq(batch1, batch2).zip(got).foreach { case (b, out) =>
      val expect = ops.Quality.removeBoilerplateLines(
          b.toSeq.toDF("doc_id", "source", "lines"), bp)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      assert(out.sortBy(_._1) === expect,
        "micro-batch diverges from the batch apply")
    }
    bp.unpersist()
  }

  test("perceptual image dedup stream matches the batch delta arm per " +
      "micro-batch against a persisted index") {
    implicit val sql = spark.sqlContext
    // deterministic 1024-float images, q169's generator algebra
    def vec(seed: Int, shift: Int = 0): Seq[Float] =
      (0 until 1024).map { i =>
        ((((seed * 31 + i) * (i + 7)) % 4093) % 200 + shift).toFloat
      }
    val base = Seq((1L, vec(1)), (2L, vec(5))).toDF("img_id", "img")
    val survivors = ops.Images.perceptualDedup(base)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-phash-stream").toString
    ops.CurationIndex.writePhash(spark, dir, survivors)
    val index = ops.CurationIndex.loadPhash(spark, dir).persist()
    // batch 1: an index hit (brightness copy of #1) + a fresh pair;
    // batch 2: another index hit + a singleton — the stream must
    // resolve each micro-batch independently, exactly like daily deltas
    val batches = Seq(
      Seq(PImg(10L, vec(1, shift = 30)), PImg(11L, vec(33)),
        PImg(12L, vec(33, shift = 25))),
      Seq(PImg(20L, vec(5, shift = 40)), PImg(21L, vec(64))))
    val got = scala.collection.mutable.ArrayBuffer[Array[
      (Long, Long, Long, Boolean, Boolean)]]()
    val input = MemoryStream[PImg]
    val q = ops.Streaming.perceptualDedupStream(input.toDF(), index,
      out => got.synchronized {
        got += out.as[(Long, Long, Long, Boolean, Boolean)].collect()
      })
    withQuery(q) {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
    }
    assert(got.length === batches.length, "one sink call per micro-batch")
    batches.zip(got).foreach { case (b, out) =>
      val expect = ops.Images.perceptualDedupDelta(
          b.toDF(), index)
        .as[(Long, Long, Long, Boolean, Boolean)].collect()
        .sortBy(_._1)
      assert(out.sortBy(_._1) === expect,
        s"micro-batch ${b.map(_.img_id)} diverges from the batch delta arm")
    }
    // semantics spot-check: hits adopted, fresh pair clustered in-batch
    val all = got.flatten.map(r => r._1 -> r).toMap
    assert(all(10L)._3 === 1L && all(10L)._4)
    assert(all(12L)._3 === 11L && !all(12L)._4 && !all(12L)._5)
    assert(all(20L)._3 === 2L && all(20L)._4)
    assert(all(21L)._3 === 21L && all(21L)._5)
    index.unpersist()
  }

  test("URL curation stream matches the q177 batch semantics: canonical " +
      "parity, blocked rows dropped, first arrival per canonical wins") {
    implicit val sql = spark.sqlContext
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val batch = ops.Text.q177UrlCuration(spark, "/root/testdata/sf0.001")
      .as[(Long, String, Boolean, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val planted = ops.Text.urlPlant(docs)
      .select($"doc_id", $"url").as[(Long, String)].collect().sortBy(_._1)
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = ops.Streaming.urlCurationStream(
        input.toDF().toDF("doc_id", "url", "ts"), Seq("src1.com"))
      .writeStream.format("memory").queryName("url_curation_stream")
      .outputMode("append").start()
    withQuery(q) {
      // arrival order follows doc_id — the batch min-id survivor rule
      input.addData(planted.toIndexedSeq.map { case (id, u) =>
        (id, u, new Timestamp(1700000000000L + id * 1000L)) }: _*)
      q.processAllAvailable()
      val out = spark.table("url_curation_stream")
        .select($"doc_id", $"canonical_url")
        .as[(Long, String)].collect().map(r => r._1 -> r._2).toMap
      // the stream's survivors are exactly the batch's unblocked ones
      val expect = batch.values.filter(r => r._5 && !r._3)
        .map(r => r._1 -> r._2).toMap
      assert(out === expect,
        "stream frontier == batch unblocked survivors, canonical bytes equal")
    }
  }

  test("admission v2 stream matches the q125 batch gates per document (real fixture)") {
    implicit val sql = spark.sqlContext
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter($"doc_id" % 97 === 0)
    val cands = docs.filter($"doc_id" % 97 =!= 0)
    val lmRef = docs.filter($"doc_id" % 3 === 0)
    val target = docs.filter($"source".isin("src0", "src1"))
    val benchSet = ops.SpanDedup.benchGramHashes(bench, 24).as[Long].collect()
    val lm = ops.Quality.charLm(lmRef)
    val dsir = ops.Quality.dsirModel(cands, target)
    // the q125 component batch arms, per doc
    val gop = ops.Quality.gopherRules(cands, 30L, 1L)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val dsw = ops.Quality.dsirWeights(cands, target)
      .select($"doc_id", $"log_weight").as[(Long, Double)].collect().toMap
    val lmB = ops.Quality.lmScore(cands, lmRef)
      .select($"doc_id", $"bits_per_transition")
      .as[(Long, Double)].collect().toMap
    val contamB = ops.SpanDedup.decontaminate(cands, bench, 24)
      .select($"doc_id", $"contaminated_chars")
      .as[(Long, Long)].collect().toMap
    val rows = cands.select($"doc_id", $"text").as[(Long, String)].collect()
    val input = MemoryStream[TDoc]
    val q = ops.Streaming.admissionStreamV2(input.toDF(),
        Array.empty[Long], benchSet, lm, dsir)
      .writeStream.format("memory").queryName("admission_v2")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(rows.toIndexedSeq.map { case (id, t) =>
        TDoc(id, t, new Timestamp(1700000000000L + id * 1000L)) }: _*)
      q.processAllAvailable()
      val out = spark.table("admission_v2").collect()
      assert(out.length > 100, "stream must emit the candidate corpus")
      out.foreach { r =>
        val id = r.getLong(r.fieldIndex("doc_id"))
        assert(r.getBoolean(r.fieldIndex("gopher_keep")) === gop(id),
          s"gopher doc $id")
        assert(math.abs(r.getDouble(r.fieldIndex("log_weight")) -
          dsw.getOrElse(id, 0.0)) <= 1e-6, s"dsir weight doc $id")
        assert(r.getBoolean(r.fieldIndex("dsir_ok")) ===
          (dsw.getOrElse(id, 0.0) >= -8.0), s"dsir_ok doc $id")
        assert(math.abs(r.getDouble(r.fieldIndex("lm_bits")) -
          lmB.getOrElse(id, 0.0)) <= 1e-6, s"lm doc $id")
        assert(r.getLong(r.fieldIndex("contaminated_chars")) ===
          contamB.getOrElse(id, 0L), s"contam doc $id")
        val expect = r.getLong(r.fieldIndex("n_tok")) >= 5L &&
          r.getDouble(r.fieldIndex("dup_coverage")) <= 0.5 &&
          r.getLong(r.fieldIndex("contaminated_chars")) == 0L &&
          r.getDouble(r.fieldIndex("lm_bits")) <= 6.0 &&
          r.getBoolean(r.fieldIndex("gopher_keep")) &&
          r.getBoolean(r.fieldIndex("dsir_ok"))
        assert(r.getBoolean(r.fieldIndex("keep")) === expect, s"keep doc $id")
      }
      assert(out.exists(_.getBoolean(out.head.fieldIndex("keep"))),
        "kept docs exist")
      assert(out.exists(r => !r.getBoolean(r.fieldIndex("keep"))),
        "dropped docs exist")
    }
  }

  test("admission v3 stream = v2 gates + the unified-battery repetition " +
      "gates (planted corpus)") {
    implicit val sql = spark.sqlContext
    val docs = ops.Sources.documents(spark, "/root/testdata/sf0.001")
    val raw = docs.filter($"doc_id" % 97 =!= 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // plant repetition breaches so the NEW gates decide real admissions
    val planted = raw.map { case (id, t) =>
      val w = t.split(" ").filter(_.nonEmpty)
      val t2 =
        if (id % 5 == 0) t + "\n" + w.take(8).mkString(" ") +
          "\n" + w.take(8).mkString(" ")
        else if (id % 7 == 0)
          t + (" " + w.take(6).mkString(" ")) * 4
        else t
      (id, t2)
    }
    val bench = docs.filter($"doc_id" % 97 === 0)
    val lm = ops.Quality.charLm(docs.filter($"doc_id" % 3 === 0))
    val dsir = ops.Quality.dsirModel(docs.filter($"doc_id" % 97 =!= 0),
      docs.filter($"source".isin("src0", "src1")))
    val benchSet = ops.SpanDedup.benchGramHashes(bench, 24).as[Long].collect()
    val battery = ops.Quality
      .gopherFullBattery(planted.toSeq.toDF("doc_id", "text"),
        minWords = 30L, minStop = 1L)
      .select($"doc_id", $"lines_keep", $"ngrams_keep")
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(battery.values.exists(!_._2) && battery.values.exists(!_._3),
      "both new gates must fire on the plant")
    def run(name: String, mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame): Map[Long, org.apache.spark.sql.Row] = {
      val input = MemoryStream[TDoc]
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(name).outputMode("append").start()
      withQuery(q) {
        input.addData(planted.toIndexedSeq.map { case (id, t) =>
          TDoc(id, t, new Timestamp(1700000000000L + id * 1000L)) }: _*)
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => r.getLong(r.fieldIndex("doc_id")) -> r).toMap
      }
    }
    val v2 = run("admission_v2_for_v3", df =>
      ops.Streaming.admissionStreamV2(df, Array.empty[Long], benchSet, lm, dsir))
    val v3 = run("admission_v3", df =>
      ops.Streaming.admissionStreamV3(df, Array.empty[Long], benchSet, lm, dsir))
    assert(v3.size === v2.size && v3.nonEmpty)
    v3.foreach { case (id, r) =>
      val (_, lk, nk) = battery(id)
      assert(r.getBoolean(r.fieldIndex("lines_keep")) === lk, s"lines doc $id")
      assert(r.getBoolean(r.fieldIndex("ngrams_keep")) === nk, s"ngrams doc $id")
      val v2keep = v2(id).getBoolean(v2(id).fieldIndex("keep"))
      assert(r.getBoolean(r.fieldIndex("keep")) === (v2keep && lk && nk),
        s"v3 keep doc $id")
    }
    // the upgrade is load-bearing: some doc v2 admits, v3 drops
    assert(v3.exists { case (id, r) =>
      v2(id).getBoolean(v2(id).fieldIndex("keep")) &&
        !r.getBoolean(r.fieldIndex("keep"))
    }, "the repetition gates must flip at least one admission")
  }

  test("semantic decontamination gate applies UNCHANGED to a streaming frame") {
    // semanticDecontaminate is stateless expressions over a 1-row
    // stream-static broadcast attach, so the BATCH FUNCTION is the
    // streaming twin — no kernel duplication to keep in parity.
    implicit val sql = spark.sqlContext
    val emb = ops.Sources.embeddings(spark, "/root/testdata/sf0.001")
    val bench = emb.filter($"vec_id" % 29 === 0)
      .select($"vec_id".as("bench_id"), $"embedding")
    val cand = emb.filter($"vec_id" % 29 =!= 0)
      .unionByName(emb.filter($"vec_id" % 58 === 0)
        .select(($"vec_id" + 1000000L).as("vec_id"),
          transform($"embedding", x => (x * lit(2.0f)).cast("float"))
            .as("embedding"), $"label"))
    val batch = ops.Similarity.semanticDecontaminate(
        cand, "vec_id", "embedding", bench, "bench_id", "embedding", 0.999)
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "fixture sanity: planted copies must flag")
    val rows = cand.select($"vec_id", transform($"embedding", _.cast("double")))
      .as[(Long, Seq[Double])].collect()
    val input = MemoryStream[EDoc]
    val q = ops.Similarity.semanticDecontaminate(
        input.toDF().withColumnRenamed("doc_id", "vec_id"),
        "vec_id", "embedding", bench, "bench_id", "embedding", 0.999)
      .writeStream.format("memory").queryName("sem_decontam")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(rows.toIndexedSeq.map { case (id, v) =>
        EDoc(id, v, new Timestamp(1700000000000L + id)) }: _*)
      q.processAllAvailable()
      val streamed = spark.table("sem_decontam")
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed === batch,
        "streamed flags must equal the batch gate's")
    }
  }

  test("dsir model persists and loads bit-identically") {
    val cands = Seq((1L, "aa bb cc"), (2L, "dd ee"))
      .toDF("doc_id", "text")
    val target = Seq((3L, "aa bb"), (4L, "ff gg hh"))
      .toDF("doc_id", "text")
    val m = ops.Quality.dsirModel(cands, target)
    val base = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    ops.CurationIndex.writeDsir(spark, base, m)
    val l = ops.CurationIndex.loadDsir(spark, base)
    assert(l.logRatio.toSeq === m.logRatio.toSeq)
    Seq("aa bb cc dd", "zz qq", "aa").foreach { t =>
      assert(l.logWeight(t) === m.logWeight(t), t)
    }
  }

  test("streaming curation: first arrival wins, coverage gates the keep") {
    implicit val sql = spark.sqlContext
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val ref = Seq(
      (100L, s"ref one $shared ref one tail"),
      (101L, s"ref two $shared ref two tail")).toDF("doc_id", "text")
    val dupSet = ops.SpanDedup.dupGramHashes(ref, gramLen = 24)
      .as[Long].collect()
    val cleanText = "totally novel content with plenty of fresh words in it"
    val input = MemoryStream[TDoc]
    val q = ops.Streaming.curationStream(input.toDF(), dupSet)
      .writeStream.format("memory").queryName("curation")
      .outputMode("append").start()
    withQuery(q) {
      input.addData(
        TDoc(1L, cleanText, Timestamp.valueOf("2024-01-01 10:00:00")),
        // mostly the shared run -> coverage > 0.5 -> dropped
        TDoc(2L, s"x $shared y", Timestamp.valueOf("2024-01-01 10:01:00")),
        // under 5 tokens -> dropped
        TDoc(3L, "too few words here", Timestamp.valueOf("2024-01-01 10:02:00")))
      q.processAllAvailable()
      // same text as doc 1, later batch -> suppressed by streaming dedup
      input.addData(
        TDoc(4L, cleanText, Timestamp.valueOf("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val rows = spark.table("curation")
        .select($"doc_id", $"dup_coverage", $"keep")
        .as[(Long, Double, Boolean)].collect()
        .map(t => t._1 -> (t._2, t._3)).toMap
      assert(rows.keySet === Set(1L, 2L, 3L), "doc 4 must be dedup-suppressed")
      assert(rows(1L)._2 === true)
      assert(rows(1L)._1 === 0.0)
      assert(rows(2L)._2 === false, "span coverage must gate the keep")
      assert(rows(2L)._1 > 0.5)
      assert(rows(3L)._2 === false, "token floor must gate the keep")
    }
  }

  test("streaming paragraph dedup: cross-batch state drops repeats, " +
      "stream equals batch when ingest follows doc order") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Seq[String])]
    val q = ops.Streaming.paragraphDedupStream(
        input.toDF().toDF("doc_id", "lines"))
      .writeStream.format("memory").queryName("para_dedup")
      .outputMode("append").start()
    val b1 = Seq(
      1L -> Seq("unique one", "cookie banner", "unique two"),
      2L -> Seq("cookie banner", "unique three", "cookie banner"))
    val b2 = Seq(
      3L -> Seq("cookie banner"),                  // dup from batch 1
      4L -> Seq("repeat me", "repeat me", "fresh line"))
    withQuery(q) {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val stream = spark.table("para_dedup")
        .as[(Long, Int, String)].collect().toSet
      // batch arm over the union, same survivor rule
      val batch = ops.Quality.dedupParagraphs(
          (b1 ++ b2).toDF("doc_id", "lines"))
        .select($"doc_id", $"cleaned_text")
        .as[(Long, Option[String])].collect().toMap
      val streamByDoc = stream.groupBy(_._1).map { case (d, occ) =>
        d -> occ.toSeq.sortBy(_._2).map(_._3).mkString("\n")
      }
      (1L to 4L).foreach { d =>
        assert(batch(d) === streamByDoc.get(d),
          s"doc $d: stream ${streamByDoc.get(d)} vs batch ${batch(d)}")
      }
      assert(!streamByDoc.contains(3L), "pure-boilerplate doc emits nothing")
    }
  }

  test("T4 edge: watermarkAcceptanceFromArrival reproduces the streaming " +
      "accept/drop verdict at the exact watermark boundary (ms-truncated " +
      "max, strict microsecond compare)") {
    implicit val sql = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // batch 0: max ts 10:00:00.000700 -> watermark for batch 1 is the
    // MS-TRUNCATED max minus 10 min = 09:50:00.000000 exactly. Batch 1
    // then straddles every edge: exactly AT the watermark (drop), 1 us
    // below (drop), 1 ms below (drop), 500 us above (accept — proves
    // the compare is NOT ms-truncated), 1 ms above (accept).
    val rows = Seq(
      (1L, t("2024-01-01 10:00:00.000700"), 0L),
      (2L, t("2024-01-01 09:50:00.0"), 1L),        // == watermark
      (3L, t("2024-01-01 09:49:59.999999"), 1L),   // 1 us late
      (4L, t("2024-01-01 09:49:59.999"), 1L),      // 1 ms late
      (5L, t("2024-01-01 09:50:00.000500"), 1L),   // 500 us inside
      (6L, t("2024-01-01 09:50:00.001"), 1L))      // 1 ms inside
    // streaming ground truth: feed the two batches through
    // dropDuplicatesWithinWatermark (all ids distinct, so the output
    // set IS the accepted set)
    val input = MemoryStream[(Long, Timestamp)]
    val q = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("wm_edge")
      .outputMode("append").start()
    val accepted = withQuery(q) {
      input.addData(rows.filter(_._3 == 0L).map(r => (r._1, r._2)))
      q.processAllAvailable()
      input.addData(rows.filter(_._3 == 1L).map(r => (r._1, r._2)))
      q.processAllAvailable()
      spark.table("wm_edge").select($"event_id").as[Long].collect().toSet
    }
    assert(accepted === Set(1L, 5L, 6L),
      s"streaming truth moved: $accepted — the pinned rule is stale")
    // the batch audit, given the same arrival batching, must agree
    // row for row (arrival_us spaces the two batches one span apart)
    val arr = rows.toDF("event_id", "ts", "b")
      .select($"event_id", unix_micros($"ts").as("ts_us"),
        ($"b" * 1000000L).as("arrival_us"))
    val audit = ops.Streaming
      .watermarkAcceptanceFromArrival(arr, delayMs = 600000L,
        batchSpanUs = 1000000L)
      .select($"event_id", $"accepted").as[(Long, Boolean)]
      .collect().toMap
    rows.foreach { case (id, _, _) =>
      assert(audit(id) === accepted.contains(id), s"event $id") }
    // and the audit's watermark column carries the exact pinned value:
    // event 2 sits AT the watermark by construction, so batch 1's
    // watermark must equal its event time to the microsecond
    val audit1 = ops.Streaming
      .watermarkAcceptanceFromArrival(arr, 600000L, 1000000L)
      .filter($"batch_id" === 1L)
      .select($"event_id", $"ts_us", $"watermark_us")
      .as[(Long, Long, Long)].collect()
    val wm = audit1.head._3
    assert(audit1.forall(_._3 == wm), "one watermark per batch")
    assert(wm === audit1.find(_._1 == 2L).get._2,
      "batch-1 watermark must equal event 2's timestamp exactly")
  }
}
