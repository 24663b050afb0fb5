package graft

import org.apache.spark.sql.functions._

/** Multimodal binary-column tests (SURVEY §2.11 L4): PCM16 decode math,
  * window/frame batch shapes, deterministic sampling, and the unified
  * asset schema.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  /** PCM16LE bytes for the int16 samples. */
  private def pcm(samples: Short*): Array[Byte] =
    samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray

  private def assets(rows: (Long, String, Array[Byte])*) =
    rows.toSeq.toDF("asset_id", "modality", "content")
      .withColumn("meta", map(lit("codec"), lit("raw")))

  test("PCM16 decode: exact little-endian signed conversion") {
    val out = ops.Multimodal.decodePcm16(pcm(0, 16384, -16384, 32767, -32768))
    assert(out(0) === 0.0f)
    assert(out(1) === 0.5f)
    assert(out(2) === -0.5f)
    assert(math.abs(out(3) - 0.99997f) < 1e-4)
    assert(out(4) === -1.0f)
  }

  test("audio windows: frame count, RMS, and zero-crossing math") {
    // 8 samples, win=4, hop=2 -> 3 frames
    val a = assets((1L, "audio",
      pcm(16384, -16384, 16384, -16384, 0, 0, 0, 0)))
    val out = ops.Multimodal.audioFeatures(a, win = 4, hop = 2)
      .orderBy($"frame_idx")
      .as[(Long, Int, Double, Int)].collect()
    assert(out.length === 3)
    // frame 0: alternating ±0.5 -> rms 0.5, 3 sign flips
    assert(out(0) === ((1L, 0, 0.5, 3)))
    // frame 2: all zeros -> rms 0, no strict sign flips
    assert(out(2)._3 === 0.0)
  }

  test("audio shorter than one window yields no frames, not an error") {
    val a = assets((1L, "audio", pcm(1, 2)))
    assert(ops.Multimodal.audioFeatures(a, win = 4, hop = 2).count() === 0)
  }

  test("video frame sampling: every k-th frame, correct slicing") {
    // 6 frames of 4 bytes each, values distinct per frame
    val content = (0 until 24).map(i => (i / 4 * 10 + 1).toByte).toArray
    val a = assets((7L, "video", content))
    val frames = ops.Multimodal.sampleFrames(a, frameBytes = 4, everyK = 2)
      .orderBy($"frame_idx")
    val idx = frames.select($"frame_idx").as[Int].collect()
    assert(idx === Array(0, 2, 4))
    val feats = ops.Multimodal.frameFeatures(frames)
      .orderBy($"frame_idx")
      .select($"mean_intensity").as[Double].collect()
    // frame f has all bytes = f*10+1
    assert(feats === Array(1.0, 21.0, 41.0))
  }

  test("modality filter keeps the unified schema selective") {
    val a = assets(
      (1L, "audio", pcm(1, 2, 3, 4)),
      (2L, "video", Array.fill(8)(1.toByte)))
    assert(ops.Multimodal.audioFeatures(a, 2, 1).select($"asset_id")
      .distinct().as[Long].collect() === Array(1L))
    assert(ops.Multimodal.sampleFrames(a, 4, 1).select($"asset_id")
      .distinct().as[Long].collect() === Array(2L))
  }

  test("clip gate: hand cosines, tie-proof rounded threshold, and a " +
      "shuffle-free map-only plan") {
    val pairs = Seq(
      (1L, Seq(1.0, 0.0, 0.0), Seq(1.0, 0.0, 0.0)),   // identical: cos 1
      (2L, Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),   // orthogonal: cos 0
      (3L, Seq(1.0, 0.0, 0.0), Seq(-1.0, 0.0, 0.0)),  // opposite: cos -1
      (4L, Seq(1.0, 0.0, 0.0), Seq(0.28, 0.96, 0.0)), // exactly at the cut
      (5L, Seq(1.0, 0.0, 0.0), Seq(0.2799994, 0.96, 0.0)) // rounds below
    ).toDF("pair_id", "img_vec", "txt_vec")
    val got = ops.Multimodal.clipGate(pairs, "img_vec", "txt_vec")
      .select($"pair_id", $"clip_cos", $"keep")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === 1.0 && got(1L)._3)
    assert(got(2L)._2 === 0.0 && !got(2L)._3)
    assert(got(3L)._2 === -1.0 && !got(3L)._3)
    // |(0.28, 0.96)| = 1 exactly, so cos = 0.28 and the >= keeps it
    assert(got(4L)._2 === 0.28 && got(4L)._3)
    assert(!got(5L)._3, "keep compares the ROUNDED cosine")
    // pure map: the gate itself introduces no Exchange
    val plan = ops.Multimodal.clipGate(pairs, "img_vec", "txt_vec")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"clip gate must not shuffle:\n$plan")
  }

  /** Raw grayscale "video": `nFrames` 32×32 frames, pixel (f,i) a pure
    * function of (seed, f, i); multiplicative seed mixing (the q169
    * lesson — an additive seed is a brightness offset dHash ignores).
    */
  private def rawVideo(seed: Int, nFrames: Int, shift: Int = 0,
      from: Int = 0): Array[Byte] = {
    (from until nFrames).flatMap { f =>
      (0 until 1024).map { i =>
        ((((seed * 31 + f * 131 + i) * (i + 7)) % 4093 % 200 + shift) & 0xff)
          .toByte
      }
    }.toArray
  }

  test("video near-dup: re-encoded, brightness-shifted, and trimmed " +
      "copies collapse on shared frame hashes; distinct videos survive") {
    val a = assets(
      (10L, "video", rawVideo(1, 6)),
      (11L, "video", rawVideo(1, 6)),             // byte-identical re-upload
      (12L, "video", rawVideo(1, 6, shift = 20)), // brightness-adjusted copy
      (13L, "video", rawVideo(1, 6, from = 2)),   // trimmed: frames 2..5
      (20L, "video", rawVideo(9, 6)),             // distinct content
      (30L, "video", rawVideo(77, 4)),            // distinct, shorter
      (40L, "audio", pcm(1, 2, 3, 4)))            // wrong modality: ignored
    val out = ops.Multimodal.videoNearDup(a, frameBytes = 1024,
        everyK = 1, minShared = 3)
      .select($"asset_id", $"n_frame_hashes", $"cluster_id", $"is_survivor")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(40L), "audio assets never enter the video index")
    Seq(10L, 11L, 12L, 13L).foreach { id =>
      assert(out(id)._3 === 10L, s"$id clusters onto the original upload")
      assert(out(id)._4 === (id == 10L))
    }
    assert(out(13L)._2 === 4L, "the trim keeps 4 sampled frames")
    Seq(20L, 30L).foreach { id =>
      assert(out(id)._3 === id && out(id)._4, s"$id must survive alone")
    }
    // below the shared-frame floor: a 2-frame overlap does NOT match
    val b = assets(
      (10L, "video", rawVideo(1, 6)),
      (14L, "video", rawVideo(1, 6, from = 4))) // only frames 4..5 shared
    val out2 = ops.Multimodal.videoNearDup(b, frameBytes = 1024,
        everyK = 1, minShared = 3)
      .select($"asset_id", $"is_survivor").as[(Long, Boolean)]
      .collect().toMap
    assert(out2(10L) && out2(14L), "2 shared frames < minShared keeps both")
  }

  test("q176 planted corpus: brightness and trimmed twins collapse onto " +
      "their base asset, distinct videos survive, black frame df-capped") {
    val out = ops.Multimodal.q176VideoNearDup(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    val docIds = ops.Sources.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id").as[Long].collect()
    assert(out.size === docIds.length + docIds.count(_ % 5 == 0) +
      docIds.count(_ % 9 == 0), "one row per planted asset")
    docIds.foreach { d =>
      assert(out(d * 4)._3 === d * 4 && out(d * 4)._4,
        s"base asset of doc $d is its own min-id survivor")
      if (d % 5 == 0)
        assert(out(d * 4 + 1)._3 === d * 4 && !out(d * 4 + 1)._4,
          s"brightness twin of doc $d collapses onto the base")
      if (d % 9 == 0)
        assert(out(d * 4 + 2)._3 === d * 4 && !out(d * 4 + 2)._4,
          s"trimmed twin of doc $d collapses onto the base")
    }
    // the shared black title-card frame counts toward n_frame_hashes
    // (6 for full assets, 4 for trims) but never wires distinct docs
    // together: at this SF its df (600) exceeds the cap (100)
    docIds.foreach { d =>
      assert(out(d * 4)._2 === 6L, s"doc $d base carries 6 frame hashes")
      if (d % 9 == 0) assert(out(d * 4 + 2)._2 === 4L)
    }
  }
}
