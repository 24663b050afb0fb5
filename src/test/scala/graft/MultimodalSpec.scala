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
}
