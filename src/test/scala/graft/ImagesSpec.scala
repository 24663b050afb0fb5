package graft

import java.awt.image.BufferedImage
import java.io.File

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

/** Image-source tests (SURVEY §2.1 S2–S4): real PNGs written with
  * ImageIO into a class-per-directory tree, scanned with binaryFile,
  * decoded, and balanced — the reference's load path end to end.
  */
class ImagesSpec extends SparkTestBase {
  import spark.implicits._

  /** 28×28 grayscale PNG whose pixel (r,c) intensity is a pure function
    * of (classIdx, r, c) — deterministic and distinct per class.
    */
  private def writePng(file: File, classIdx: Int): Unit = {
    val img = new BufferedImage(28, 28, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (r <- 0 until 28; c <- 0 until 28)
      raster.setSample(c, r, 0, (classIdx * 37 + r * 5 + c * 3) % 256)
    ImageIO.write(img, "png", file)
  }

  private lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-images").toFile
    // imbalanced: A→4, B→2, C→3 images
    Seq(("A", 4), ("B", 2), ("C", 3)).zipWithIndex.foreach {
      case ((cls, n), ci) =>
        val d = new File(dir, cls); d.mkdirs()
        (0 until n).foreach(i => writePng(new File(d, s"img$i.png"), ci * 10 + i))
    }
    dir.toString
  }

  test("S2 scan labels rows from the parent directory") {
    val counts = ops.Images.scan(spark, root)
      .groupBy($"label").count().as[(String, Long)].collect().toMap
    assert(counts === Map("A" -> 4L, "B" -> 2L, "C" -> 3L))
  }

  test("S3 decode pads 28x28 to 32x32 with a centered 2px black border") {
    val row = ops.Images.decoded(spark, root)
      .filter($"label" === "A").select($"features").head().getSeq[Float](0)
    assert(row.length === 1024)
    // border rows/cols are zero
    assert((0 until 32).forall(c => row(c) === 0f))            // top row
    assert((0 until 32).forall(c => row(31 * 32 + c) === 0f))  // bottom row
    assert((0 until 32).forall(r => row(r * 32) === 0f))       // left col
    // interior pixel (2,2) = source pixel (0,0) of some class-A image
    val interior = row(2 * 32 + 2)
    assert(interior >= 0f && interior <= 255f)
    assert(row.exists(_ > 0f)) // not all black
  }

  test("S3 decode is the exact inverse of the generator at the pixel level") {
    // class A image 0 has classIdx 0: pixel (r,c) = (r*5 + c*3) % 256
    val feats = ops.Images.decoded(spark, root)
      .filter($"path".endsWith("A/img0.png"))
      .select($"features").head().getSeq[Float](0)
    for (r <- 0 until 28; c <- 0 until 28) {
      val expected = ((r * 5 + c * 3) % 256).toFloat
      assert(feats((r + 2) * 32 + (c + 2)) === expected, s"pixel ($r,$c)")
    }
  }

  test("S4 balanced load keeps exactly min-class-count rows per class") {
    val counts = ops.Images.loadBalanced(spark, root)
      .groupBy($"label").count().as[(String, Long)].collect().toMap
    assert(counts === Map("A" -> 2L, "B" -> 2L, "C" -> 2L))
  }

  test("L4 multimodal schema carries binary + metadata + vector together") {
    val df = ops.Images.decoded(spark, root)
    val fields = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("content") === "binary")
    assert(fields("label") === "string")
    assert(fields("features") === "array")
    assert(df.count() === 9)
  }

  /** 32×32 grayscale image with pixel (r,c) = f(seed,r,c), encoded in
    * `fmt`, run through the REAL decode UDF — the planted-transform
    * input for the perceptual-dedup tests.
    */
  private def encodedVector(seed: Int, fmt: String, shift: Int = 0,
      bumpTopLeft: Boolean = false): Array[Float] = {
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    for (r <- 0 until 32; c <- 0 until 32) {
      // multiplicative seed mixing — an additive seed term is a
      // near-constant brightness offset mod 200, which dHash ignores
      // by design, making "distinct" images collide
      val i = r * 32 + c
      val base = (((seed * 31 + i) * (i + 7)) % 4093) % 200
      val bump = if (bumpTopLeft && r < 4 && c < 4) 55 else 0
      raster.setSample(c, r, 0, base + shift + bump)
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    ops.Images.decodeToVector(bos.toByteArray)
  }

  test("perceptual dedup: re-encoded, brightness-shifted, and locally " +
      "edited copies collapse; distinct images survive") {
    import org.apache.spark.sql.graftshim.GraftColumns.dHash56
    // hash invariances on the REAL decode path
    val png = encodedVector(1, "png")
    val bmp = encodedVector(1, "bmp")
    val bright = encodedVector(1, "png", shift = 40)
    val edited = encodedVector(1, "png", bumpTopLeft = true)
    val other = encodedVector(9, "png")
    def hash(v: Array[Float]): Long =
      Seq((0L, v)).toDF("id", "img").select(dHash56($"img")).head().getLong(0)
    assert(hash(png) === hash(bmp), "re-encoding preserves the hash")
    assert(hash(png) === hash(bright), "global brightness preserves the hash")
    val editDist = java.lang.Long.bitCount(hash(png) ^ hash(edited))
    assert(editDist >= 1 && editDist <= 1, "a one-block edit flips at most one bit")
    assert(java.lang.Long.bitCount(hash(png) ^ hash(other)) > 3,
      "distinct images sit beyond the Hamming gate")
    // end to end: the planted group collapses to min id, others survive
    val imgs = Seq((10L, png), (11L, bmp), (12L, bright), (13L, edited),
      (20L, other), (30L, encodedVector(77, "png")))
      .toDF("img_id", "img")
    val out = ops.Images.perceptualDedup(imgs)
      .select($"img_id", $"cluster_id", $"is_survivor")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    Seq(10L, 11L, 12L, 13L).foreach { id =>
      assert(out(id)._2 === 10L, s"$id clusters onto the base image")
      assert(out(id)._3 === (id == 10L))
    }
    Seq(20L, 30L).foreach { id =>
      assert(out(id)._2 === id && out(id)._3, s"$id must survive alone")
    }
  }

  test("perceptual delta dedup: hits adopt the indexed cluster through a " +
      "persisted round-tripped index; misses cluster among themselves") {
    val base = Seq((1L, encodedVector(1, "png")), (2L, encodedVector(5, "png")),
      (3L, encodedVector(5, "bmp"))).toDF("img_id", "img")
    val survivors = ops.Images.perceptualDedup(base)
    assert(survivors.filter($"is_survivor").count() === 2,
      "base: {2,3} collapse, {1} survives")
    val dir = java.nio.file.Files.createTempDirectory("graft-phash").toString
    ops.CurationIndex.writePhash(spark, dir, survivors)
    val index = ops.CurationIndex.loadPhash(spark, dir)
    assert(index.as[(Long, Long)].collect().map(_._1).sorted === Array(1L, 2L))
    val delta = Seq(
      (10L, encodedVector(1, "png", shift = 30)),  // brightness copy of #1
      (11L, encodedVector(33, "png")),             // new content...
      (12L, encodedVector(33, "bmp")),             // ...re-encoded twin of 11
      (13L, encodedVector(64, "png"))              // fresh singleton
    ).toDF("img_id", "img")
    val out = ops.Images.perceptualDedupDelta(delta, index)
      .as[(Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(10L)._3 === 1L && out(10L)._4 && !out(10L)._5,
      "the brightness copy adopts indexed cluster 1, never survives")
    assert(out(11L)._3 === 11L && !out(11L)._4 && out(11L)._5)
    assert(out(12L)._3 === 11L && !out(12L)._4 && !out(12L)._5,
      "new-new twins cluster among themselves, min id survives")
    assert(out(13L)._3 === 13L && !out(13L)._4 && out(13L)._5)
    // a version-foreign directory fails descriptively, not silently
    val bad = java.nio.file.Files.createTempDirectory("graft-phash-bad").toString
    Seq(99L).toDF("format").write.parquet(s"$bad/phash_meta")
    survivors.filter($"is_survivor").select($"img_id", $"phash")
      .write.parquet(s"$bad/phash_hashes")
    val e = intercept[IllegalArgumentException] {
      ops.CurationIndex.loadPhash(spark, bad)
    }
    assert(e.getMessage.contains("format"))
  }

  test("perceptual dedup bandDfCap: planted boilerplate images bound the " +
      "band join; genuine near-dups still collapse through cold bands") {
    // 12 dHash-identical "boilerplate" images (solid gray — every
    // gradient bit 0, the letterhead/solid-color mode): all 4 band
    // buckets go hot together, the worst case for Σdf²
    val solid = Array.fill(1024)(128f)
    val boiler = (100L until 112L).map(i => (i, solid))
    val legit = Seq((10L, encodedVector(1, "png")),
      (11L, encodedVector(1, "png", shift = 40)), // brightness near-dup of 10
      (20L, encodedVector(9, "png")))
    val imgs = (boiler ++ legit).toDF("img_id", "img")
    val out = ops.Images.perceptualDedup(imgs, bandDfCap = 4)
      .select($"img_id", $"cluster_id", $"is_survivor")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out.size === 15, "one row per image regardless of the cap")
    // every boilerplate band bucket has df = 12 > 4: the cap drops them
    // all, so no boilerplate pair is ever materialized (the bounded-
    // pairs contract — an exact dedup upstream owns identical copies)
    boiler.foreach { case (id, _) =>
      assert(out(id)._2 === id && out(id)._3,
        s"capped boilerplate $id emits no pairs and survives alone")
    }
    // the genuine near-dup pair meets through its own cold buckets
    assert(out(10L)._2 === 10L && out(11L)._2 === 10L && !out(11L)._3,
      "cold-band near-dups still collapse under the cap")
    assert(out(20L)._2 === 20L && out(20L)._3)
    // with the cap above the boilerplate df the same input collapses —
    // the cap is the only thing separating the two behaviors
    val uncapped = ops.Images.perceptualDedup(imgs, bandDfCap = 12)
      .filter($"img_id" >= 100L)
      .select($"cluster_id").distinct().as[Long].collect()
    assert(uncapped === Array(100L), "cap >= df clusters the boilerplate")
  }

  test("DHash56 kernel matches an independent reference implementation") {
    val rnd = new scala.util.Random(42)
    import org.apache.spark.sql.graftshim.GraftColumns.dHash56
    def ref(v: Array[Float]): Long = {
      val s = Array.fill(8, 8)(0.0)
      for (i <- v.indices.take(1024))
        s((i / 32) / 4)((i % 32) / 4) += v(i)
      (for (r <- 0 until 8; c <- 0 until 7 if s(r)(c) < s(r)(c + 1))
        yield 1L << (r * 7 + c)).foldLeft(0L)(_ | _)
    }
    val vecs = (0 until 20).map(i =>
      i.toLong -> Array.fill(1024)(rnd.nextInt(256).toFloat))
    val got = vecs.toDF("id", "img")
      .select($"id", dHash56($"img").as("h"))
      .as[(Long, Long)].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) === ref(v), s"vector $id")
    }
    // short vector: missing pixels are zero-sum blocks
    val short = Seq((0L, Array.fill(100)(7f))).toDF("id", "img")
      .select(dHash56($"img")).head().getLong(0)
    assert(short === ref(Array.fill(100)(7f) ++ Array.fill(924)(0f)))
  }
}
