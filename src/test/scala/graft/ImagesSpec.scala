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
}
