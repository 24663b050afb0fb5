package graft.ops

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Image-file source family — SURVEY.md §2.1 S2–S4 and §2.12 (scalar
  * UDF), the reference's load path re-expressed as one lazy distributed
  * plan.
  *
  * Reference: directory listing per class (/root/reference/main.py:95-101),
  * PIL open + 2 px pad + ravel (`to_array`, main.py:128-142), balanced
  * per-class sample + joblib-parallel decode + driver vstack
  * (main.py:144-171). Here: `binaryFile` scan (distributed listing, no
  * driver staging) → label from the parent directory → ImageIO decode
  * UDF (the one place a UDF is justified: binary image decode has no
  * Catalyst expression) → exact-k balancing via the window sampler.
  *
  * This is also the multimodal-column pattern (L4): the scan carries
  * `content: binary` + typed metadata (path, length, label) in one
  * schema, and the decode step maps binary → Array[Float] features.
  *
  * 100 TB posture: binaryFile splits listing across the cluster; decode
  * runs task-parallel next to the bytes; the only shuffle is the
  * balancing window.
  */
object Images {

  val side = 32
  val dim: Int = side * side // 1,024, like the reference (main.py:123-124)

  /** Decode any ImageIO-supported format (PNG/BMP/GIF/JPEG — all in the
    * JDK) to a 32×32 grayscale float vector: images smaller than 32×32
    * are centered with a black border (the reference pads 28×28 by 2 px,
    * main.py:139-142); anything else is scaled to fit.
    */
  def decodeToVector(bytes: Array[Byte]): Array[Float] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes")
    val canvas = new BufferedImage(side, side, BufferedImage.TYPE_BYTE_GRAY)
    val g = canvas.createGraphics()
    try {
      if (img.getWidth <= side && img.getHeight <= side) {
        g.drawImage(img, (side - img.getWidth) / 2, (side - img.getHeight) / 2, null)
      } else {
        g.drawImage(img, 0, 0, side, side, null)
      }
    } finally g.dispose()
    val out = new Array[Float](dim)
    val raster = canvas.getRaster
    var i = 0
    while (i < dim) {
      out(i) = raster.getSample(i % side, i / side, 0).toFloat
      i += 1
    }
    out
  }

  private val decodeUdf = udf(decodeToVector _)

  /** S2 — recursive binary scan of a class-per-directory image tree;
    * label = parent directory name (the reference's dir-name labeling,
    * main.py:95-101,168).
    */
  def scan(spark: SparkSession, root: String): DataFrame = {
    spark.read.format("binaryFile")
      // every format the ImageIO decode path accepts — a png-only glob
      // would silently skip jpeg/bmp/gif members and under-count their
      // classes in the balanced load
      .option("pathGlobFilter", "*.{png,jpg,jpeg,bmp,gif}")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(
        element_at(split(col("path"), "/"), -2).as("label"),
        col("path"), col("length"), col("content"))
  }

  /** S3 — scan + decode: binary → 1,024-float feature vector alongside
    * the multimodal metadata columns.
    */
  def decoded(spark: SparkSession, root: String): DataFrame =
    scan(spark, root).withColumn("features", decodeUdf(col("content")))

  /** S4 — the reference's balanced load (main.py:144-171): decode
    * everything lazily, then keep exactly min-class-count rows per class.
    */
  def loadBalanced(spark: SparkSession, root: String, seed: Long = 42L): DataFrame =
    graft.util.Sampling.balanceToMinClass(decoded(spark, root), "label", seed)
}
