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

  /** L4+L2 — PERCEPTUAL image dedup (the LAION-style near-dup gate on
    * the reference's own modality, main.py:128-142): every image gets
    * a 56-bit difference hash ([[graft.expressions.DHash56]] over the
    * decoded 32×32 vector — invariant under re-encoding and global
    * brightness shift, O(1) bits flipped by small local edits), then
    * near-dups meet through a BANDED Hamming join (4 × 14-bit bands —
    * two hashes within Hamming ≤ 3 agree on ≥ 1 band by pigeonhole,
    * the q38 SimHash discipline), verify with one popcount, and
    * collapse via [[Similarity.connectedComponents]] to a min-id
    * survivor per cluster.
    *
    * Returns one row per image: (img_id, phash, cluster_id,
    * is_survivor) — byte-identical copies and perceptual variants
    * share a cluster; the smallest id ships.
    *
    * 100 TB posture: hashing is a fused map stage next to the decode
    * (no shuffle); the band self-join moves 8-byte (band, key, hash)
    * triples and its cost is Σ_bucket df² with buckets split 4 ways
    * AND df ≤ `bandDfCap` — band buckets over the cap are DROPPED
    * before the self-join (the q39 stop-shingle / [[Multimodal
    * .videoNearDup]] dfCap posture: solid-color frames, letterhead
    * templates, and app-screenshot chrome are the image analogue of
    * boilerplate shingles, and one such hot (band, key) bucket makes
    * the join quadratic at LAION scale). Recall trade of the cap: a
    * pair within `maxHamming` is still found through ANY of its
    * agreeing bands that stays under the cap, so only pairs whose
    * every agreeing band is boilerplate-hot are missed — and those
    * are near-identical template images an EXACT byte/hash dedup
    * upstream already collapses (dHash-identical copies share all 4
    * bands). The popcount kills false candidates before CC, whose
    * shuffles carry only matched pairs.
    */
  def perceptualDedup(imgs: DataFrame, idCol: String = "img_id",
      vecCol: String = "img", maxHamming: Int = 3,
      bandDfCap: Int = 1000): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftColumns.{checkpointRdd, dHash56}
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x14-bit banding guarantees recall only for hamming <= 3: $maxHamming")
    require(bandDfCap >= 2, s"bandDfCap must be >= 2: $bandDfCap")
    val hashed = imgs
      .select(col(idCol).cast("long").as("img_id"),
        dHash56(col(vecCol)).as("phash"))
      .localCheckpoint(true)
    val banded = dropHotBands(bandExplode(hashed, "img_id", "phash"), bandDfCap)
    val x = banded.as("x")
    val y = banded.as("y")
    val pairs = x.join(y,
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.img_id") < col("y.img_id"))
      .filter(bit_count(col("x.phash").bitwiseXOR(col("y.phash"))) <= maxHamming)
      .select(col("x.img_id").as("a"), col("y.img_id").as("b"))
      .dropDuplicates("a", "b")
    val cl = Similarity.connectedComponents(pairs, "a", "b")
      .withColumnRenamed("doc_id", "img_id")
    val out = hashed.join(cl, Seq("img_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("img_id")))
      .withColumn("is_survivor", col("img_id") === col("cluster_id"))
      .localCheckpoint(true)
    // release the checkpoint's pinned RDD blocks directly — Dataset
    // .unpersist is a CacheManager call and does not see localCheckpoint
    // storage, which otherwise waits on the ContextCleaner
    checkpointRdd(hashed).foreach(_.unpersist(false))
    out
  }

  /** 4 × 14-bit band explode of a 56-bit hash column: one (band, key)
    * row per band, carrying the id and full hash for the popcount
    * verify.
    */
  private def bandExplode(df: DataFrame, id: String, h: String): DataFrame =
    df.select(col(id), col(h),
      posexplode(array((0 until 4).map(b =>
        shiftright(col(h), b * 14).bitwiseAND(lit(0x3FFFL))): _*))
        .as(Seq("band", "key")))

  /** Drop (band, key) buckets whose posting list exceeds `cap` — the
    * boilerplate guard shared by both banded joins (see
    * [[perceptualDedup]]'s recall-trade note). One extra aggregate +
    * anti-join over 8-byte keys, linear in the band stream.
    */
  private def dropHotBands(banded: DataFrame, cap: Int): DataFrame =
    banded.join(
      banded.groupBy(col("band"), col("key"))
        .agg(count(lit(1)).as("df")).filter(col("df") > cap)
        .select(col("band"), col("key")),
      Seq("band", "key"), "left_anti")

  /** INCREMENTAL arm of [[perceptualDedup]] (the q157 delta-dedup
    * shape on the image modality): match a batch of NEW images against
    * a FROZEN survivor-hash index — [[perceptualDedup]]'s survivors,
    * persisted via [[CurationIndex.writePhash]] — so daily ingest
    * never re-clusters the accumulated corpus.
    *
    * Semantics: a new image whose hash sits within `maxHamming` of an
    * indexed survivor ADOPTS that survivor's cluster (smallest
    * matching survivor id; `matched_index` = true, never a survivor
    * itself); pure misses cluster AMONG THEMSELVES with the same
    * banding and min-id survivors — exactly the rows a subsequent
    * [[CurationIndex.writePhash]] appends to the index. Index hits
    * take precedence over new-new matches — the documented asymmetry
    * of every delta arm: transitive chains THROUGH an index hit are
    * genuinely missed until the periodic full re-cluster (a new image
    * within `maxHamming` of an index-hitting batchmate can itself sit
    * up to 2×`maxHamming` from the indexed survivor, miss the index,
    * and be appended as a fresh survivor).
    *
    * 100 TB posture: the probe is the q169 banded join against the
    * index — no re-hash and no re-join of the accumulated corpus;
    * shuffle volume is the NEW batch's bands plus the (survivor-only)
    * index bands; the miss self-join carries [[perceptualDedup]]'s
    * `bandDfCap` boilerplate guard.
    */
  def perceptualDedupDelta(newImgs: DataFrame, index: DataFrame,
      idCol: String = "img_id", vecCol: String = "img",
      maxHamming: Int = 3, bandDfCap: Int = 1000): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftColumns.{checkpointRdd, dHash56}
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x14-bit banding guarantees recall only for hamming <= 3: $maxHamming")
    require(bandDfCap >= 2, s"bandDfCap must be >= 2: $bandDfCap")
    val hashed = newImgs
      .select(col(idCol).cast("long").as("img_id"),
        dHash56(col(vecCol)).as("phash"))
      .localCheckpoint(true)
    val ib = bandExplode(index.select(col("img_id").as("idx_id"),
      col("phash").as("idx_hash")), "idx_id", "idx_hash")
    // hits feeds the anti-join, the final adoption join, and (through
    // the misses frame) both self-join sides plus the hot-bucket
    // aggregate — persist/freeze so the index probe join runs ONCE per
    // batch, not per reference (the assembleShippedCorpus discipline)
    val hits = bandExplode(hashed, "img_id", "phash")
      .join(ib, Seq("band", "key"))
      .filter(bit_count(col("phash").bitwiseXOR(col("idx_hash"))) <= maxHamming)
      .groupBy(col("img_id")).agg(min(col("idx_id")).as("idx_cluster"))
      .persist()
    val misses = hashed.join(hits, Seq("img_id"), "left_anti")
      .localCheckpoint(true)
    val missBanded = dropHotBands(
      bandExplode(misses, "img_id", "phash"), bandDfCap)
    val x = missBanded.as("x")
    val y = missBanded.as("y")
    val pairs = x.join(y,
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.img_id") < col("y.img_id"))
      .filter(bit_count(col("x.phash").bitwiseXOR(col("y.phash"))) <= maxHamming)
      .select(col("x.img_id").as("a"), col("y.img_id").as("b"))
      .dropDuplicates("a", "b")
    val cl = Similarity.connectedComponents(pairs, "a", "b")
      .withColumnRenamed("doc_id", "img_id")
      .withColumnRenamed("cluster_id", "self_cluster")
    val out = hashed
      .join(hits, Seq("img_id"), "left")
      .join(cl, Seq("img_id"), "left")
      .withColumn("matched_index", col("idx_cluster").isNotNull)
      .withColumn("cluster_id",
        coalesce(col("idx_cluster"), col("self_cluster"), col("img_id")))
      .withColumn("is_survivor",
        !col("matched_index") && col("img_id") === col("cluster_id"))
      .select(col("img_id"), col("phash"), col("cluster_id"),
        col("matched_index"), col("is_survivor"))
      .localCheckpoint(true)
    hits.unpersist(false)
    checkpointRdd(hashed).foreach(_.unpersist(false))
    checkpointRdd(misses).foreach(_.unpersist(false))
    out
  }

  /** q169's planted image corpus — deterministic 32×32 integer-pixel
    * images expression-only from `doc_id` so DuckDB re-derives every
    * pixel, block sum, and hash bit (the q27 bit-algebra precedent;
    * no codecs needed): one base image per doc; docs ≡ 0 (mod 7) add
    * a +40 BRIGHTNESS variant (dHash-identical — the re-encode/
    * levels-adjust duplicate); docs ≡ 0 (mod 11) add a LOCAL-EDIT
    * variant (+55 on the top-left 4×4 block — flips at most one hash
    * bit, the small-crop/watermark duplicate). Pixels stay in
    * [0, 255].
    */
  private[ops] def phashPlant(docs: DataFrame): DataFrame = {
    // the 1024-px lambdas are interpreted and `documents` is one small
    // parquet split — spread the plant across the session's cores (the
    // videoPlant lesson; shuffles only 8-byte ids, result layout-free)
    val ids = docs.select(col("doc_id"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    def pix(shift: Int, bump: Boolean) =
      transform(sequence(lit(0), lit(1023)), i => {
        val base = ((col("doc_id") * 31 + i) * (i + 7) % 4093) % 200
        val bumped =
          if (bump) when(i < 128 && i % 32 < 4, base + 55).otherwise(base)
          else base
        (bumped + lit(shift)).cast("float")
      })
    ids.select((col("doc_id") * 4).as("img_id"), pix(0, bump = false).as("img"))
      .unionByName(ids.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") * 4 + 1).as("img_id"),
          pix(40, bump = false).as("img")))
      .unionByName(ids.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") * 4 + 2).as("img_id"),
          pix(0, bump = true).as("img")))
  }

  /** ORACLED exercise (q169): [[perceptualDedup]] over the
    * [[phashPlant]]ed corpus — DuckDB re-derives every pixel, the 64
    * block sums, all 56 gradient bits, the banded candidate join, the
    * popcount verify, and the transitive closure; planted brightness
    * and local-edit variants collapse onto their base image, distinct
    * images survive.
    */
  def q169PhashDedup(spark: SparkSession, dir: String): DataFrame =
    perceptualDedup(phashPlant(Sources.documents(spark, dir)))
      .orderBy(col("img_id"))
}
