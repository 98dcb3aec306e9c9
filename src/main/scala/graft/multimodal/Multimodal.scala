package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: media as
  * opaque `binary` columns plus typed metadata, with per-partition decode
  * / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schemas, partition-parallel batch iteration
  * (mapPartitions over typed rows, the JVM analog of arrow-batched
  * mapInPandas), repartitioning for decode parallelism, frame explosion
  * shape — is real and tested. The IMAGE codec is real too: pure-JDK
  * `javax.imageio` decodes PNG/GIF/BMP/JPEG payloads to actual pixel
  * features (grid mean-luma) and resizes through an AWT raster — no
  * external library needed. Audio/video payloads still fall back to the
  * deterministic byte-hash stub (`decodeStub`) since the JDK ships no
  * such codecs; swapping one in changes ONLY the fallback body — every
  * signature, schema and partitioning contract stays.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRateHz: Int,
      durationMs: Long, format: String)

  case class MediaAsset(assetId: Long, kind: String, media: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(assetId: Long, kind: String, dim: Int, features: Array[Float])

  case class Frame(assetId: Long, frameIdx: Int, frame: Array[Byte])

  val FeatureDim = 16

  /** ==== STUB ==== deterministic fake decode: a real implementation
    * would decode the codec and run a feature extractor; this derives
    * FeatureDim floats from an FNV-1a rolling hash of the payload so the
    * pipeline shape (bytes → fixed-dim float vector) is faithful and
    * reproducible.
    */
  def decodeStub(media: Array[Byte]): Array[Float] = {
    var h = graft.scale.SimHash64.FnvOffset
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < media.length) {
      h ^= media(i)
      h *= graft.scale.SimHash64.FnvPrime
      out(i % FeatureDim) += ((h >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  /** ==== STUB ==== resize: real impl re-encodes at (w, h); the stub
    * tags the payload and rewrites metadata, preserving the contract
    * that output bytes differ and meta reflects the target size.
    */
  def resizeStub(media: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val tag = s"resized:${w}x$h:".getBytes("UTF-8")
    tag ++ media.take(64)
  }

  /** Cheap container sniff so the hot path only pays an ImageIO attempt
    * on payloads that can possibly be images (PNG/JPEG/GIF/BMP magics).
    */
  def looksLikeImage(media: Array[Byte]): Boolean =
    media.length >= 4 && (
      (media(0) == 0x89.toByte && media(1) == 'P' && media(2) == 'N' && media(3) == 'G') ||
      (media(0) == 0xFF.toByte && media(1) == 0xD8.toByte) || // JPEG SOI
      (media(0) == 'G' && media(1) == 'I' && media(2) == 'F') ||
      (media(0) == 'B' && media(1) == 'M'))

  /** REAL image decode (pure-JDK javax.imageio): pixels → the classic
    * thumbnail feature, mean luma (BT.601) over a 4×4 grid = FeatureDim
    * floats in [0,1]. None when the payload isn't a decodable image —
    * callers fall back to the byte-hash stub, so non-image media keeps
    * the documented deterministic behavior.
    */
  def decodeImage(media: Array[Byte]): Option[Array[Float]] = {
    if (!looksLikeImage(media)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      catch { case _: Exception => null }
    Option(img).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val grid = math.sqrt(FeatureDim.toDouble).toInt // 4: FeatureDim = grid²
      val sums = new Array[Double](FeatureDim)
      val counts = new Array[Long](FeatureDim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xFF) * 0.299 + ((rgb >> 8) & 0xFF) * 0.587 +
            (rgb & 0xFF) * 0.114) / 255.0
          val cell = y * grid / h * grid + x * grid / w
          sums(cell) += lum
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(FeatureDim)(i =>
        if (counts(i) == 0L) 0f else (sums(i) / counts(i)).toFloat)
    }
  }

  /** REAL image resize: AWT raster scale + PNG re-encode. None on
    * non-image payloads (fallback: resizeStub).
    */
  def resizeImage(media: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    if (!looksLikeImage(media)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(media))
      catch { case _: Exception => null }
    Option(img).map { im =>
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(im.getScaledInstance(w, h, java.awt.Image.SCALE_SMOOTH), 0, 0, null)
      finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Codec dispatch: real pixel decode for image containers, the
    * deterministic byte-hash stub for everything else.
    */
  def decode(media: Array[Byte]): Array[Float] =
    decodeImage(media).getOrElse(decodeStub(media))

  def resize(media: Array[Byte], w: Int, h: Int): Array[Byte] =
    resizeImage(media, w, h).getOrElse(resizeStub(media, w, h))

  /** Feature extraction as a partition-wise operator: one iterator pass
    * per partition (no per-row task dispatch), preceded by an explicit
    * repartition on the asset key so decode parallelism is independent of
    * the upstream file layout — the exact shape a real (native-lib)
    * decoder needs, since codec handles are per-partition resources.
    */
  def extractFeatures(assets: Dataset[MediaAsset], parallelism: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets
      .repartition(parallelism, col("assetId"))
      .mapPartitions { it =>
        // per-partition: a heavier codec would open its session here once
        it.map(a => MediaFeatures(a.assetId, a.kind, FeatureDim, decode(a.media)))
      }
  }

  /** Frame sampling: video asset → every-nth frame rows (explode shape).
    * Frame count derives from duration at a nominal 25 fps; frame bytes
    * are stub slices.
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyNth: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    assets.filter(col("kind") === "video").flatMap { a =>
      val nFrames = (a.meta.durationMs / 40L).toInt // 25 fps
      (0 until nFrames by everyNth).map { idx =>
        Frame(a.assetId, idx, resize(a.media, 64, 64))
      }
    }
  }

  /** Perceptual hash over the decoded feature vector (aHash): bit i set
    * iff feature i exceeds the vector's mean — 16 bits for the 4×4 luma
    * grid. Hamming distance between phashes tracks visual difference;
    * identical payloads hash identically through either codec path.
    */
  def phash(features: Array[Float]): Int = {
    var s = 0.0
    var i = 0
    while (i < features.length) { s += features(i); i += 1 }
    val mean = s / features.length
    var h = 0
    i = 0
    while (i < features.length) {
      if (features(i) > mean) h |= (1 << i)
      i += 1
    }
    h
  }

  /** Number of 4-bit phash bands: hamming ≤ 3 pigeonholes into ≥1
    * intact band, so banded buckets are a recall-guaranteed candidate
    * generator at radius 3 (the SimHash banding argument). */
  val PhashBands = 4

  def phashBand(ph: Int, b: Int): Int = (ph >> (4 * b)) & 0xF

  /** Perceptual near-dup CONTRACT report over the asset corpus: decode
    * (real codec for images, deterministic stub otherwise) → 16-bit
    * aHash → exact-phash clusters plus banded candidate-pair volume.
    * Decode runs partition-parallel ONCE per asset (the phash relation
    * is checkpointed — clusters and bands both consume it; the branch
    * duplication previously ran the codec pass twice) and everything
    * after it shuffles 20-byte rows.
    *
    * Published row (the sketch-tier contract-oracle pattern, VERDICT
    * r12 #8): the SQL-exact payload ground truth — asset count,
    * distinct payloads, exact-dup assets — plus in-engine booleans the
    * DuckDB oracle asserts as TRUE literals. Identical payload bytes
    * decode to identical features (decode is a pure function of the
    * payload), hence identical phash, so:
    *   - phash clusters can only MERGE payload groups:
    *     1 ≤ n_phash_clusters ≤ min(n_distinct_payloads, 2¹⁶);
    *   - every exact-dup asset sits in a >1 phash cluster:
    *     phash dup assets ≥ exact dup assets;
    *   - a phash-identical pair agrees in all PhashBands bands:
    *     band candidate pairs ≥ PhashBands · exact dup pairs.
    * The codec-dependent magnitudes live inside the booleans, so the
    * whole row is hash-checked; MultimodalSpec keeps the constructed-PNG
    * hamming/banding pins and the exact-recall assertion.
    */
  def imageNeardup(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val s = spark
    val hashed = extractFeatures(syntheticAssets(spark, dir), parallelism = 32)
      .map(f => (f.assetId, phash(f.features)))
      .toDF("asset_id", "ph")
      .localCheckpoint()
    val clusters = hashed.groupBy(col("ph"))
      .agg(count(lit(1)).as("n"), min(col("asset_id")).as("keeper"))
    val bands = hashed.select(col("asset_id"), explode(array(
      (0 until PhashBands).map(b =>
        struct(lit(b).as("b"),
          shiftright(col("ph"), 4 * b).bitwiseAND(lit(15)).as("bits"))): _*)).as("bb"))
    val bandPairs = bands.groupBy(col("bb.b"), col("bb.bits"))
      .agg(count(lit(1)).as("bn"))
      .agg(coalesce(sum(expr("bn * (bn - 1) div 2")), lit(0L))
        .as("band_pairs"))
    val ph = clusters.agg(
      coalesce(sum(col("n")), lit(0L)).as("n_assets"),
      count(lit(1)).as("n_phash_clusters"),
      coalesce(sum(when(col("n") > 1, col("n")).otherwise(0L)), lit(0L))
        .as("ph_dup_assets"))
      .crossJoin(bandPairs)
    // exact payload ground truth — SQL-expressible on the same base
    // table (payload bytes ARE the document text by construction)
    val exact = graft.Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_distinct_payloads"),
        coalesce(sum(when(col("n") > 1, col("n")).otherwise(0L)), lit(0L))
          .as("n_exact_dup_assets"),
        coalesce(sum(expr("n * (n - 1) div 2")), lit(0L))
          .as("n_exact_dup_pairs"))
    ph.crossJoin(exact).select(
      col("n_assets"), col("n_distinct_payloads"), col("n_exact_dup_assets"),
      (col("n_phash_clusters") >= least(col("n_distinct_payloads"), lit(1L)) &&
        col("n_phash_clusters") <= least(col("n_distinct_payloads"), lit(65536L)))
        .as("clusters_within_payload_bound"),
      (col("ph_dup_assets") >= col("n_exact_dup_assets")).as("dups_cover_exact"),
      (col("band_pairs") >= lit(PhashBands.toLong) * col("n_exact_dup_pairs"))
        .as("bands_cover_exact_pairs"))
  }

  /** DuckDB side of the [[imageNeardup]] contract: the exact payload
    * columns computed from `documents`, the codec-dependent booleans
    * asserted as TRUE literals.
    */
  val imageNeardupSql: String =
    s"""WITH g AS (SELECT md5(text) AS h, count(*) AS n
       |           FROM documents GROUP BY 1)
       |SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n_assets,
       |       CAST(count(*) AS BIGINT) AS n_distinct_payloads,
       |       CAST(coalesce(sum(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS BIGINT)
       |         AS n_exact_dup_assets,
       |       TRUE AS clusters_within_payload_bound,
       |       TRUE AS dups_cover_exact,
       |       TRUE AS bands_cover_exact_pairs
       |FROM g""".stripMargin

  /** Deterministic media corpus synthesized from `documents`: payload =
    * UTF-8 text bytes, kind/meta derived from doc_id — the sf-scaled
    * stand-in for a real asset table (TESTDATA has no binary table).
    */
  def syntheticAssets(spark: SparkSession, dir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(
        col("doc_id").as("assetId"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("media"),
        struct(
          (col("doc_id") % 640 + 64).cast("int").as("width"),
          (col("doc_id") % 480 + 48).cast("int").as("height"),
          lit(16000).cast("int").as("sampleRateHz"),
          (col("n_chars") * 10).cast("long").as("durationMs"),
          element_at(typedLit(Seq("png", "wav", "mp4")),
            (col("doc_id") % 3 + 1).cast("int")).as("format")).as("meta"))
      .as[MediaAsset]
  }
}
