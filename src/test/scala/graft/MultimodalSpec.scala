package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Multimodal plumbing tests: schema/partitioning/batch shape are real;
  * only the codec is stubbed (deterministic fake).
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  test("synthetic assets carry binary payload + typed metadata") {
    val assets = Multimodal.syntheticAssets(spark, sf)
    val r = assets.filter(col("assetId") === 1L).head()
    assert(r.kind == "audio")
    assert(new String(r.media, "UTF-8").nonEmpty)
    assert(r.meta.format == "wav")
    val kinds = assets.groupBy("kind").count().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("feature extraction is partition-parallel, fixed-dim, deterministic") {
    implicit val s = spark
    val assets = Multimodal.syntheticAssets(spark, sf)
    val feats = Multimodal.extractFeatures(assets, parallelism = 8)
    assert(feats.rdd.getNumPartitions == 8)
    val rows = feats.filter(col("assetId") < 3).collect().sortBy(_.assetId)
    assert(rows.forall(_.features.length == Multimodal.FeatureDim))
    // deterministic: recompute equals
    val again = Multimodal.extractFeatures(assets, 8)
      .filter(col("assetId") < 3).collect().sortBy(_.assetId)
    assert(rows.zip(again).forall { case (a, b) => a.features.sameElements(b.features) })
  }

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads decode to actual pixel features (javax.imageio)") {
    // 4×4 gray image, pixel (x,y) = gray (x + 4y)·17. With a 4×4 grid
    // each pixel is its own cell, and BT.601 luma of gray (v,v,v) is
    // exactly v/255 (the coefficients sum to 1), so every feature value
    // is known in closed form.
    val png = pngBytes(4, 4) { (x, y) =>
      val v = (x + 4 * y) * 17; (v << 16) | (v << 8) | v
    }
    assert(Multimodal.looksLikeImage(png))
    val feats = Multimodal.decodeImage(png).get
    assert(feats.length == Multimodal.FeatureDim)
    for (y <- 0 until 4; x <- 0 until 4) {
      val expected = ((x + 4 * y) * 17) / 255.0f
      assert(math.abs(feats(4 * y + x) - expected) < 1e-6f,
        s"cell ($x,$y): ${feats(4 * y + x)} vs $expected")
    }
    // dispatch: decode() must pick the pixel path for the PNG and the
    // byte-hash stub for non-image payloads
    assert(Multimodal.decode(png).sameElements(feats))
    val text = "not an image".getBytes("UTF-8")
    assert(!Multimodal.looksLikeImage(text))
    assert(Multimodal.decode(text).sameElements(Multimodal.decodeStub(text)))
  }

  test("real image resize re-encodes at target size") {
    val png = pngBytes(4, 4)((x, y) => if ((x + y) % 2 == 0) 0xFFFFFF else 0)
    val out = Multimodal.resize(png, 2, 2)
    assert(Multimodal.looksLikeImage(out))
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(im.getWidth == 2 && im.getHeight == 2)
  }

  test("extractFeatures routes image assets through the real codec") {
    implicit val s = spark
    import s.implicits._
    val png = pngBytes(4, 4)((_, _) => 0x808080)
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image", png,
        Multimodal.MediaMeta(4, 4, 0, 0L, "png")),
      Multimodal.MediaAsset(2L, "audio", Array[Byte](1, 2, 3),
        Multimodal.MediaMeta(0, 0, 16000, 10L, "wav"))).toDS()
    val feats = Multimodal.extractFeatures(assets, 2).collect().sortBy(_.assetId)
    assert(feats(0).features.sameElements(Multimodal.decodeImage(png).get))
    assert(feats(1).features.sameElements(
      Multimodal.decodeStub(Array[Byte](1, 2, 3))))
  }

  test("perceptual hash: identity, locality, and the band recall guarantee") {
    def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    // half-bright / half-dark: cells 0-7 below mean, 8-15 above
    val base = pngBytes(4, 4)((_, y) => if (y < 2) 0x202020 else 0xE0E0E0)
    val ph = Multimodal.phash(Multimodal.decodeImage(base).get)
    // identical payload → identical phash
    assert(ph == Multimodal.phash(Multimodal.decodeImage(base).get))
    // one flipped cell → small hamming, and ≥1 of the 4 bands intact
    // (hamming ≤ 3 pigeonholes into an unchanged 4-bit band)
    val tweaked = pngBytes(4, 4)((x, y) =>
      if (y < 2) { if (x == 0 && y == 0) 0xF0F0F0 else 0x202020 } else 0xE0E0E0)
    val ph2 = Multimodal.phash(Multimodal.decodeImage(tweaked).get)
    val d = hamming(ph, ph2)
    assert(d >= 1 && d <= 3, s"one-cell tweak moved $d bits")
    assert((0 until Multimodal.PhashBands).exists(b =>
      Multimodal.phashBand(ph, b) == Multimodal.phashBand(ph2, b)))
    // inverted image → large hamming (no false locality)
    val inv = pngBytes(4, 4)((_, y) => if (y < 2) 0xE0E0E0 else 0x202020)
    assert(hamming(ph, Multimodal.phash(Multimodal.decodeImage(inv).get)) >= 8)
  }

  test("image near-dup clusters recall every exact-duplicate payload pair") {
    implicit val s = spark
    import s.implicits._
    // exact text duplicates (the dedup tier's ground truth) must land in
    // one phash cluster: same bytes → same features → same hash
    val dupAssets = graft.scale.Dedup
      .exactDupGroups(Tables.documents(spark, sf), "text", "doc_id")
      .agg(coalesce(sum(col("n_copies")), lit(0L))).collect()(0).getLong(0)
    val report = Multimodal.imageNeardup(spark, sf).collect()(0)
    assert(report.getAs[Long]("n_assets") == Tables.documents(spark, sf).count())
    // the published exact-dup column must agree with the dedup tier's
    // ground truth, and every contract boolean must hold on real data
    assert(report.getAs[Long]("n_exact_dup_assets") == dupAssets)
    assert(report.getAs[Boolean]("clusters_within_payload_bound"))
    // every exact-dup asset is inside a phash cluster of size > 1
    assert(report.getAs[Boolean]("dups_cover_exact"))
    assert(report.getAs[Boolean]("bands_cover_exact_pairs"))
  }

  test("frame sampling explodes videos at the expected stride") {
    implicit val s = spark
    val assets = Multimodal.syntheticAssets(spark, sf)
    val frames = Multimodal.sampleFrames(assets, everyNth = 10)
    val perAsset = frames.groupBy("assetId").count()
    val joined = assets.filter(col("kind") === "video")
      .select(col("assetId"), (col("meta.durationMs") / 40).cast("long").as("nFrames"))
      .join(perAsset, "assetId")
    // ceil(nFrames / 10) frames per video
    val bad = joined.filter(col("count") =!= ceil(col("nFrames") / 10.0).cast("long")).count()
    assert(bad == 0)
    val f = frames.head()
    assert(new String(f.frame.take(8), "UTF-8").startsWith("resized:"))
  }
}
