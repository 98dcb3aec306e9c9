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
  * shape — is real and tested. The codec itself is STUBBED: this
  * environment ships no image/audio libraries, so `decodeStub` derives a
  * deterministic fake feature vector from the bytes. Swapping in a real
  * decoder changes ONLY the body of `decodeStub`/`resizeStub`: every
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
        // per-partition: a real impl opens the codec/session here once
        it.map(a => MediaFeatures(a.assetId, a.kind, FeatureDim, decodeStub(a.media)))
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
        Frame(a.assetId, idx, resizeStub(a.media, 64, 64))
      }
    }
  }

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
