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
