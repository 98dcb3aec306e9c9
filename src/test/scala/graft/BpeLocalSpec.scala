package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.BpeTrain

/** The driver-side BPE trainer (one corpus job + local merge loop) must be
  * merge-for-merge identical to the distributed reference loop, and its
  * Spark job count must not grow with the merge count — the property that
  * makes a 30k-merge vocabulary trainable (the distributed loop pays two
  * driver barriers per merge).
  */
class BpeLocalSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  test("local trainer equals the distributed merge loop (merges and vocab)") {
    val docs = Tables.documents(spark, sf)
    val (distMerges, distWf) = BpeTrain.trainWithVocab(docs, 5)
    val (localMerges, localVocab) = BpeTrain.trainLocal(docs, 5)
    assert(localMerges == distMerges)
    val distVocab = distWf.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    distWf.unpersist(blocking = false)
    assert(localVocab.view.mapValues(_.toList).toMap == distVocab)
  }

  test("m=60 trains in one corpus pass: job count independent of m") {
    val docs = Tables.documents(spark, sf)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val t0 = System.nanoTime()
      val (merges, _) = BpeTrain.trainLocal(docs, 60)
      val secs = (System.nanoTime() - t0) / 1e9
      assert(merges.size == 60)
      assert(merges.map(_._1) == (1 to 60))
      // merge counts are non-increasing in a greedy argmax loop over a
      // fixed corpus only per-pair, not globally — but every count is > 0
      assert(merges.forall(_._3 > 0))
      Thread.sleep(500) // let queued listener events drain
      // one collect over the type table (AQE may split it into a few
      // stages/jobs); the bound is a small constant, NOT 2m
      assert(jobs.get() <= 6, s"expected O(1) jobs, got ${jobs.get()}")
      assert(secs < 60.0, s"local training took $secs s")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
