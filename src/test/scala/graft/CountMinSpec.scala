package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.scale.{CMSBuffer, CountMin}

/** Count-Min sketch guarantees: one-sided error, mass conservation,
  * mergeability, codegen'd probe consistency, and the gated
  * heavy-hitter query's equality with the exact threshold relation.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  private val keys: Seq[Long] =
    (0L until 500L).flatMap(i => Seq.fill((i % 13 + 1).toInt)(i % 47))

  test("estimate never undercounts and conserves mass per hash row") {
    val buf = new CMSBuffer(4, 256)
    keys.foreach(buf.add)
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) =>
      assert(buf.estimate(k) >= n, s"undercount on $k")
    }
    // each hash row distributes every increment exactly once
    (0 until 4).foreach { i =>
      val rowMass = (0 until 256).map(j => buf.counts(i * 256 + j)).sum
      assert(rowMass == keys.size.toLong)
    }
  }

  test("merging partial sketches equals one sketch over the union") {
    val (a, b, whole) = (new CMSBuffer(4, 256), new CMSBuffer(4, 256), new CMSBuffer(4, 256))
    val (left, right) = keys.splitAt(keys.size / 2)
    left.foreach(a.add); right.foreach(b.add); keys.foreach(whole.add)
    a.mergeFrom(b)
    assert(a.counts.toSeq == whole.counts.toSeq)
  }

  test("overcount stays within 2n/width on the skewed event key") {
    import spark.implicits._
    val ks = Tables.events(spark, sf)
      .select((col("event_id") % (lit(1) + col("event_id") % 8)).as("k"))
      .as[Long].collect()
    val buf = new CMSBuffer(4, 2048)
    ks.foreach(buf.add)
    val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = 2L * ks.length / 2048 + 1
    exact.foreach { case (k, n) =>
      val est = buf.estimate(k)
      assert(est >= n && est - n <= bound, s"key $k est=$est exact=$n")
    }
  }

  test("codegen'd probe matches the buffer estimate") {
    import spark.implicits._
    val sample = keys.distinct.take(20)
    val buf = new CMSBuffer(4, 256)
    keys.foreach(buf.add)
    val got = sample.toDF("k")
      .select(col("k"), CountMin.estimate(buf.toBytes, col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach(k => assert(got(k) == buf.estimate(k)))
  }

  test("CMS-gated heavy hitters equal the exact threshold query") {
    val gated = analytics.ScaleQueries.heavyHittersCms(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = analytics.ScaleQueries.HHVerifyK
    val ev = Tables.events(spark, sf)
      .select((col("event_id") % (lit(1) + col("event_id") % 8)).as("k"))
    val n = ev.count()
    val exact = ev.groupBy("k").agg(count(lit(1)).as("c"))
      .filter(col("c") * (k + 1) > n)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gated == exact)
    assert(exact.nonEmpty)
  }
}
