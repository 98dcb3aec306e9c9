package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** scale/Bloom + the sketch-gated decontamination variant. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  test("bloom membership has no false negatives and bounded false positives") {
    import spark.implicits._
    val members = (0L until 2000L).map(_ * 7919L)
    val df = members.toDF("h")
    val bf = graft.scale.Bloom.build(df, "h", members.size.toLong, 0.01)
    // every member passes (Bloom's hard guarantee)
    val misses = df.filter(!graft.scale.Bloom.mightContain(bf, col("h"))).count()
    assert(misses == 0L, s"$misses false negatives")
    // non-members mostly rejected: observed fpp within ~5x of the target
    val nonMembers = (0L until 10000L).map(_ * 7919L + 1L).toDF("h")
    val fp = nonMembers.filter(graft.scale.Bloom.mightContain(bf, col("h"))).count()
    assert(fp < 500L, s"observed fpp ${fp / 10000.0} far above the 1% target")
  }

  test("bloom-gated decontamination equals the exact-broadcast path") {
    val exact = graft.analytics.ScaleQueries.decontaminate(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val bloom = graft.analytics.ScaleQueries.decontaminateBloom(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(bloom == exact)
    assert(exact.nonEmpty)
  }

  test("the sketch gate sits at the scan side, before the verify join") {
    val plan = graft.analytics.ScaleQueries.decontaminateBloom(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom gate must appear in the optimized plan")
    // the gate must be a Filter below the join, not a post-join predicate
    val joinIdx = plan.indexOf("Join")
    val gateIdx = plan.indexOf("might_contain")
    assert(joinIdx >= 0 && gateIdx > joinIdx,
      "might_contain filter should sit under (after, in tree print order) the join")
  }
}
