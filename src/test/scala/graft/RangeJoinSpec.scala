package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.RangeJoin

/** Bucketed range join must produce exactly the naive inequality join's
  * pair set (no duplicates from the 2× candidate fan-out, no misses at
  * bucket boundaries) and never plan a nested loop.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"
  val DayMicros = 24L * 3600 * 1000000

  private def parts = {
    val ev = Tables.events(spark, sf)
    (ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"), col("value").as("c_value")))
  }

  test("bucketed pairs equal the naive inequality join") {
    val (p, c) = parts
    val bucketed = RangeJoin.rangeJoin(p, c, Seq("user_id"), col("ts"), col("c_ts"), DayMicros)
      .select("event_id", "c_ts")
    val naive = p.join(c, Seq("user_id"))
      .filter(unix_micros(col("c_ts")) >= unix_micros(col("ts")) - lit(DayMicros) &&
        col("c_ts") < col("ts"))
      .select("event_id", "c_ts")
    assert(bucketed.count() == naive.count())
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
  }

  test("plan is an equi-join, not a nested loop") {
    val (p, c) = parts
    val joined = RangeJoin.rangeJoin(p, c, Seq("user_id"), col("ts"), col("c_ts"), DayMicros)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
  }
}
