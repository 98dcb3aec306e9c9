package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composed pipeline (SURVEY §3 traces 1–3 in one run). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  lazy val out = Pipeline.run(spark, sf)

  test("all final tables materialize with rows") {
    val counts = out.map { case (k, df) => k -> df.count() }
    assert(counts.values.forall(_ > 0), s"empty tables: ${counts.filter(_._2 == 0)}")
    // leads dedup to one row per lead_id
    assert(out("marketo_leads").count() ==
      out("marketo_leads").select("lead_id").distinct().count())
    // one turn per (session, turn)
    assert(out("agent_turns").count() ==
      out("agent_turns").select("session_id", "turn_id").distinct().count())
  }

  test("session KPIs are consistent with agent turns") {
    val turns = out("agent_turns")
    val kpis = out("session_kpis")
    assert(kpis.agg(sum("total_turns")).head().getLong(0) == turns.count())
    // per-session token totals match a direct aggregate
    val direct = turns.groupBy("session_id")
      .agg(sum(col("performance_metrics.tokens_out")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaKpis = kpis.select("session_id", "total_tokens_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == viaKpis)
  }

  test("lead scores and daily metrics are deterministic across runs") {
    val again = Pipeline.run(spark, sf)
    val a = out("daily_lead_metrics").collect().map(_.toString).sorted
    val b = again("daily_lead_metrics").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
