package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed end-to-end pipeline — SURVEY §3's three traces as one
  * batch run. A user of the reference system maps onto this as:
  *
  *   Marketo CSV/REST feed      → MarketoTransform   → marketo_leads (D1)
  *   frontend event stream      → FrontendTransform  → frontend_analytics (D4)
  *   agent-turn stream          → TextAgentTransform → agent_turns (D2)
  *                              → session_kpis (A1), daily_lead_metrics (A2),
  *                                dashboard (A5), journey (A6), funnel (A7)
  *
  * Feeds are synthesized deterministically from the testdata tables (the
  * same derivations the oracle queries use); in production each `raw*`
  * DataFrame is a spark.read / readStream of the real feed with the same
  * columns — every downstream stage is shared between batch and
  * streaming.
  */
object Pipeline {

  val AsOfMs = 1706659200000L // 2024-01-31T00:00:00Z

  /** Raw lead feed synthesized from `customer`. */
  def rawLeads(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("id"),
      concat(regexp_replace(lower(col("c_name")), "#", "."), lit("@acme-corp.com")).as("email"),
      concat(lit("First"), col("c_custkey").cast("string")).as("firstName"),
      concat(lit("Last"), col("c_custkey").cast("string")).as("lastName"),
      lit("Acme").as("company"), lit(null).cast("string").as("title"),
      lpad((col("c_custkey") * 7 % 10000000000L).cast("string"), 10, "0").as("phone"),
      col("c_mktsegment").as("leadSource"),
      lit("Organic").as("originalSourceType"), lit("New").as("leadStatus"),
      lit("2024-01-15T10:30:00Z").as("createdAt"),
      lit("2024-01-20T14:22:00Z").as("updatedAt"),
      lit("US").as("country"), lit("CA").as("state"), lit("SF").as("city"),
      lit("94105").as("postalCode"))

  /** Raw frontend events synthesized from `events`. */
  def rawFrontendEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_type"),
      unix_millis(col("ts")).as("timestamp"),
      concat(lit("sess_"), col("user_id").cast("string")).as("session_id"),
      concat(lit("user_"), col("user_id").cast("string")).as("user_id"),
      lit("click").as("interaction_type"), lit("w1").as("widget_id"),
      concat(lit("https://shop.example.com/product/p"), col("event_id") % 10).as("page_url"),
      lit("Product").as("page_title"),
      lit("https://google.com/search?q=x").as("referrer"),
      lit("Mozilla/5.0 (Windows NT 10.0) Chrome/120.0").as("user_agent"),
      lit("1920x1080").as("screen_resolution"), lit("1200x800").as("viewport_size"),
      floor(col("value")).cast("long").as("time_on_page"),
      col("event_id"))

  /** Raw agent turns synthesized from `events`. */
  def rawAgentTurns(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("sess_"), col("user_id").cast("string")).as("session_id"),
      concat(lit("turn_"), col("event_id").cast("string")).as("turn_id"),
      concat(lit("user_"), col("user_id").cast("string")).as("user_id"),
      lit("web_chat").as("channel"),
      unix_millis(col("ts")).as("timestamp"),
      lit("claude-3-sonnet").as("model"),
      (get_json_object(col("props"), "$.k").cast("int") + 1).as("tokens_in"),
      floor(col("value") * 2).cast("int").as("tokens_out"),
      (col("value") * 10).as("latency_ms"),
      concat(lit("I recommend this product solution, here are steps to help "),
        col("event_id").cast("string")).as("response_text"),
      array(lit("web_search")).as("tools_used"),
      map(lit("web_search"), struct(lit(true).as("success"))).as("tool_results"),
      col("ts"))

  /** Full batch run: returns every final table keyed by its reference
    * name. One action per output; shared scans are read once per branch
    * (Spark caches parquet footers; at scale, persist the enriched
    * DataFrames if several outputs consume them).
    */
  def run(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    // Trace 1: leads — validate, enrich, upsert last-write-wins on lead_id
    val leads = stages.MarketoTransform.enrich(rawLeads(spark, dir), AsOfMs)
    val marketoLeads = stages.Upsert.lastWriteWins(
      leads, Seq("lead_id"), Seq(col("updated_at").desc))

    // Trace 2: frontend events — enrich, D4 insert-only dedup on the
    // natural event identity (the enriched record drops the transport id)
    val fe = stages.FrontendTransform.enrich(rawFrontendEvents(spark, dir), AsOfMs)
    val frontendAnalytics = stages.Upsert.uniqueKey(
      fe, Seq("session_id", "timestamp", "event_type"))

    // Trace 3: agent turns — enrich, composite-key upsert, session KPIs
    val turns = stages.TextAgentTransform.enrich(rawAgentTurns(spark, dir), AsOfMs)
    val agentTurns = stages.Upsert.lastWriteWins(
      turns, Seq("session_id", "turn_id"), Seq(col("timestamp").desc))

    val sessionKpis = agentTurns.groupBy(col("session_id"), col("user_id"), col("channel"))
      .agg(count(lit(1)).as("total_turns"),
        sum(col("performance_metrics.tokens_in")).as("total_tokens_in"),
        sum(col("performance_metrics.tokens_out")).as("total_tokens_out"),
        Num.savg(sum(col("performance_metrics.latency_ms")),
          count(lit(1)), 2, 2).as("avg_latency_ms"),
        Num.savg(sum(col("quality_metrics.overall_quality_score")),
          count(lit(1)), 1, 2).as("avg_quality"),
        Num.r(sum(col("business_metrics.estimated_cost_usd")), 6).as("total_cost_usd"),
        min(col("timestamp")).as("started_at_ms"),
        max(col("timestamp")).as("ended_at_ms"))

    val dailyLeadMetrics = marketoLeads
      .groupBy(to_date(timestamp_millis(col("created_at"))).as("date"))
      .agg(count(lit(1)).as("total_leads"),
        Num.savg(sum(col("lead_quality_score")), count(lit(1)), 0, 2).as("avg_quality_score"))

    Map(
      "marketo_leads" -> marketoLeads,
      "frontend_analytics" -> frontendAnalytics,
      "agent_turns" -> agentTurns,
      "session_kpis" -> sessionKpis,
      "daily_lead_metrics" -> dailyLeadMetrics,
      "journey" -> analytics.Events.journey(spark, dir),
      "funnel" -> analytics.Events.funnel(spark, dir),
      "dashboard" -> analytics.Events.dashboard(spark, dir))
  }
}
