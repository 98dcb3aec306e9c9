package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Num

/** Scoring functions (SURVEY.md §2.4 SC1–SC14) — the reference's "UDF
  * surface", all expressed as arithmetic when-chains so they stay inside
  * whole-stage codegen. All clamp to [0,100] exactly where the reference
  * clamps.
  *
  * Wall-clock inputs are replaced by explicit asOf columns (SURVEY §7
  * determinism rules).
  */
object Scoring {

  private def present(c: Column): Column = c.isNotNull && c =!= ""

  val FreemailDomains = Seq("gmail.com", "yahoo.com", "hotmail.com", "outlook.com")

  val LeadSourceScores: Map[String, Int] = Map(
    "referral" -> 25, "webinar" -> 20, "trade show" -> 20,
    "organic search" -> 15, "website" -> 15, "paid search" -> 10,
    "social media" -> 10, "email" -> 5)

  /** SC1 calculate_lead_score (marketo_transformer.py:143-193).
    *
    * Inputs are the RAW lead fields (the reference scores before
    * normalization). `asOfMs` replaces datetime.now(); recency uses
    * Python timedelta.days semantics = floor of the ms diff / 86400000.
    */
  def leadScore(email: Column, firstName: Column, lastName: Column,
      company: Column, title: Column, phone: Column,
      leadSource: Column, updatedAtMs: Column, asOfMs: Column): Column = {
    val domain = Normalize.emailDomain(email)
    val emailScore = when(!present(email), 0)
      .otherwise(when(domain.isNull, 0)
        .otherwise(when(domain.isInCollection(FreemailDomains), 5).otherwise(20)))
    val completeness = Seq(firstName, lastName, company, title, phone)
      .map(c => when(present(c), 10).otherwise(0)).reduce(_ + _)
    val sourceScore = coalesce(
      element_at(typedLit(LeadSourceScores), lower(coalesce(leadSource, lit("")))), lit(0))
    val days = floor((asOfMs - updatedAtMs) / lit(86400000.0))
    val recency = when(updatedAtMs.isNull, 0)
      .otherwise(when(days <= 1, 10).when(days <= 7, 5).otherwise(0))
    least(emailScore + completeness + sourceScore + recency, lit(100))
  }

  /** SC2 activity engagement score (marketo_transformer.py:278-297). */
  val ActivityEngagementScores: Map[Int, Int] = Map(
    2 -> 50, 104 -> 40, 22 -> 35, 110 -> 30, 113 -> 30,
    10 -> 20, 11 -> 25, 3 -> 15, 1 -> 10, 6 -> 5, 7 -> 5)
  def activityEngagementScore(activityTypeId: Column): Column =
    coalesce(element_at(typedLit(ActivityEngagementScores), activityTypeId.cast("int")), lit(5))

  /** SC3 frontend engagement score (frontend_transformer.py:371-398). */
  val EventScores: Map[String, Int] = Map(
    "purchase" -> 100, "form_submit" -> 80, "widget_open" -> 60,
    "message_sent" -> 70, "click" -> 20, "scroll" -> 10, "page_view" -> 15)
  def engagementScore(eventType: Column, timeOnPage: Column): Column = {
    val base = coalesce(element_at(typedLit(EventScores), eventType), lit(5))
    val t = coalesce(timeOnPage, lit(0))
    val bonus = when(t > 300, 20).when(t > 120, 10).when(t > 30, 5).otherwise(0)
    least(base + bonus, lit(100))
  }

  /** SC3 [spec-only] extended engagement score
    * (docs/TRANSFORM_LAYER_BENEFITS.md:113-124): the documented-but-
    * unimplemented scroll-depth and form-interaction bonuses layered on
    * the same base map; cap 100.
    */
  def engagementScoreExtended(eventType: Column, timeOnPage: Column,
      scrollDepth: Column, formInteraction: Column): Column = {
    val base = coalesce(element_at(typedLit(EventScores), eventType), lit(5))
    val bonus =
      when(coalesce(timeOnPage, lit(0)) > 300, 20).otherwise(0) +
        when(coalesce(scrollDepth, lit(0)) > 75, 15).otherwise(0) +
        when(coalesce(formInteraction, lit(false)), 25).otherwise(0)
    least(base + bonus, lit(100))
  }

  /** SC4 determine_user_segment (frontend_transformer.py:353-369). */
  def userSegment(pageUrl: Column, eventType: Column, referrer: Column): Column = {
    val u = lower(coalesce(pageUrl, lit("")))
    when(u.contains("checkout") || eventType === "purchase", "buyer")
      .when(eventType.isin("widget_open", "message_sent"), "engaged")
      .when(u.contains("product"), "browser")
      .when(referrer.isNull || referrer === "", "direct")
      .otherwise("visitor")
  }

  /** SC5 determine_conversion_stage (frontend_transformer.py:400-414). */
  def conversionStage(eventType: Column, pageUrl: Column): Column = {
    val u = lower(coalesce(pageUrl, lit("")))
    when(eventType === "purchase" || u.contains("thank-you"), "conversion")
      .when(u.contains("checkout") || u.contains("cart"), "purchase_intent")
      .when(eventType === "widget_open" || u.contains("contact"), "consideration")
      .when(u.contains("product"), "interest")
      .otherwise("awareness")
  }

  /** SC6 event quality score (frontend_transformer.py:416-430). */
  def eventQualityScore(sessionId: Column, userAgent: Column,
      pageUrl: Column, timestamp: Column): Column = {
    val missing = Seq(sessionId, userAgent, pageUrl, timestamp)
      .map(c => when(present(c.cast("string")), 0).otherwise(10)).reduce(_ + _)
    val bot = when(lower(coalesce(userAgent, lit(""))).contains("bot"), 50).otherwise(0)
    greatest(lit(100) - missing - bot, lit(0))
  }

  /** SC7 efficiency score — tokens/s bands (text_agent_transformer.py:159-179). */
  def efficiencyScore(tokensOut: Column, latencyMs: Column): Column = {
    val tps = tokensOut / (latencyMs / 1000.0)
    when(latencyMs.isNull || latencyMs <= 0, 0)
      .otherwise(when(tps > 50, 100).when(tps > 25, 80).when(tps > 10, 60)
        .when(tps > 5, 40).when(tps > 1, 20).otherwise(10))
  }

  /** SC8 completeness score (text_agent_transformer.py:344-365). */
  def completenessScore(t: Column): Column = {
    val u = lower(t)
    val s = lit(50.0) +
      when(length(t) > 100, 20).otherwise(0) +
      when(length(t) > 500, 10).otherwise(0) +
      when(t.contains("."), 10).otherwise(0) +
      when(t.contains("\n"), 5).otherwise(0) +
      when(u.contains("however") || u.contains("additionally") || u.contains("furthermore"), 5).otherwise(0)
    when(t.isNull || t === "", 0.0).otherwise(least(s, lit(100.0)))
  }

  /** SC9 relevance score (text_agent_transformer.py:367-385). */
  def relevanceScore(t: Column): Column = {
    val u = lower(t)
    val s = lit(70.0) +
      when(u.contains("sorry") && u.contains("help"), -20).otherwise(0) +
      when(u.contains("specifically") || u.contains("exactly") || u.contains("precisely"), 10).otherwise(0)
    when(t.isNull || t === "", 0.0).otherwise(least(s, lit(100.0)))
  }

  val HelpfulIndicators = Seq("here", "steps", "how to", "you can", "try",
    "recommend", "suggest", "help", "solution", "answer")

  /** SC10 helpfulness score (text_agent_transformer.py:387-410). */
  def helpfulnessScore(t: Column): Column = {
    val u = lower(t)
    val helpfulCount = HelpfulIndicators.map(w => when(u.contains(w), 1).otherwise(0)).reduce(_ + _)
    val s = lit(60.0) + least(helpfulCount * 5, lit(30)) +
      when(u.contains("cannot") || u.contains("can't"), -15).otherwise(0) +
      when(u.contains("sorry"), -5).otherwise(0)
    when(t.isNull || t === "", 0.0).otherwise(greatest(least(s, lit(100.0)), lit(0.0)))
  }

  /** SC11 overall quality — mean of SC8–SC10 rounded at 1
    * (text_agent_transformer.py:325-342).
    */
  def overallQualityScore(t: Column): Column =
    Num.r((completenessScore(t) + relevanceScore(t) + helpfulnessScore(t)) / 3, 1)

  /** SC12 response appropriateness — tokens_out bands; the band order
    * follows the Python elif chain (text_agent_transformer.py:412-426).
    */
  def responseAppropriateness(t: Column, tokensOut: Column): Column =
    when(t.isNull || t === "", "empty")
      .when(tokensOut < 10, "too_short")
      .when(tokensOut > 1000, "very_long")
      .when(tokensOut > 500, "long")
      .when(tokensOut > 100, "appropriate")
      .otherwise("concise")

  /** SC13 business value score (text_agent_transformer.py:507-528). */
  def businessValueScore(t: Column, tokensOut: Column): Column = {
    val u = lower(coalesce(t, lit("")))
    val hasConv = size(TextAnalysis.conversionIndicators(coalesce(t, lit("")))) > 0
    val s = lit(50) +
      when(hasConv, 30).otherwise(0) +
      when(tokensOut > 100, 10).otherwise(0) +
      when(u.contains("recommend"), 15).otherwise(0) +
      when(u.contains("sorry"), -10).otherwise(0) +
      when(tokensOut < 20, -15).otherwise(0)
    greatest(least(s, lit(100)), lit(0))
  }

  /** SC14 cost per token — guarded divide (text_agent_transformer.py:443). */
  def costPerToken(cost: Column, tokensIn: Column, tokensOut: Column): Column =
    when(tokensIn + tokensOut > 0, cost / (tokensIn + tokensOut)).otherwise(0.0)
}
