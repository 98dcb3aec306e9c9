package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F21–F25 model metadata + performance math
  * (text_agent_transformer.py:86-157).
  */
object ModelInfo {

  /** F21 extract_model_family — substring buckets over lowered name. */
  def modelFamily(m: Column): Column = {
    val u = lower(m)
    when(u.contains("gpt"), "gpt")
      .when(u.contains("claude"), "claude")
      .when(u.contains("llama"), "llama")
      .when(u.contains("palm"), "palm")
      .when(u.contains("gemini"), "gemini")
      .otherwise("other")
  }

  /** F22 estimate_model_size. */
  def modelSize(m: Column): Column = {
    val u = lower(m)
    def any(subs: Seq[String]) = subs.map(u.contains).reduce(_ || _)
    when(any(Seq("large", "xl", "70b", "175b")), "large")
      .when(any(Seq("medium", "base", "13b", "30b")), "medium")
      .when(any(Seq("small", "mini", "7b")), "small")
      .otherwise("unknown")
  }

  /** F23 analyze_model_capabilities — multi-label array, default
    * ["text_generation"]. concat of conditional singleton arrays keeps
    * the reference's append order.
    */
  def modelCapabilities(m: Column): Column = {
    val u = lower(m)
    val caps = concat(
      when(u.contains("instruct") || u.contains("chat"), array(lit("instruction_following")))
        .otherwise(array().cast("array<string>")),
      when(u.contains("code"), array(lit("code_generation"))).otherwise(array().cast("array<string>")),
      when(u.contains("vision"), array(lit("vision"))).otherwise(array().cast("array<string>")),
      when(u.contains("tool") || u.contains("function"), array(lit("tool_use")))
        .otherwise(array().cast("array<string>")))
    when(size(caps) === 0, array(lit("text_generation"))).otherwise(caps)
  }

  /** F24 extract_model_version — first `v?\d+(\.\d+)*` match, none ⇒ NULL. */
  def modelVersion(m: Column): Column =
    nullif(regexp_extract(m, "v?\\d+(\\.\\d+)*", 0), lit(""))

  /** F25 performance math — guarded ratios, rounded at 2
    * (text_agent_transformer.py:138-157).
    */
  def totalTokens(tokensIn: Column, tokensOut: Column): Column = tokensIn + tokensOut

  def tokensPerSecond(tokensOut: Column, latencyMs: Column): Column =
    graft.Num.r(when(latencyMs > 0, tokensOut / (latencyMs / 1000.0)).otherwise(0.0), 2)

  def compressionRatio(tokensIn: Column, tokensOut: Column): Column =
    graft.Num.r(when(tokensIn > 0, tokensOut.cast("double") / tokensIn).otherwise(0.0), 2)
}
