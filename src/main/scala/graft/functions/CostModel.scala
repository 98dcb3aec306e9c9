package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Num

/** F32 cost estimation (text_agent_transformer.py:450-466).
  *
  * The reference looks up rates by `extract_model_family(model)` — which
  * returns "gpt" for every GPT model, so the keyed "gpt-4"/"gpt-3.5" rates
  * are unreachable and all GPT models fall to "default". That (buggy-
  * looking) behavior is preserved verbatim for parity: only "claude"
  * resolves to a non-default rate.
  */
object CostModel {
  val RatesPer1k: Map[String, (Double, Double)] = Map(
    "gpt-4" -> (0.03, 0.06),
    "gpt-3.5" -> (0.001, 0.002),
    "claude" -> (0.008, 0.024))
  val DefaultRates: (Double, Double) = (0.01, 0.02)

  private def inputRate(family: Column): Column =
    RatesPer1k.foldLeft(when(lit(false), 0.0)) { case (acc, (k, (rin, _))) =>
      acc.when(family === k, rin)
    }.otherwise(DefaultRates._1)

  private def outputRate(family: Column): Column =
    RatesPer1k.foldLeft(when(lit(false), 0.0)) { case (acc, (k, (_, rout))) =>
      acc.when(family === k, rout)
    }.otherwise(DefaultRates._2)

  /** estimated_cost_usd = in/1000*r_in + out/1000*r_out, rounded at 6. */
  def estimateCost(tokensIn: Column, tokensOut: Column, model: Column): Column = {
    val family = ModelInfo.modelFamily(model)
    Num.r(tokensIn / 1000.0 * inputRate(family) + tokensOut / 1000.0 * outputRate(family), 6)
  }
}
