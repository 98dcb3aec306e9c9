package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.stages.{FrontendTransform, MarketoTransform, TextAgentTransform}

/** Differential fuzz against the REFERENCE implementation: hundreds of
  * seeded messy records were run through the reference's own Python
  * transformers (dev/gen_goldens.py) and the expected scalar outputs
  * committed as JSONL. This pins the whole F/SC surface set-wise, far
  * beyond the three demo fixtures.
  *
  * Tolerances exist only where Python's round() (banker's) and the
  * engine's half-up rounding can differ at exact dyadic halves — one ulp
  * of the last rounded digit.
  */
class GoldenFuzzSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val dir = "src/test/resources/goldens"
  // any asOf far from the 2023/24 updatedAt fixtures reproduces the
  // generator-time wall clock's "no recency bonus" outcome
  val AsOfMs = 1767225600000L // 2026-01-01

  private def expectedDf(path: String, fields: Seq[(String, DataType)]): DataFrame = {
    val schema = StructType(StructField("__id", LongType) +:
      fields.map { case (n, t) => StructField(n, t) })
    spark.read.schema(schema).json(path)
  }

  /** Compare one flattened field, tolerating the banker's-rounding ulp. */
  private def mismatches(joined: DataFrame, field: String, dt: DataType,
      tol: Double): Seq[String] = {
    val g = col("g")
    val e = col(s"`$field`")
    val bad = dt match {
      case DoubleType if tol > 0 =>
        !(g.isNull && e.isNull) && (g.isNull || e.isNull || abs(g - e) > tol)
      case _ => !(g <=> e)
    }
    joined.filter(bad).limit(5).collect().map { r =>
      s"$field: key=${r.get(0)} got=${r.get(r.fieldIndex("g"))} expected=${r.get(r.fieldIndex(field))}"
    }.toSeq
  }

  private def check(got: DataFrame, expected: DataFrame, key: String,
      fields: Seq[(String, DataType)], tols: Map[String, Double]): Unit = {
    val errs = fields.flatMap { case (f, dt) =>
      val gotCol = f.split("\\.").foldLeft(null: Column) { (acc, p) =>
        if (acc == null) col(p) else acc.getField(p)
      }
      val joined = got.select(col(key).as("k"), gotCol.cast(dt).as("g"))
        .join(expected.select(col(s"`$key`").as("k2"), col(s"`$f`")),
          col("k") === col("k2"))
      mismatches(joined, f, dt, tols.getOrElse(f, 0.0))
    }
    assert(errs.isEmpty, s"\n${errs.take(20).mkString("\n")}")
  }

  test("marketo stage matches the reference over 618 fuzz records") {
    val in = spark.read.json(s"$dir/marketo_inputs.jsonl")
    val got = MarketoTransform.enrich(in, AsOfMs)
    val fields = Seq(
      "lead_id" -> (LongType: DataType), "email" -> StringType,
      "first_name" -> StringType, "last_name" -> StringType,
      "company" -> StringType, "title" -> StringType, "phone" -> StringType,
      "lead_source" -> StringType, "original_source_type" -> StringType,
      "lead_status" -> StringType, "full_name" -> StringType,
      "email_domain" -> StringType, "lead_quality_score" -> LongType)
    val exp = expectedDf(s"$dir/marketo_expected.jsonl", fields)
    assert(got.count() == exp.count())
    check(got, exp, "lead_id", fields, Map.empty)
  }

  test("frontend stage matches the reference over 514 fuzz records") {
    val in = spark.read.json(s"$dir/frontend_inputs.jsonl")
    val got = FrontendTransform.enrich(in, AsOfMs)
    val fields = Seq(
      "session_id" -> (StringType: DataType), "user_id" -> StringType,
      "event_type" -> StringType, "interaction_type" -> StringType,
      "widget_id" -> StringType, "user_segment" -> StringType,
      "engagement_score" -> LongType, "conversion_stage" -> StringType,
      "quality_score" -> LongType,
      "page_info.domain" -> StringType, "page_info.path" -> StringType,
      "page_info.category" -> StringType, "page_info.utm_source" -> StringType,
      "page_info.utm_medium" -> StringType,
      "referrer_info.referrer_domain" -> StringType,
      "referrer_info.referrer_type" -> StringType,
      "device_info.device_type" -> StringType, "device_info.browser" -> StringType,
      "device_info.operating_system" -> StringType,
      "device_info.is_mobile" -> BooleanType)
    val exp = expectedDf(s"$dir/frontend_expected.jsonl", fields)
    assert(got.count() == exp.count())
    check(got, exp, "user_id", fields, Map.empty)
  }

  test("text-agent stage matches the reference over 534 fuzz records") {
    import org.apache.spark.sql.types.{StructType => ST}
    val inSchema = new ST()
      .add("__id", LongType).add("session_id", StringType).add("turn_id", StringType)
      .add("user_id", StringType).add("channel", StringType)
      .add("timestamp", LongType).add("model", StringType)
      .add("tokens_in", IntegerType).add("tokens_out", IntegerType)
      .add("latency_ms", DoubleType).add("response_text", StringType)
      .add("tools_used", ArrayType(StringType))
      .add("tool_results", MapType(StringType,
        new ST().add("success", BooleanType)))
    val in = spark.read.schema(inSchema).json(s"$dir/textagent_inputs.jsonl")
    val got = TextAgentTransform.enrich(in, AsOfMs)
    val fields = Seq(
      "session_id" -> (StringType: DataType), "turn_id" -> StringType,
      "user_id" -> StringType, "channel" -> StringType,
      "model_info.model_family" -> StringType,
      "model_info.estimated_size" -> StringType,
      "model_info.model_version" -> StringType,
      "performance_metrics.total_tokens" -> LongType,
      "performance_metrics.tokens_per_second" -> DoubleType,
      "performance_metrics.compression_ratio" -> DoubleType,
      "performance_metrics.efficiency_score" -> LongType,
      "content_analysis.response_length" -> LongType,
      "content_analysis.word_count" -> LongType,
      "content_analysis.sentence_count" -> LongType,
      "content_analysis.has_code_blocks" -> BooleanType,
      "content_analysis.has_links" -> BooleanType,
      "content_analysis.language" -> StringType,
      "content_analysis.sentiment" -> StringType,
      "tool_usage.tools_count" -> LongType,
      "tool_usage.tool_success_rate" -> DoubleType,
      "quality_metrics.completeness_score" -> DoubleType,
      "quality_metrics.relevance_score" -> DoubleType,
      "quality_metrics.helpfulness_score" -> DoubleType,
      "quality_metrics.overall_quality_score" -> DoubleType,
      "quality_metrics.response_appropriateness" -> StringType,
      "business_metrics.estimated_cost_usd" -> DoubleType,
      "business_metrics.has_conversion_indicators" -> BooleanType,
      "business_metrics.support_resolution_type" -> StringType,
      "business_metrics.business_value_score" -> LongType)
    val exp = expectedDf(s"$dir/textagent_expected.jsonl", fields)
    assert(got.count() == exp.count())
    check(got, exp, "session_id", fields, Map(
      "performance_metrics.tokens_per_second" -> 0.011,
      "performance_metrics.compression_ratio" -> 0.011,
      "quality_metrics.overall_quality_score" -> 0.11,
      "business_metrics.estimated_cost_usd" -> 1.1e-6,
      "tool_usage.tool_success_rate" -> 1e-9))
  }
}
