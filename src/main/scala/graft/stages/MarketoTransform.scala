package graft.stages

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Normalize, Scoring}

/** Marketo lead transform stage (SURVEY.md §3 Trace 1;
  * etl/transform/marketo_transformer.py:21-62).
  *
  * DataFrame→DataFrame: validates required fields (P1), normalizes
  * contacts (F5–F7, F3), derives full_name/email_domain/geo (F8–F10) and
  * the lead quality score (SC1). One narrow projection — no shuffle; at
  * 100 TB this is a pure map stage that pipelines with the scan.
  */
object MarketoTransform {
  val RequiredFields = Seq("id", "email")

  /** P1 validation predicate (base_transformer.py:34-41). */
  def isValid(df: DataFrame): Column =
    RequiredFields.map(f => col(f).isNotNull).reduce(_ && _)

  /** Optional input column — sparse lead payloads may omit fields. */
  private def optCol(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) col(name) else lit(null).cast("string")

  /** Enrich raw leads; `asOfMs` pins SC1 recency and F1 parse fallback
    * (reference uses wall-clock now()).
    */
  def enrich(raw: DataFrame, asOfMs: Long): DataFrame = {
    val asOf = lit(asOfMs)
    def oc(n: String) = optCol(raw, n)
    raw.filter(isValid(raw)).select(
      col("id").cast("long").as("lead_id"),
      Normalize.normalizeEmail(col("email")).as("email"),
      Normalize.normString(col("firstName")).as("first_name"),
      Normalize.normString(col("lastName")).as("last_name"),
      Normalize.normString(col("company")).as("company"),
      Normalize.normString(col("title")).as("title"),
      Normalize.normalizePhone(col("phone")).as("phone"),
      Normalize.normalizeLeadSource(col("leadSource")).as("lead_source"),
      Normalize.normString(col("originalSourceType")).as("original_source_type"),
      Normalize.normString(col("leadStatus")).as("lead_status"),
      Normalize.standardizeTsStr(col("createdAt"), asOf).as("created_at"),
      Normalize.standardizeTsStr(col("updatedAt"), asOf).as("updated_at"),
      Normalize.fullName(col("firstName"), col("lastName")).as("full_name"),
      Normalize.emailDomain(col("email")).as("email_domain"),
      // recency uses recencyTsStr (NULL on naive/unparseable updatedAt — the
      // reference's try/except awards no bonus there), while the updated_at
      // OUTPUT column above keeps standardizeTsStr's asOf fallback mirroring
      // the reference's now() fallback.
      Scoring.leadScore(col("email"), col("firstName"), col("lastName"),
        col("company"), col("title"), col("phone"), col("leadSource"),
        Normalize.recencyTsStr(col("updatedAt")), asOf).as("lead_quality_score"),
      struct(
        Normalize.normString(oc("country")).as("country"),
        Normalize.normString(oc("state")).as("state"),
        Normalize.normString(oc("city")).as("city"),
        Normalize.normString(oc("postalCode")).as("postal_code"),
        Normalize.normString(oc("timezone")).as("timezone")).as("geographic_info"))
  }
}
