package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Normalization scalar functions (SURVEY.md §2.3 F1, F3, F5–F9, F11–F14).
  *
  * Pure Column expressions — no UDFs — so every call stays inside Catalyst
  * codegen. Semantics mirror the reference transformers exactly, including
  * Python truthiness edges (empty string ⇒ null, `0` timestamps ⇒ null).
  *
  * Reference: etl/transform/base_transformer.py:43-95,
  * etl/transform/marketo_transformer.py:64-141,243-315,
  * etl/transform/frontend_transformer.py:74-98.
  */
object Normalize {

  /** Python str.strip()/str.split() whitespace semantics: strip ALL
    * whitespace characters. Spark's trim() strips only space (0x20), so a
    * leading \n or \t (common in LLM response text) would survive and
    * diverge from the reference.
    */
  def wsTrim(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")

  /** F3 normalize_string — cast→strip→empty⇒NULL (base_transformer.py:85-95). */
  def normString(c: Column): Column = nullif(wsTrim(c), lit(""))

  /** F1 standardize_timestamp, numeric input: >1e12 ⇒ already ms, else
    * seconds⇒ms; 0/null ⇒ null (Python falsy guard, base_transformer.py:43-63).
    */
  def standardizeTsNum(c: Column): Column =
    when(c.isNull || c === 0, lit(null).cast("long"))
      .otherwise(when(c > 1000000000000L, c.cast("long"))
        .otherwise((c * 1000).cast("long")))

  /** F1 string input: ISO-8601 (Z ⇒ +00:00) to epoch ms; unparseable ⇒
    * asOfMs (reference falls back to wall-clock now()).
    */
  def standardizeTsStr(c: Column, asOfMs: Column): Column =
    when(c.isNull || c === "", lit(null).cast("long"))
      .otherwise(coalesce(
        unix_millis(try_to_timestamp(regexp_replace(c, "Z$", "+00:00"))), asOfMs))

  /** SC1 recency input — the reference computes
    * `(datetime.now(timezone.utc) - fromisoformat(s)).days` inside
    * try/except (marketo_transformer.py:181-191): unparseable strings raise
    * ValueError and NAIVE datetimes (no UTC offset) raise TypeError on the
    * aware-minus-naive subtraction, both swallowed ⇒ no recency bonus. So
    * epoch ms only for offset-bearing parseable strings, NULL otherwise —
    * unlike standardizeTsStr there is deliberately no asOf fallback.
    */
  def recencyTsStr(c: Column): Column =
    when(c.rlike("(Z|[+-]\\d{2}:\\d{2})$"),
      unix_millis(try_to_timestamp(regexp_replace(c, "Z$", "+00:00"))))

  /** F5 normalize_email — trim+lower then regex-validate, invalid ⇒ NULL
    * (marketo_transformer.py:64-78).
    */
  val EmailRe = "^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}$"
  def normalizeEmail(c: Column): Column = {
    val e = lower(wsTrim(c))
    when(e.rlike(EmailRe), e)
  }

  /** F6 normalize_phone — strip non-digits; 10 ⇒ (XXX) XXX-XXXX; 11 with
    * leading 1 ⇒ 1-(XXX) XXX-XXXX; else original trimmed
    * (marketo_transformer.py:80-98).
    */
  def normalizePhone(c: Column): Column = {
    val d = regexp_replace(c, "\\D", "")
    when(c.isNull || c === "", lit(null).cast("string"))
      .otherwise(
        when(length(d) === 10,
          format_string("(%s) %s-%s", substring(d, 1, 3), substring(d, 4, 3), substring(d, 7, 4)))
        .when(length(d) === 11 && d.startsWith("1"),
          format_string("1-(%s) %s-%s", substring(d, 2, 3), substring(d, 5, 3), substring(d, 8, 4)))
        .otherwise(wsTrim(c)))
  }

  /** F7 normalize_lead_source — canonical 10-entry map on trim+lower, else
    * title-case passthrough (marketo_transformer.py:100-120). Python
    * str.title() and Spark initcap agree on whitespace-separated words.
    */
  val LeadSourceMap: Map[String, String] = Map(
    "web" -> "Website", "website" -> "Website",
    "organic search" -> "Organic Search", "paid search" -> "Paid Search",
    "social media" -> "Social Media", "email" -> "Email Marketing",
    "webinar" -> "Webinar", "trade show" -> "Trade Show",
    "referral" -> "Referral", "direct mail" -> "Direct Mail")
  def normalizeLeadSource(c: Column): Column = {
    val m = typedLit(LeadSourceMap)
    when(c.isNull || c === "", lit(null).cast("string"))
      .otherwise(coalesce(element_at(m, lower(wsTrim(c))), initcap(c)))
  }

  /** F8 create_full_name — "first last" with null-tolerant fallback
    * (marketo_transformer.py:122-134): concat_ws skips nulls, so the
    * 3-branch Python fallback collapses to one expression.
    */
  def fullName(first: Column, last: Column): Column =
    nullif(concat_ws(" ", normString(first), normString(last)), lit(""))

  /** F9 extract_email_domain — split('@')[1] lowered; no '@' ⇒ NULL
    * (marketo_transformer.py:136-141). element_at(...,2) matches Python
    * [1] on multi-@ strings (substring_index(-1) would not).
    */
  def emailDomain(c: Column): Column =
    when(c.isNotNull && c.contains("@"), lower(element_at(split(c, "@", -1), 2)))

  /** F11 activity type id → name, default "Unknown Activity (id)"
    * (marketo_transformer.py:243-265).
    */
  val ActivityTypeMap: Map[Int, String] = Map(
    1 -> "Visit Webpage", 2 -> "Fill Out Form", 3 -> "Click Link",
    6 -> "Send Email", 7 -> "Email Delivered", 8 -> "Email Bounced",
    9 -> "Unsubscribe Email", 10 -> "Open Email", 11 -> "Click Email",
    12 -> "New Lead", 13 -> "Change Data Value", 22 -> "Interesting Moment",
    24 -> "Request Campaign", 25 -> "Send Alert", 104 -> "Download Content",
    110 -> "Visit Booth", 113 -> "Attend Event")
  def activityTypeName(id: Column): Column =
    coalesce(element_at(typedLit(ActivityTypeMap), id.cast("int")),
      format_string("Unknown Activity (%d)", id.cast("int")))

  /** F12 extract_activity_attributes — array<struct{name,value}> ⇒ map with
    * lower-snake keys and normalized values (marketo_transformer.py:267-276).
    */
  def activityAttributes(attrs: Column): Column =
    map_from_entries(transform(attrs, a =>
      struct(
        regexp_replace(lower(a.getField("name")), " ", "_").as("key"),
        normString(a.getField("value")).as("value"))))

  /** F13 categorize_activity — id buckets ⇒ category, else "other"
    * (marketo_transformer.py:299-315).
    */
  def activityCategory(id: Column): Column =
    when(id.isin(6, 7, 8, 9, 10, 11), "email")
      .when(id.isin(1, 3), "web")
      .when(id === 2, "form")
      .when(id === 104, "content")
      .when(id.isin(110, 113), "event")
      .when(id.isin(24, 25), "campaign")
      .when(id.isin(12, 13), "data")
      .when(id === 22, "engagement")
      .otherwise("other")

  /** F14 normalize_event_type — lower, '-'→'_'; empty ⇒ "unknown"; the
    * 14-entry reference map is the identity on its own keys so unmapped
    * values pass through (frontend_transformer.py:74-98).
    */
  def normalizeEventType(c: Column): Column =
    when(c.isNull || c === "", lit("unknown"))
      .otherwise(lower(regexp_replace(c, "-", "_")))
}
