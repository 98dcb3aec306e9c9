package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text content analysis (SURVEY.md §2.3 F26–F29, F33–F34;
  * text_agent_transformer.py:181-267,468-505).
  *
  * Two distinct membership semantics are preserved exactly:
  *  - F27 language detect counts TOKEN matches (first 50 whitespace
  *    tokens, duplicates counted);
  *  - F28/F29/F33/F34 use SUBSTRING containment of each keyword in the
  *    whole lowered text (presence, not occurrences).
  */
object TextAnalysis {

  /** F26 response_length. */
  def responseLength(t: Column): Column =
    when(t.isNull, 0).otherwise(length(t))

  /** F26 word_count — len(text.split()): whitespace runs, no empties.
    * Counted as maximal non-`\s` runs in one codegen'd scan
    * (WsTokenCount) — identical to the old wsTrim+split+size chain
    * (wsTrim is itself `\s`-based, so edge whitespace never forms a run)
    * without materializing the word array or the trimmed copy.
    */
  def wordCount(t: Column): Column =
    when(t.isNull, 0).otherwise(WsTokenCount.wsTokenCount(t))

  /** F26 sentence_count — occurrences of '.', '!', '?'. */
  def sentenceCount(t: Column): Column =
    when(t.isNull, 0).otherwise(length(t) - length(translate(t, ".!?", "")))

  /** F26 has_code_blocks / has_links. */
  def hasCodeBlocks(t: Column): Column = coalesce(t.contains("```"), lit(false))
  def hasLinks(t: Column): Column = coalesce(t.contains("http"), lit(false))

  /** F26 redacted_preview — first 200 chars of the PII-redacted text,
    * empty ⇒ NULL.
    */
  def redactedPreview(t: Column): Column =
    nullif(substring(Pii.redact(t), 1, 200), lit(""))

  val EnglishWords = Seq("the", "and", "is", "to", "in", "it", "you", "that", "he", "was")
  val SpanishWords = Seq("el", "la", "de", "que", "y", "es", "en", "un", "se", "no")
  // "et" appears twice in the reference list; set-membership makes the
  // duplicate a no-op, so the deduplicated list is semantically identical.
  val FrenchWords = Seq("le", "de", "et", "à", "un", "il", "être", "en", "avoir")

  private def tokenMatches(words: Column, list: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(list)))

  /** F27 detect_response_language — first 50 lowered tokens, per-token
    * membership counts; en wins ties; all-zero still ⇒ english (the
    * reference's >= comparison); only empty text ⇒ unknown
    * (text_agent_transformer.py:200-224).
    */
  def language(t: Column): Column = {
    // split with limit 51: at most 50 real tokens + the unsplit remainder
    // (dropped by the slice) — a multi-KB doc otherwise materializes its
    // entire word array, and lowers its full text, to inspect 50 tokens.
    // After wsTrim there are no leading/trailing empties, so the first 50
    // elements are identical to the unlimited split's.
    val words = transform(
      slice(split(Normalize.wsTrim(t), "\\s+", 51), 1, 50), w => lower(w))
    val en = tokenMatches(words, EnglishWords)
    val es = tokenMatches(words, SpanishWords)
    val fr = tokenMatches(words, FrenchWords)
    when(t.isNull || t === "", "unknown")
      .otherwise(
        when(en >= es && en >= fr, "english")
          .when(es > fr, "spanish")
          .when(fr > 0, "french")
          .otherwise("unknown"))
  }

  val PositiveWords = Seq("good", "great", "excellent", "amazing", "wonderful",
    "perfect", "love", "like", "happy", "pleased")
  val NegativeWords = Seq("bad", "terrible", "awful", "horrible", "hate",
    "dislike", "angry", "frustrated", "disappointed", "wrong")

  private def substrCount(t: Column, words: Seq[String]): Column =
    words.map(w => when(t.contains(w), 1).otherwise(0)).reduce(_ + _)

  /** F28 analyze_sentiment — substring presence counts, majority vote
    * (text_agent_transformer.py:226-243).
    */
  def sentiment(t: Column): Column = {
    val u = lower(t)
    val pos = substrCount(u, PositiveWords)
    val neg = substrCount(u, NegativeWords)
    when(t.isNull || t === "", "neutral")
      .otherwise(when(pos > neg, "positive").when(neg > pos, "negative").otherwise("neutral"))
  }

  val TopicKeywords: Seq[(String, Seq[String])] = Seq(
    "product_info" -> Seq("product", "item", "specification", "feature", "price", "cost"),
    "support" -> Seq("help", "support", "issue", "problem", "trouble", "error"),
    "shipping" -> Seq("shipping", "delivery", "ship", "arrive", "tracking"),
    "payment" -> Seq("payment", "pay", "card", "billing", "charge", "refund"),
    "return" -> Seq("return", "exchange", "refund", "warranty", "guarantee"),
    "recommendation" -> Seq("recommend", "suggest", "best", "should", "consider"))

  private def anySubstr(t: Column, words: Seq[String]): Column =
    words.map(t.contains).reduce(_ || _)

  /** F29 extract_topics — multi-label in dict order, default ["general"];
    * empty text ⇒ [] (text_agent_transformer.py:245-267).
    */
  def topics(t: Column): Column = {
    val u = lower(t)
    val arr = concat(TopicKeywords.map { case (topic, kws) =>
      when(anySubstr(u, kws), array(lit(topic))).otherwise(array().cast("array<string>"))
    }: _*)
    when(t.isNull || t === "", array().cast("array<string>"))
      .otherwise(when(size(arr) === 0, array(lit("general"))).otherwise(arr))
  }

  /** Topics as a comma-joined string — the oracle-comparable form. */
  def topicsJoined(t: Column): Column = array_join(topics(t), ",")

  val ConversionPatterns: Seq[(String, Seq[String])] = Seq(
    "purchase_intent" -> Seq("buy", "purchase", "order", "cart", "checkout"),
    "contact_request" -> Seq("contact", "call", "email", "speak", "talk"),
    "demo_request" -> Seq("demo", "trial", "preview", "show"),
    "information_request" -> Seq("more info", "details", "specifications", "pricing"))

  /** F33 detect_conversion_indicators — same shape as topics, no default
    * (text_agent_transformer.py:468-487).
    */
  def conversionIndicators(t: Column): Column = {
    val u = lower(t)
    val arr = concat(ConversionPatterns.map { case (p, kws) =>
      when(anySubstr(u, kws), array(lit(p))).otherwise(array().cast("array<string>"))
    }: _*)
    when(t.isNull || t === "", array().cast("array<string>")).otherwise(arr)
  }

  /** F34 detect_support_resolution — ordered keyword checks
    * (text_agent_transformer.py:489-505).
    */
  def supportResolution(t: Column): Column = {
    val u = lower(t)
    when(t.isNull || t === "", "unknown")
      .when(anySubstr(u, Seq("solved", "fixed", "resolved", "working")), "resolved")
      .when(anySubstr(u, Seq("try", "attempt", "check")), "troubleshooting")
      .when(anySubstr(u, Seq("contact", "escalate", "specialist")), "escalation")
      .when(anySubstr(u, Seq("sorry", "cannot", "unable")), "unresolved")
      .otherwise("informational")
  }

  /** Token counting for the scale tier: whitespace tokens plus a BPE-ish
    * regex token count (word pieces / numbers / single punctuation) —
    * the standard pre-tokenizer shape for LLM-data pipelines.
    */
  val BpeTokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  /** Match count of BpeTokenRe — single codegen'd scan (BpeCount); the
    * regexp_extract_all formulation materialized every token into an
    * array per document just to take size().
    */
  def bpeTokenCount(t: Column): Column =
    when(t.isNull, 0).otherwise(BpeCount.bpeCount(t))
}
