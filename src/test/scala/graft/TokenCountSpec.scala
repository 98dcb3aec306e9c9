package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BpeCount, Normalize, TextAnalysis, WsTokenCount}

/** The round-6 codegen'd scan counters (BpeCount, WsTokenCount) and the
  * split-limit language detector replaced array-materializing
  * formulations. These must be VALUE-identical to the old expressions on
  * every input — including the boundary cases testdata may not contain:
  * >50-word documents (the split-limit remainder), exotic whitespace,
  * supplementary (surrogate-pair) code points, empty/whitespace-only
  * strings.
  */
class TokenCountSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._

  private val cases: Seq[String] = Seq(
    null,
    "",
    "   ",
    "\t\n\f\r",
    "one",
    " leading and trailing  ",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    // 60 words: crosses the 50-token language window so the limit-split
    // remainder path is exercised
    (1 to 60).map(i => s"w$i").mkString(" "),
    // the remainder contains list words — they must NOT count (only the
    // first 50 tokens are inspected, same as the unlimited split)
    ((1 to 50).map(_ => "zz") ++ Seq("the", "the", "the")).mkString(" "),
    // language words inside the window
    ("the and is to in it you that he was " * 5).trim,
    "el la de que y es en un se no",
    "café naïve résumé 你好 über",
    "emoji 😀😀 mixed123text !!!",
    "tab\tsep\nnewlinevt\ffeed\rcr end",
    "a1b2c3 42 ... --- ___",
    "  multiple   internal    runs  ")

  private def df = cases.toDF("text")

  test("WsTokenCount equals the wsTrim+split+size formulation") {
    val oldExpr = when(col("text").isNull || length(Normalize.wsTrim(col("text"))) === 0, 0)
      .otherwise(size(split(Normalize.wsTrim(col("text")), "\\s+")))
    val rows = df.select(TextAnalysis.wordCount(col("text")).as("nw"), oldExpr.as("ow"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"wordCount mismatch on ${Option(c).map(_.take(40))}")
    }
  }

  test("BpeCount equals size(regexp_extract_all(BpeTokenRe))") {
    val oldExpr = when(col("text").isNull, 0)
      .otherwise(size(regexp_extract_all(col("text"), lit(TextAnalysis.BpeTokenRe), lit(0))))
    val rows = df.select(TextAnalysis.bpeTokenCount(col("text")).as("nb"), oldExpr.as("ob"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"bpeTokenCount mismatch on ${Option(c).map(_.take(40))}")
    }
  }

  test("split-limit language equals the full-split formulation") {
    def tokenMatches(words: org.apache.spark.sql.Column, list: Seq[String]) =
      size(filter(words, w => w.isInCollection(list)))
    val words = slice(split(lower(Normalize.wsTrim(col("text"))), "\\s+"), 1, 50)
    val en = tokenMatches(words, TextAnalysis.EnglishWords)
    val es = tokenMatches(words, TextAnalysis.SpanishWords)
    val fr = tokenMatches(words, TextAnalysis.FrenchWords)
    val oldExpr = when(col("text").isNull || col("text") === "", "unknown")
      .otherwise(when(en >= es && en >= fr, "english")
        .when(es > fr, "spanish").when(fr > 0, "french").otherwise("unknown"))
    val rows = df.select(TextAnalysis.language(col("text")).as("nl"), oldExpr.as("ol"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getString(0) == r.getString(1), s"language mismatch on ${Option(c).map(_.take(40))}")
    }
  }

  test("scan counters agree with the old formulations on real documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val mismatch = docs.select(
      TextAnalysis.wordCount(col("text")).as("nw"),
      when(col("text").isNull || length(Normalize.wsTrim(col("text"))) === 0, 0)
        .otherwise(size(split(Normalize.wsTrim(col("text")), "\\s+"))).as("ow"),
      TextAnalysis.bpeTokenCount(col("text")).as("nb"),
      when(col("text").isNull, 0)
        .otherwise(size(regexp_extract_all(col("text"), lit(TextAnalysis.BpeTokenRe), lit(0)))).as("ob"))
      .filter(col("nw") =!= col("ow") || col("nb") =!= col("ob"))
      .count()
    assert(mismatch == 0L)
  }
}
