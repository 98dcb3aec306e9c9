package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.scale.AsofJoin

/** As-of join: the simple window form and the bucketed scale form must
  * agree exactly, preserve left-join row counts, and honor inclusive
  * `rightTime <= leftTime` matching.
  */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  private def parts = {
    val ev = Tables.events(spark, sf)
    val left = ev.select("event_id", "user_id", "ts")
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
    (left, right)
  }

  test("bucketed as-of equals the single-window as-of") {
    val (left, right) = parts
    val simple = AsofJoin.asof(left, right, Seq("user_id"), col("ts"), col("p_ts"))
    val bucketed = AsofJoin.asofBucketed(left, right, Seq("user_id"),
      col("ts"), col("p_ts"), t => date_trunc("week", t))
    assert(simple.count() == left.count())
    assert(bucketed.count() == left.count())
    assert(simple.exceptAll(bucketed).isEmpty && bucketed.exceptAll(simple).isEmpty)
  }

  test("matches are at-or-before and maximal") {
    val (left, right) = parts
    val joined = AsofJoin.asof(left, right, Seq("user_id"), col("ts"), col("p_ts"))
    // no match from the future
    assert(joined.filter(col("p_ts") > col("ts")).isEmpty)
    // a purchase event matches itself (inclusive semantics)
    val ev = Tables.events(spark, sf).filter(col("event_type") === "purchase")
    val selfMatched = joined.join(ev.select(col("event_id"), col("ts").as("e_ts")), "event_id")
      .filter(col("p_ts") =!= col("e_ts"))
    assert(selfMatched.isEmpty)
    // maximality: no purchase strictly between matched p_ts and ts
    val between = joined.alias("j")
      .join(right.alias("r"), col("j.user_id") === col("r.user_id") &&
        col("r.p_ts") <= col("j.ts") && col("r.p_ts") > col("j.p_ts"))
    assert(between.isEmpty)
  }
}
