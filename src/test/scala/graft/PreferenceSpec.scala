package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Preference

/** Bradley–Terry preference aggregation: constructed-tournament order,
  * smoothing totality on degenerate records, and the registered wiring's
  * bookkeeping invariants on testdata.
  */
class PreferenceSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  test("constructed tournament: dominance order survives the MM estimate") {
    // A beats B 9/10, B beats C 9/10, A beats C 9/10 — uniform game
    // counts, strict dominance chain; BT must order p_A > p_B > p_C.
    val gd = Seq((1L, 2L, 10L, 9L), (2L, 3L, 10L, 9L), (1L, 3L, 10L, 9L))
      .toDF("i", "j", "n", "w")
    val r = Preference.btRatingOf(gd)
      .orderBy(col("rating").desc).select("player").as[Long].collect()
    assert(r.toSeq == Seq(1L, 2L, 3L))
  }

  test("smoothing keeps the update total on undefeated/winless players") {
    // Player 1 wins every game, player 3 loses every game: without the
    // +0.5 smoothing the winless rating hits exactly 0 and the next
    // round's p_i + p_j for the 2–3 edge divides by zero under ANSI.
    val gd = Seq((1L, 2L, 5L, 5L), (2L, 3L, 5L, 5L)).toDF("i", "j", "n", "w")
    val r = Preference.btRatingOf(gd)
      .select("player", "rating").as[(Long, Double)].collect().toMap
    assert(r.size == 3 && r.values.forall(_ > 0.0))
    assert(r(1L) > r(2L) && r(2L) > r(3L))
  }

  test("registered wiring: per-player bookkeeping matches the pair stream") {
    val out = Preference.btRating(spark, sf)
    val agg = out.agg(sum("wins").as("w"), sum("games").as("g"),
      min("rating").as("mn"), count(lit(1)).as("np"))
      .head()
    // every decisive game awards exactly one win, counted once per side
    assert(agg.getLong(0) * 2 == agg.getLong(1))
    assert(agg.getDouble(2) > 0.0)
    // mean-1.0 normalization over rated players (snapped grid)
    val mean = out.agg(avg("rating")).head().getDouble(0)
    assert(math.abs(mean - 1.0) < 1e-4, s"mean rating $mean")
  }
}
