package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Forecast

/** Pins the Holt `aggregate`-HOF fold against a driver-side sequential
  * evaluation of the same recurrence (same init, same 1e-9 state snap),
  * so a future rewrite of the fold (or a Catalyst change to HOF
  * evaluation order) that alters any step's state fails loudly. Also
  * sanity-bounds the ACF output domain.
  */
class ForecastSpec extends AnyFunSuite {
  lazy val spark = Spark.session
  val sf = "/root/testdata/sf0.001"

  private def snap9(x: Double): Double =
    math.floor(x * 1e9 + 0.5) / 1e9

  test("holt fold equals the driver-side sequential recurrence") {
    val rows = Forecast.holtForecast(spark, sf)
      .orderBy(col("day"))
      .select("day", "y", "level", "trend")
      .collect()
    assert(rows.length > 1)
    var l = 0.0
    var b = 0.0
    rows.zipWithIndex.foreach { case (r, i) =>
      val y = r.getDouble(1)
      if (i == 0) { l = y; b = 0.0 }
      else {
        val lNew = snap9(Forecast.HoltAlpha * y + (1.0 - Forecast.HoltAlpha) * (l + b))
        val bNew = snap9(Forecast.HoltBeta * (lNew - l) + (1.0 - Forecast.HoltBeta) * b)
        l = lNew; b = bNew
      }
      assert(r.getDouble(2) == l, s"level mismatch at step $i (${r.getDate(0)})")
      assert(r.getDouble(3) == b, s"trend mismatch at step $i (${r.getDate(0)})")
    }
  }

  test("holt-winters fold equals the driver-side sequential recurrence") {
    val rows = Forecast.holtWinters(spark, sf)
      .orderBy(col("day"))
      .select("day", "y", "level", "trend", "seasonal", "forecast_next")
      .collect()
    assert(rows.length > 14)
    var l = 0.0
    var b = 0.0
    val s = Array.fill(7)(0.0)
    rows.zipWithIndex.foreach { case (r, idx) =>
      val i = idx + 1
      val y = r.getDouble(1)
      val k = (i - 1) % 7 // 0-based slot
      if (i == 1) { l = y; b = 0.0 }
      else {
        val lNew = snap9(Forecast.HwAlpha * (y - s(k)) +
          (1.0 - Forecast.HwAlpha) * (l + b))
        val bNew = snap9(Forecast.HwBeta * (lNew - l) +
          (1.0 - Forecast.HwBeta) * b)
        s(k) = snap9(Forecast.HwGamma * (y - lNew) +
          (1.0 - Forecast.HwGamma) * s(k))
        l = lNew; b = bNew
      }
      assert(r.getDouble(2) == l, s"level mismatch at step $i")
      assert(r.getDouble(3) == b, s"trend mismatch at step $i")
      assert(r.getDouble(4) == s(k), s"seasonal mismatch at step $i")
      val fc = math.floor((l + b + s(i % 7)) * 1e2 + 0.5) / 1e2
      assert(r.getDouble(5) == fc, s"forecast mismatch at step $i")
    }
    // gap-filled: days are consecutive
    val days = rows.map(_.getDate(0).toLocalDate)
    days.sliding(2).foreach(p => assert(p(1) == p(0).plusDays(1)))
  }

  test("SeqFold expressions are bit-identical to the original HOF folds") {
    // the r12 linear-state rewrite must not move a single ulp: the HOF
    // forms stay unregistered as the differential baseline
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("day")).collect().map(_.toSeq).toSeq
    assert(rows(Forecast.holtForecast(spark, sf)) ==
      rows(Forecast.holtForecastHof(spark, sf)))
    assert(rows(Forecast.holtWinters(spark, sf)) ==
      rows(Forecast.holtWintersHof(spark, sf)))
  }

  test("acf values are in [-1, 1] and lags are exactly 1..7") {
    val rows = Forecast.acf(spark, sf)
      .select("lag", "acf").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(rows.keySet == (1L to 7L).toSet)
    rows.values.flatten.foreach(v => assert(v >= -1.0 - 1e-6 && v <= 1.0 + 1e-6))
  }
}
