package graft.scale

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Linear-state exponential-smoothing folds (VERDICT r11 Next #5).
  *
  * The HOF formulation — `aggregate(a, acc, (acc, x) -> acc ||
  * array(...))` — re-copies the whole accumulator array per step and
  * re-interprets a large expression tree per step (ArrayAggregate is
  * CodegenFallback), so the fold is O(grid²) object churn with a heavy
  * interpreted constant: q_holt_winters measured 7.5 s cold / 5.6 s warm
  * at sf0.1 even though its input is only the ~2.4k-day calendar grid.
  * These expressions run the SAME recurrence as a straight Scala loop
  * over the collected grid — O(grid) with machine-arithmetic steps.
  *
  * Bit-identical by construction (ForecastSpec pins both forms equal):
  *  - the per-step snap replicates the HOF text `floor(x * 1000000000D +
  *    0.5D) / 1000000000D` EXACTLY: Spark's floor(double) returns LONG,
  *    so the snap here is Math.floor(...).toLong.toDouble / 1e9 — the
  *    same long-floor semantics (and the same saturation behavior, which
  *    never triggers on the 1e-9-snapped smoothing state's magnitudes);
  *  - the smoothing constants arrive as the SAME Scala doubles the HOF
  *    interpolated into its expression string (`1.0 - alpha` computed
  *    here is the identical double `${1.0 - HoltAlpha}` embedded there —
  *    Double.toString round-trips exactly);
  *  - operation order is textually parallel to the HOF (and to the
  *    recursive-CTE oracle): α·(y − s) + (1−α)·(l + b), etc.
  *
  * Evaluation cost note: CodegenFallback is fine here — each expression
  * evaluates ONCE per query on the single collected-grid row (the
  * calendar-bounded relation), not per corpus row; the per-step work is
  * plain double arithmetic.
  */
object SeqFold {

  private[scale] def snap9(x: Double): Double =
    math.floor(x * 1.0e9 + 0.5).toLong.toDouble / 1.0e9

  /** Holt double-exponential smoothing over a day-sorted
    * `array<struct<day:date,y:double>>`: emits one struct per input day
    * carrying the post-update (l, b) state — the exact relation the HOF
    * fold in Forecast.holtForecast produced.
    */
  case class HoltFoldExpr(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("day", DateType), StructField("y", DoubleType),
      StructField("l", DoubleType), StructField("b", DoubleType))))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ac = 1.0 - alpha
      val bc = 1.0 - beta
      val out = new Array[Any](n)
      var l = 0.0
      var b = 0.0
      var k = 0
      while (k < n) {
        val row = arr.getStruct(k, 2)
        val day = row.getInt(0)
        val y = row.getDouble(1)
        if (k == 0) { l = y; b = 0.0 }
        else {
          val lNew = snap9(alpha * y + ac * (l + b))
          val bNew = snap9(beta * (lNew - l) + bc * b)
          l = lNew; b = bNew
        }
        out(k) = new GenericInternalRow(Array[Any](day, y, l, b))
        k += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): HoltFoldExpr =
      copy(child = newChild)
  }

  /** Additive Holt–Winters with weekly period 7 over the gap-filled
    * day-sorted grid: emits the (i, day, y, l, b, s) struct stream the
    * HOF fold in Forecast.holtWinters produced — `s` is a per-row
    * snapshot of the 7-slot seasonal vector AFTER the day's update, `i`
    * the 1-based grid position (the downstream seasonal/forecast slot
    * arithmetic indexes off both).
    */
  case class HoltWintersFoldExpr(
      child: Expression, alpha: Double, beta: Double, gamma: Double)
    extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("i", IntegerType), StructField("day", DateType),
      StructField("y", DoubleType), StructField("l", DoubleType),
      StructField("b", DoubleType),
      StructField("s", ArrayType(DoubleType)))))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val ac = 1.0 - alpha
      val bc = 1.0 - beta
      val gc = 1.0 - gamma
      val out = new Array[Any](n)
      val s = new Array[Double](7)
      var l = 0.0
      var b = 0.0
      var k = 0
      while (k < n) {
        val row = arr.getStruct(k, 2)
        val day = row.getInt(0)
        val y = row.getDouble(1)
        if (k == 0) { l = y; b = 0.0 }
        else {
          // the HOF's slot for 1-based day i is ((i-1) % 7) + 1 (1-based);
          // with this loop's 0-based k = i-1 that is 0-based k % 7
          val idx = k % 7
          val sPrev = s(idx)
          val lNew = snap9(alpha * (y - sPrev) + ac * (l + b))
          val bNew = snap9(beta * (lNew - l) + bc * b)
          val sNew = snap9(gamma * (y - lNew) + gc * sPrev)
          l = lNew; b = bNew; s(idx) = sNew
        }
        out(k) = new GenericInternalRow(Array[Any](
          k + 1, day, y, l, b,
          new GenericArrayData(Array[Any](s(0), s(1), s(2), s(3), s(4), s(5), s(6)))))
        k += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): HoltWintersFoldExpr =
      copy(child = newChild)
  }

  def holtFold(sorted: Column, alpha: Double, beta: Double): Column =
    GraftColumnBridge.column(
      HoltFoldExpr(GraftColumnBridge.expression(sorted), alpha, beta))

  def holtWintersFold(sorted: Column, alpha: Double, beta: Double,
      gamma: Double): Column =
    GraftColumnBridge.column(
      HoltWintersFoldExpr(GraftColumnBridge.expression(sorted), alpha, beta, gamma))
}
