package graft.scale

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint:
  * h = fold(0, c => (h·31 + codePoint(c)) mod 1_000_000_007), left to
  * right over the string. The classic Rabin–Karp/winnowing base hash —
  * cheap, incremental, and (unlike md5) expressible in plain SQL
  * arithmetic, so the DuckDB oracle reproduces it exactly via
  * list_reduce. Codegen'd static loop per row.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure("requires STRING")
  override def nullSafeEval(v: Any): Any =
    PolyHash.compute(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.scale.PolyHash.compute($c.toString())")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(child = c)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Code-point iteration — matches DuckDB's per-character ord(). */
  def compute(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  def polyHash(c: Column): Column =
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(c)))

  /** DuckDB mirror: fold over code points with the same arithmetic. */
  def sql(textExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($textExpr, ''), x -> CAST(ord(x) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % $Mod)"
}
