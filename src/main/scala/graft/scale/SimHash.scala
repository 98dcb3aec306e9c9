package graft.scale

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized text — a custom Catalyst
  * `Expression` (SURVEY.md §4: the scale tier is the one place custom
  * expressions are warranted; a per-row HOF formulation would allocate a
  * 64-element array per token).
  *
  * Algorithm: FNV-1a 64-bit hash per token; each hash votes ±1 on each of
  * 64 bit positions; the sign of each position's tally forms the output
  * bit. Near-identical documents land within a few bits of Hamming
  * distance. Deterministic — no seed state, safe for oracle-free
  * rows-only checks and unit goldens.
  *
  * Codegen: participates in whole-stage codegen via doGenCode calling the
  * static eval helper (one virtual-free static call per row, no boxing of
  * the hot loop).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"SimHash64 requires STRING input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.scale.SimHash64.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv1a(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def compute(text: String): Long = {
    val votes = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          val h = fnv1a(text.substring(start, i))
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level entry point. */
  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))

  /** The 120 nibble-pair sub-band keys of a signature, as
    * `nib_idx * 256 + (nib_i << 4 | nib_j)` ints — the hot-bucket
    * re-banding tier of q_simhash_pairs. A codegen'd kernel loop, NOT a
    * 120-struct literal array expression: the expression form generated
    * 37 KB of bytecode (measured, RegistrySweepSpec r9) — past HotSpot's
    * 8 000-bytecode compile refusal the whole fused stage runs
    * interpreted. Generated code here is O(1) in the band count (the
    * NearestCentroid precedent).
    */
  def nibblePairBands(sig: Long): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = new Array[Int](120)
    var k = 0
    var i = 0
    while (i < 16) {
      var j = i + 1
      while (j < 16) {
        out(k) = k * 256 +
          ((((sig >>> (i * 4)) & 15L) << 4) | ((sig >>> (j * 4)) & 15L)).toInt
        k += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Column-level entry point for [[nibblePairBands]]. */
  def nibbleBands(c: Column): Column =
    GraftColumnBridge.column(NibblePairBands(GraftColumnBridge.expression(c)))
}

/** See [[SimHash64.nibblePairBands]]. */
case class NibblePairBands(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"NibblePairBands requires BIGINT input, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    SimHash64.nibblePairBands(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.scale.SimHash64.nibblePairBands($c)")
  override protected def withNewChildInternal(newChild: Expression): NibblePairBands =
    copy(child = newChild)
}
