package graft.scale

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd double-precision dot product over array<float>/array<double>.
  *
  * The HOF formulation (zip_with + aggregate) is evaluated interpreted —
  * per-row lambda dispatch dominates similarity scans. This expression
  * keeps the exact same numeric semantics (cast each element to double,
  * multiply, accumulate left-to-right — bit-identical to the DuckDB
  * oracle's list_dot_product over double lists) but runs as a tight
  * static loop inside whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes() = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"DotProduct requires array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (isFloat(left) && isFloat(right)) {
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      def get(d: ArrayData, fl: Boolean, j: Int): Double =
        if (fl) d.getFloat(j).toDouble else d.getDouble(j)
      val lf = isFloat(left); val rf = isFloat(right)
      while (i < n) { acc += get(x, lf, i) * get(y, rf, i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object VectorOps {
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** array<double> of dot(v, rows(k)) for every row of a driver-held
    * matrix — ONE constant-table expression instead of k inline
    * dot-against-literal columns. Same JIT-cliff rationale as
    * NearestCentroid (KMeansExprs.scala): k separate literal dots put
    * the fused stage's generated method past HotSpot's 8 000-bytecode
    * compile refusal once k × dim is large (measured: the 16×64 JL
    * scoring per query ran interpreted at ~264 µs/row in the sf10
    * stress). Each component accumulates left-to-right in double —
    * bit-identical to DotProduct(v, typedLit(rows(k))).
    */
  def matVec(v: Column, rows: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      MatVecDot(GraftColumnBridge.expression(v), rows.map(_.toArray).toArray))
}

/** See VectorOps.matVec. */
case class MatVecDot(child: Expression, rows: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"MatVecDot requires array<float|double>, got $dt")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val fl = isFloat
    val out = new Array[Double](rows.length)
    var k = 0
    while (k < rows.length) {
      val r = rows(k)
      val n = math.min(vn, r.length)
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += (if (fl) v.getFloat(j).toDouble else v.getDouble(j)) * r(j)
        j += 1
      }
      out(k) = acc
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val rowsRef = ctx.addReferenceObj("rows", rows, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val vn = ctx.freshName("vn")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val r = ctx.freshName("r")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |int $vn = $v.numElements();
         |double[] $out = new double[$rowsRef.length];
         |for (int $k = 0; $k < $rowsRef.length; $k++) {
         |  double[] $r = $rowsRef[$k];
         |  int $n = java.lang.Math.min($vn, $r.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += (double) $v.$get($j) * $r[$j];
         |  }
         |  $out[$k] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecDot =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case m: MatVecDot =>
      m.child == child && m.rows.length == rows.length &&
        m.rows.indices.forall(i => m.rows(i).sameElements(rows(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + rows.length
  override def toString: String = s"mat_vec_dot($child, k=${rows.length})"
  override def sql: String = s"mat_vec_dot(${child.sql}, k=${rows.length})"
}
