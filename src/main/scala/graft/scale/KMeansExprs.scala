package graft.scale

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codebook argmin as ONE constant-table expression.
  *
  * The composed form — `array_min(array(struct(d2(v,c0),0), ...,
  * struct(d2(v,ck),k)))` with k literal centroid arrays — generates
  * O(k·dim) Java per evaluation site. At k=64 the fused stage's
  * `processNext` crossed ~47 KB of bytecode: HotSpot refuses to JIT
  * methods beyond `DontCompileHugeMethods` (8 000 bytecodes), so the
  * WHOLE fused stage — including a broadcast-join pair loop downstream
  * of the projection — ran in the bytecode interpreter, a measured
  * ~50× per-row/per-pair slowdown (sf10 stress, round 7: the
  * `knngraph_cells64` arm sat at 23 core-HOURS before being killed;
  * the materialized-input control ran in 0.16 s at sf0.1 vs 5 s fused).
  *
  * This expression holds the codebook as a referenced `double[][]`
  * (plus precomputed self-dots), so the generated code is two short
  * loops regardless of k — the stage stays far under the JIT cliff and
  * the per-row cost is the unavoidable k·dim multiply-adds.
  *
  * Numeric semantics are bit-identical to the composed form and to the
  * DuckDB oracle's replay (`list_dot_product(v,v) - 2.0 *
  * list_dot_product(v,c) + list_dot_product(c,c)` ranked by (d2, cid)):
  *  - every dot accumulates left-to-right in double (floats widened
  *    per element, exactly like DotProduct);
  *  - cc is accumulated once per centroid at construction with the
  *    same loop constant-folding evaluated;
  *  - d2 = (vv - 2.0*dvc) + cc, the same association as the Column
  *    form;
  *  - the argmin compares with java.lang.Double.compare — the ordering
  *    array_min uses for doubles (NaN largest, -0.0 < 0.0) — and a
  *    strict-less keep over cid-ascending centroids reproduces the
  *    lowest-cid tiebreak.
  *
  * Returns struct(d: double, c: int) — same shape/field order as the
  * composed `__best` struct.
  */
case class NearestCentroid(
    child: Expression,
    cids: Array[Int],
    cents: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"NearestCentroid requires array<float|double>, got $dt")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Self-dots, accumulated left-to-right like DotProduct(c, c). */
  @transient private lazy val ccs: Array[Double] = cents.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val vn = v.numElements()
    val fl = isFloat
    def get(j: Int): Double = if (fl) v.getFloat(j).toDouble else v.getDouble(j)
    var vv = 0.0
    var j = 0
    while (j < vn) { val x = get(j); vv += x * x; j += 1 }
    var bestD = Double.NaN
    var bestC = 0
    var first = true
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(vn, cv.length)
      var dvc = 0.0
      j = 0
      while (j < n) { dvc += get(j) * cv(j); j += 1 }
      val d2 = (vv - 2.0 * dvc) + ccs(c)
      if (first || java.lang.Double.compare(d2, bestD) < 0) {
        bestD = d2; bestC = cids(c); first = false
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val ccsRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
    nullSafeCodeGen(ctx, ev, v => {
      val vn = ctx.freshName("vn")
      val vv = ctx.freshName("vv")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val dvc = ctx.freshName("dvc")
      val d2 = ctx.freshName("d2")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val first = ctx.freshName("first")
      val x = ctx.freshName("x")
      s"""
         |int $vn = $v.numElements();
         |double $vv = 0.0;
         |for (int $j = 0; $j < $vn; $j++) {
         |  double $x = (double) $v.$get($j);
         |  $vv += $x * $x;
         |}
         |double $bestD = Double.NaN;
         |int $bestC = 0;
         |boolean $first = true;
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cv = $centsRef[$c];
         |  int $n = java.lang.Math.min($vn, $cv.length);
         |  double $dvc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dvc += (double) $v.$get($j) * $cv[$j];
         |  }
         |  double $d2 = ($vv - 2.0 * $dvc) + $ccsRef[$c];
         |  if ($first || java.lang.Double.compare($d2, $bestD) < 0) {
         |    $bestD = $d2; $bestC = $cidsRef[$c]; $first = false;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $bestD, $bestC });
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  // Array-typed case-class params break the default equals/toString.
  override def equals(o: Any): Boolean = o match {
    case nc: NearestCentroid =>
      nc.child == child && nc.cids.sameElements(cids) &&
        nc.cents.length == cents.length &&
        nc.cents.indices.forall(i => nc.cents(i).sameElements(cents(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cids)
  override def toString: String =
    s"nearest_centroid($child, k=${cents.length})"
  override def sql: String = s"nearest_centroid(${child.sql}, k=${cents.length})"
}

object KMeansExprs {
  /** struct(d, c): squared L2 distance to, and id of, the nearest
    * centroid. `centroids` is the driver-held (cid, vector) codebook;
    * evaluated as one constant-table loop (see NearestCentroid).
    */
  def nearestCentroid(v: Column, centroids: KMeans.Centroids): Column = {
    val sorted = centroids.sortBy(_._1)
    GraftColumnBridge.column(NearestCentroid(
      GraftColumnBridge.expression(v),
      sorted.map(_._1).toArray,
      sorted.map(_._2.toArray).toArray))
  }
}
