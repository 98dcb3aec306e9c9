package graft.scale

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise vector sum + count as a TypedImperativeAggregate — the
  * bounded form of a per-group centroid/mean update.
  *
  * The posexplode formulation (`posexplode(vec) → groupBy(key, pos) →
  * avg`) multiplies every input ROW by `dim` before the aggregate: at
  * dim = 64 that is a 64× row expansion through the scan stage and 64
  * buffer slots per key in the hash aggregate. This aggregate consumes
  * each vector in place — one buffer of `dim` doubles per key per task,
  * one shuffled row per (key, task) — so the update step's cost returns
  * to one scan of the vectors, same as the assignment step.
  *
  * Accumulation parity with the posexplode+avg plan: elements are
  * widened float→double exactly, added in row order within a partition,
  * and partial buffers merge element-wise — the same additions the
  * per-(key, pos) avg performed.
  *
  * Returns struct<n bigint, sums array<double>>; the caller divides for
  * the mean (one division per dimension, same as avg's sum/count).
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumBuffer] {

  private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _) => false
    case t => throw new IllegalArgumentException(s"VecSumAgg needs array<float|double>, got $t")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): VecSumBuffer = new VecSumBuffer

  override def update(buf: VecSumBuffer, input: InternalRow): VecSumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      buf.ensure(m)
      var j = 0
      if (elemIsDouble) {
        while (j < m) { buf.sums(j) += arr.getDouble(j); j += 1 }
      } else {
        while (j < m) { buf.sums(j) += arr.getFloat(j).toDouble; j += 1 }
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VecSumBuffer, other: VecSumBuffer): VecSumBuffer = {
    if (other.n > 0) {
      buf.ensure(other.sums.length)
      var j = 0
      while (j < other.sums.length) { buf.sums(j) += other.sums(j); j += 1 }
      buf.n += other.n
    }
    buf
  }

  override def eval(buf: VecSumBuffer): Any =
    InternalRow(buf.n, new GenericArrayData(buf.sums.map(java.lang.Double.valueOf)))

  override def serialize(buf: VecSumBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + buf.sums.length * 8)
    bb.putLong(buf.n)
    bb.putInt(buf.sums.length)
    var j = 0
    while (j < buf.sums.length) { bb.putDouble(buf.sums(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecSumBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new VecSumBuffer
    buf.n = bb.getLong
    val m = bb.getInt
    buf.ensure(m)
    var j = 0
    while (j < m) { buf.sums(j) = bb.getDouble; j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecSumAgg =
    copy(child = c(0))
}

/** (count, element-wise sums); dimension fixed by the first vector seen. */
final class VecSumBuffer {
  var n: Long = 0L
  var sums: Array[Double] = Array.emptyDoubleArray
  def ensure(m: Int): Unit =
    if (sums.length < m) sums = java.util.Arrays.copyOf(sums, m)
}

object VecSum {
  /** Column entry point: struct(n, sums) per group. */
  def vecSum(vec: Column): Column =
    GraftColumnBridge.column(
      VecSumAgg(GraftColumnBridge.expression(vec)).toAggregateExpression())
}
