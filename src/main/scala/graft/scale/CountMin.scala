package graft.scale

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — point-frequency
  * estimates in O(depth·width) space with one-sided error: the estimate
  * NEVER undercounts, and overcounts by more than 2n/width on any key
  * with probability ≤ 2^-depth. The complement of the Misra–Gries
  * counters: MG enumerates the heavy keys it kept, CMS answers a point
  * query for ANY key, which is what makes it a candidate GATE — probe a
  * row's key map-side against the broadcast sketch and only candidate
  * rows (true heavies + the bounded-overcount sliver) enter the exact
  * shuffle.
  *
  * Split like `Bloom`: `sketch` is a mergeable TypedImperativeAggregate
  * producing the serialized counter table (the build — one pass,
  * executor-merged, O(d·w) per partial regardless of skew); `estimate`
  * is a scalar expression over the collected bytes (the probe —
  * deserialized once per task, codegen'd via a reference object, no
  * shuffle, no join).
  */
object CountMin {

  /** splitmix64 finalizer over (key ^ row seed) — d pairwise-independent
    * enough hash rows, deterministic across runs and engines.
    */
  private[scale] def hash(x: Long, row: Int, width: Int): Int = {
    var z = x ^ (0x9E3779B97F4A7C15L * (row + 1))
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (((z % width) + width) % width).toInt
  }

  /** Aggregate a LongType key column into a serialized sketch. */
  def sketch(key: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinAgg(GraftColumnBridge.expression(key), depth, width)
        .toAggregateExpression())

  /** Point-estimate the frequency of `key` against collected sketch
    * bytes (min over the depth rows; ≥ the true count always).
    */
  def estimate(sketchBytes: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(
      CmsEstimate(GraftColumnBridge.expression(key), sketchBytes))
}

final class CMSBuffer(val depth: Int, val width: Int) {
  val counts = new Array[Long](depth * width)

  def add(x: Long): Unit = {
    var i = 0
    while (i < depth) {
      counts(i * width + CountMin.hash(x, i, width)) += 1L
      i += 1
    }
  }

  def mergeFrom(other: CMSBuffer): Unit = {
    var j = 0
    while (j < counts.length) { counts(j) += other.counts(j); j += 1 }
  }

  def estimate(x: Long): Long = {
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counts(i * width + CountMin.hash(x, i, width))
      if (c < est) est = c
      i += 1
    }
    est
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + counts.length * 8)
    bb.putInt(depth).putInt(width)
    var j = 0
    while (j < counts.length) { bb.putLong(counts(j)); j += 1 }
    bb.array()
  }
}

object CMSBuffer {
  def fromBytes(bytes: Array[Byte]): CMSBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CMSBuffer(bb.getInt, bb.getInt)
    var j = 0
    while (j < buf.counts.length) { buf.counts(j) = bb.getLong; j += 1 }
    buf
  }
}

case class CountMinAgg(
    key: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMSBuffer] {

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): CMSBuffer = new CMSBuffer(depth, width)

  override def update(buf: CMSBuffer, input: InternalRow): CMSBuffer = {
    val v = key.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: CMSBuffer, other: CMSBuffer): CMSBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: CMSBuffer): Any = buf.toBytes

  override def serialize(buf: CMSBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CMSBuffer = CMSBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(key = c(0))
}

/** Scalar probe: min-over-rows estimate of `child`'s frequency in the
  * sketch whose bytes ride the plan as a constructor param (the Bloom
  * pattern — deserialized once lazily per task, not per row). Codegen
  * calls back into this instance via a reference object, so the probe
  * stays inside whole-stage codegen.
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  @transient private lazy val buf = CMSBuffer.fromBytes(sketchBytes)

  def estimate(x: Long): Long = buf.estimate(x)

  override protected def nullSafeEval(input: Any): Any =
    estimate(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", this, classOf[CmsEstimate].getName)
    defineCodeGen(ctx, ev, c => s"$ref.estimate($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
