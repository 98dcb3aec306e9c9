package graft.scale

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a TypedImperativeAggregate — the scalable form of
  * grouped top-k.
  *
  * The window formulation (`row_number over (partition by key order by
  * score desc) <= k`) shuffles and sorts EVERY row of every group. This
  * aggregate keeps a k-element bound during partial aggregation, so each
  * map task ships at most k (score, id) pairs per key — at 100 TB the
  * shuffle shrinks from O(rows) to O(keys·k), and no per-group sort ever
  * materializes.
  *
  * Ordering: score descending, id ascending on ties (total order ⇒
  * deterministic, oracle-comparable results). Returns
  * array<struct<score double, id bigint>> sorted in rank order.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(score = c(0), id = c(1))
}

/** Bounded buffer: flat arrays, worst entry tracked by linear scan
  * (k is small — single-digit to low hundreds — so a heap's pointer
  * chasing loses to a scan over two primitive arrays).
  */
final class TopKBuffer(val k: Int) {
  private var scores = new Array[Double](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var n = 0

  /** a-entry beats b-entry: higher score, or equal score and lower id. */
  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def worstIndex: Int = {
    var w = 0
    var j = 1
    while (j < n) {
      if (beats(scores(w), ids(w), scores(j), ids(j))) w = j
      j += 1
    }
    w
  }

  def insert(s: Double, i: Long): Unit = {
    if (n < k) {
      if (n == scores.length) {
        scores = java.util.Arrays.copyOf(scores, math.min(k, scores.length * 2))
        ids = java.util.Arrays.copyOf(ids, math.min(k, ids.length * 2))
      }
      scores(n) = s; ids(n) = i; n += 1
    } else {
      val w = worstIndex
      if (beats(s, i, scores(w), ids(w))) { scores(w) = s; ids(w) = i }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.n) { insert(other.scores(j), other.ids(j)); j += 1 }
  }

  def sortedEntries: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(j => (scores(j), ids(j)))
    out.sortWith { case ((s1, i1), (s2, i2)) => beats(s1, i1, s2, i2) }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var j = 0
    while (j < n) { bb.putDouble(scores(j)); bb.putLong(ids(j)); j += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }
}

/** String-keyed variant of TopKAgg — top-k (score, string id) per group
  * with the identical bounded-buffer contract (score desc, id asc binary
  * tiebreak: UTF8String.compareTo is an unsigned byte compare, the same
  * total order as DuckDB's default binary collation, so results stay
  * oracle-comparable). The payload for grouped "top terms / top URLs /
  * top domains" shapes where the ranked id is text.
  */
case class TopKStrAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] {
  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", StringType))),
    containsNull = false)

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // clone: the UTF8String may alias a reused row buffer
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKStrBuffer): Any =
    new GenericArrayData(buf.sortedEntries.map { case (s, i) => InternalRow(s, i) })

  override def serialize(buf: TopKStrBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKStrBuffer =
    TopKStrBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKStrAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStrAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKStrAgg =
    copy(score = c(0), id = c(1))
}

final class TopKStrBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  private var scores = new Array[Double](math.min(k, 16))
  private var ids = new Array[UTF8String](math.min(k, 16))
  private[scale] var n = 0

  @inline private def beats(s1: Double, i1: UTF8String, s2: Double, i2: UTF8String): Boolean =
    s1 > s2 || (s1 == s2 && i1.compareTo(i2) < 0)

  private def worstIndex: Int = {
    var w = 0
    var j = 1
    while (j < n) {
      if (beats(scores(w), ids(w), scores(j), ids(j))) w = j
      j += 1
    }
    w
  }

  def insert(s: Double, i: UTF8String): Unit = {
    if (n < k) {
      if (n == scores.length) {
        scores = java.util.Arrays.copyOf(scores, math.min(k, scores.length * 2))
        ids = java.util.Arrays.copyOf(ids, math.min(k, ids.length * 2))
      }
      scores(n) = s; ids(n) = i; n += 1
    } else {
      val w = worstIndex
      if (beats(s, i, scores(w), ids(w))) { scores(w) = s; ids(w) = i }
    }
  }

  def mergeFrom(other: TopKStrBuffer): Unit = {
    var j = 0
    while (j < other.n) { insert(other.scoreAt(j), other.idAt(j)); j += 1 }
  }
  private[scale] def scoreAt(j: Int): Double = scores(j)
  private[scale] def idAt(j: Int): UTF8String = ids(j)

  def sortedEntries: Array[(Double, UTF8String)] = {
    val out = Array.tabulate(n)(j => (scores(j), ids(j)))
    out.sortWith { case ((s1, i1), (s2, i2)) => beats(s1, i1, s2, i2) }
  }

  def toBytes: Array[Byte] = {
    var size = 4
    var j = 0
    while (j < n) { size += 8 + 4 + ids(j).numBytes(); j += 1 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(n)
    j = 0
    while (j < n) {
      bb.putDouble(scores(j))
      val b = ids(j).getBytes
      bb.putInt(b.length)
      bb.put(b)
      j += 1
    }
    bb.array()
  }
}

object TopKStrBuffer {
  import org.apache.spark.unsafe.types.UTF8String
  def fromBytes(k: Int, bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKStrBuffer(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.insert(s, UTF8String.fromBytes(b))
      j += 1
    }
    buf
  }
}

object TopK {
  /** Column entry point: top-k (score, id) pairs per group, rank order. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKAgg(GraftColumnBridge.expression(score), GraftColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Top-k with a STRING id (top terms/URLs/domains per group). */
  def topKStr(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKStrAgg(GraftColumnBridge.expression(score), GraftColumnBridge.expression(id), k)
        .toAggregateExpression())
}
