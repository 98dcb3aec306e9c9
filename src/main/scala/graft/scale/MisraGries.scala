package graft.scale

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra–Gries heavy-hitter sketch as a TypedImperativeAggregate — exact
  * `groupBy(key).count()` needs one counter PER DISTINCT KEY; this keeps
  * at most `k` counters per group and still guarantees every key with
  * frequency > n/(k+1) survives, undercounted by at most n/(k+1).
  * Mergeable (Agarwal et al., "Mergeable Summaries"): combine counters,
  * then subtract the (k+1)-th largest count and drop non-positives —
  * the map-side partials stay O(k) and the guarantee composes across
  * partitions, so the shuffle is O(groups·k) regardless of key skew.
  *
  * When a group's distinct-key count never exceeds `k`, no decrement
  * ever fires and the sketch IS the exact count table — the regime the
  * oracle query pins; the lossy regime's error bound is property-tested
  * in MisraGriesSpec.
  *
  * Returns array<struct<id bigint, est bigint>> sorted (est desc, id
  * asc).
  */
case class MisraGriesAgg(
    key: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("est", LongType))),
    containsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = key.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MGBuffer): Any =
    new GenericArrayData(buf.sortedEntries.map { case (id, est) => InternalRow(id, est) })

  override def serialize(buf: MGBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MGBuffer = MGBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(key = c(0))
}

final class MGBuffer(val k: Int) {
  private[scale] val counts = new java.util.HashMap[Long, Long]()

  /** MG update generalized to weighted adds (needed for merge). */
  def add(id: Long, w: Long): Unit = {
    // getOrDefault: a bare get() would unbox null for missing keys
    if (counts.containsKey(id)) counts.put(id, counts.getOrDefault(id, 0L) + w)
    else if (counts.size < k) counts.put(id, w)
    else {
      // decrement-all by the smallest of (w, min counter) repeatedly is
      // equivalent to: find how much can be absorbed, then either the
      // new key enters with a remainder or all shrink by w
      val it = counts.values().iterator()
      var minC = Long.MaxValue
      while (it.hasNext) minC = math.min(minC, it.next())
      val dec = math.min(w, minC)
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue - dec <= 0) eit.remove() else e.setValue(e.getValue - dec)
      }
      if (w - dec > 0) add(id, w - dec)
    }
  }

  /** Mergeable-summaries combine: sum counters, keep top-k by count,
    * subtract the (k+1)-th largest from the survivors.
    */
  def mergeFrom(other: MGBuffer): Unit = {
    val oit = other.counts.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var j = 0
      while (vit.hasNext) { vals(j) = vit.next(); j += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(counts.size - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue - cut <= 0) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  def sortedEntries: Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](counts.size)
    val eit = counts.entrySet().iterator()
    var j = 0
    while (eit.hasNext) { val e = eit.next(); out(j) = (e.getKey, e.getValue); j += 1 }
    out.sortWith { case ((i1, c1), (i2, c2)) => c1 > c2 || (c1 == c2 && i1 < i2) }
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + counts.size * 16)
    bb.putInt(counts.size)
    val eit = counts.entrySet().iterator()
    while (eit.hasNext) { val e = eit.next(); bb.putLong(e.getKey); bb.putLong(e.getValue) }
    bb.array()
  }
}

object MGBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): MGBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(k)
    var j = 0
    while (j < n) { buf.counts.put(bb.getLong, bb.getLong); j += 1 }
    buf
  }
}

object MisraGries {
  /** Column entry point: heavy-hitter counters, array<struct<id, est>>. */
  def heavyHitters(key: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGriesAgg(GraftColumnBridge.expression(key), k).toAggregateExpression())
}
