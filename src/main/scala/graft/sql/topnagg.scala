package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Bounded-memory grouped top-N aggregate: keeps the N smallest (ord, id)
 * pairs per group with partial aggregation (map-side combine), then merges
 * partials — the exact partial/final shape of the reference's coprocessor
 * endpoints (reference: src/main/java/tech/stackable/gis/hbase/coprocessor/
 * KNNEndpoint.java:77-106 and TopXEndpoint.java:70-107 keep per-region
 * MinMaxPriorityQueues; the client merge the reference lacks is Spark's
 * final aggregation).
 *
 * vs. the window-rank formulation: the window shuffles and sorts EVERY row
 * of a group; this shuffles at most N rows per (map task × group) — the
 * difference between feasible and not at 100 TB with hot groups.
 *
 * Ordering is lexicographic on (ord, id) — total, so results are
 * deterministic under ties.
 */
case class TopNByOrd(ord: Expression, id: Expression, n: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopNBuffer] with ImplicitCastInputTypes {

  require(n > 0, s"n must be positive, got $n")

  override def children: Seq[Expression] = Seq(ord, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopNBuffer = new TopNBuffer(n)

  override def update(buf: TopNBuffer, input: InternalRow): TopNBuffer = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null)
      buf.insert(o.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopNBuffer, other: TopNBuffer): TopNBuffer = {
    other.foreach((o, i) => buf.insert(o, i))
    buf
  }

  override def eval(buf: TopNBuffer): Any = {
    val sorted = buf.sortedPairs
    new GenericArrayData(sorted.map { case (o, i) =>
      InternalRow(o, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopNBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopNBuffer = TopNBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNByOrd =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNByOrd =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopNByOrd =
    copy(ord = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topn_by_ord"
}

/**
 * Binary max-heap of (ord, id) pairs bounded at capacity n, ordered
 * lexicographically; the root is the LARGEST retained pair so admission is
 * one comparison (the reference's `dist < peekLast || size < count` test,
 * KNNEndpoint.java:95).
 */
final class TopNBuffer(val capacity: Int) {
  private var ords = new Array[Long](math.min(capacity, 16))
  private var ids = new Array[Long](math.min(capacity, 16))
  private var size = 0

  @inline private def gt(o1: Long, i1: Long, o2: Long, i2: Long): Boolean =
    o1 > o2 || (o1 == o2 && i1 > i2)

  def insert(o: Long, i: Long): Unit = {
    if (size < capacity) {
      if (size == ords.length) grow()
      ords(size) = o; ids(size) = i
      siftUp(size)
      size += 1
    } else if (gt(ords(0), ids(0), o, i)) {
      ords(0) = o; ids(0) = i
      siftDown(0)
    }
  }

  private def grow(): Unit = {
    val cap = math.min(capacity, ords.length * 2)
    ords = java.util.Arrays.copyOf(ords, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
  }

  private def siftUp(k0: Int): Unit = {
    var k = k0
    while (k > 0) {
      val p = (k - 1) >> 1
      if (gt(ords(k), ids(k), ords(p), ids(p))) {
        swap(k, p); k = p
      } else return
    }
  }

  private def siftDown(k0: Int): Unit = {
    var k = k0
    while (true) {
      val l = 2 * k + 1; val r = l + 1
      var m = k
      if (l < size && gt(ords(l), ids(l), ords(m), ids(m))) m = l
      if (r < size && gt(ords(r), ids(r), ords(m), ids(m))) m = r
      if (m == k) return
      swap(k, m); k = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val to = ords(a); ords(a) = ords(b); ords(b) = to
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def foreach(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < size) { f(ords(i), ids(i)); i += 1 }
  }

  def sortedPairs: Seq[(Long, Long)] = {
    val pairs = (0 until size).map(i => (ords(i), ids(i)))
    pairs.sorted
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * size)
    bb.putInt(capacity).putInt(size)
    var i = 0
    while (i < size) { bb.putLong(ords(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopNBuffer {
  def fromBytes(bytes: Array[Byte]): TopNBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopNBuffer(bb.getInt())
    val size = bb.getInt()
    var i = 0
    while (i < size) { buf.insert(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }
}

/**
 * Total-order-preserving long encoding of ANY double, so a double ordering
 * key (a distance, a score — including negative scores) can ride the
 * long-typed [[TopNByOrd]] heap unchanged. Raw IEEE 754 bits already order
 * correctly for non-negative doubles and place negatives (sign bit set =
 * negative long) below them, but inverted among themselves; XOR-ing with
 * `(bits >> 63) & Long.MaxValue` flips the magnitude bits of negatives
 * only, restoring a total order (and -0.0 < +0.0). The transform is its
 * own inverse, which [[SortableBitsToDouble]] exploits.
 */
case class DoubleSortableBits(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "double_sortable_bits"
  override protected def nullSafeEval(d: Any): Any = {
    val bits = java.lang.Double.doubleToRawLongBits(d.asInstanceOf[Double])
    bits ^ ((bits >> 63) & Long.MaxValue)
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, d =>
      s"(Double.doubleToRawLongBits($d) ^ ((Double.doubleToRawLongBits($d) >> 63) & Long.MAX_VALUE))")
  override protected def withNewChildInternal(c: Expression): DoubleSortableBits = copy(c)
}

/** Inverse of [[DoubleSortableBits]] (the bit transform is an involution). */
case class SortableBitsToDouble(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sortable_bits_to_double"
  override protected def nullSafeEval(l: Any): Any = {
    val s = l.asInstanceOf[Long]
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, l => s"Double.longBitsToDouble($l ^ (($l >> 63) & Long.MAX_VALUE))")
  override protected def withNewChildInternal(c: Expression): SortableBitsToDouble = copy(c)
}

/**
 * [[TopNByOrd]] with a STRING payload: keeps the N lexicographically
 * smallest (ord, payload) pairs per group with the same partial/final
 * bounded-heap shape. For payloads that start with the logical tie-break
 * key followed by a separator byte BELOW the key's alphabet (e.g.
 * `term 0x1F tf 0x1F df` over lowercase terms), binary payload order
 * equals tie-break-key order, so one aggregate carries the key AND its
 * side columns — no second join to recover them.
 */
case class TopNByOrdStr(ord: Expression, payload: Expression, n: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopNStrBuffer] with ImplicitCastInputTypes {

  require(n > 0, s"n must be positive, got $n")

  override def children: Seq[Expression] = Seq(ord, payload)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("payload", StringType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopNStrBuffer = new TopNStrBuffer(n)

  override def update(buf: TopNStrBuffer, input: InternalRow): TopNStrBuffer = {
    val o = ord.eval(input)
    val p = payload.eval(input)
    if (o != null && p != null)
      // clone: eval may return a buffer-backed UTF8String reused across rows
      buf.insert(o.asInstanceOf[Long],
        p.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone())
    buf
  }

  override def merge(buf: TopNStrBuffer, other: TopNStrBuffer): TopNStrBuffer = {
    other.foreach((o, p) => buf.insert(o, p))
    buf
  }

  override def eval(buf: TopNStrBuffer): Any =
    new GenericArrayData(buf.sortedPairs.map { case (o, p) =>
      InternalRow(o, p)
    }.toArray[Any])

  override def serialize(buf: TopNStrBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopNStrBuffer = TopNStrBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNByOrdStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNByOrdStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopNByOrdStr =
    copy(ord = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "topn_by_ord_str"
}

/** Bounded max-heap of (ord, UTF8String payload), lexicographic —
  * [[TopNBuffer]] with a binary-comparable payload slot. */
final class TopNStrBuffer(val capacity: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  private var ords = new Array[Long](math.min(capacity, 16))
  private var pays = new Array[UTF8String](math.min(capacity, 16))
  private var size = 0

  @inline private def gt(o1: Long, p1: UTF8String, o2: Long, p2: UTF8String): Boolean =
    o1 > o2 || (o1 == o2 && p1.compareTo(p2) > 0)

  def insert(o: Long, p: UTF8String): Unit = {
    if (size < capacity) {
      if (size == ords.length) grow()
      ords(size) = o; pays(size) = p
      siftUp(size)
      size += 1
    } else if (gt(ords(0), pays(0), o, p)) {
      ords(0) = o; pays(0) = p
      siftDown(0)
    }
  }

  private def grow(): Unit = {
    val cap = math.min(capacity, ords.length * 2)
    ords = java.util.Arrays.copyOf(ords, cap)
    pays = java.util.Arrays.copyOf(pays, cap)
  }

  private def siftUp(k0: Int): Unit = {
    var k = k0
    while (k > 0) {
      val p = (k - 1) >> 1
      if (gt(ords(k), pays(k), ords(p), pays(p))) { swap(k, p); k = p }
      else return
    }
  }

  private def siftDown(k0: Int): Unit = {
    var k = k0
    while (true) {
      val l = 2 * k + 1; val r = l + 1
      var m = k
      if (l < size && gt(ords(l), pays(l), ords(m), pays(m))) m = l
      if (r < size && gt(ords(r), pays(r), ords(m), pays(m))) m = r
      if (m == k) return
      swap(k, m); k = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val to = ords(a); ords(a) = ords(b); ords(b) = to
    val tp = pays(a); pays(a) = pays(b); pays(b) = tp
  }

  def foreach(f: (Long, org.apache.spark.unsafe.types.UTF8String) => Unit): Unit = {
    var i = 0
    while (i < size) { f(ords(i), pays(i)); i += 1 }
  }

  def sortedPairs: Seq[(Long, org.apache.spark.unsafe.types.UTF8String)] =
    (0 until size).map(i => (ords(i), pays(i)))
      .sortBy(identity)(Ordering.Tuple2(Ordering.Long,
        Ordering.comparatorToOrdering(
          java.util.Comparator.naturalOrder[org.apache.spark.unsafe.types.UTF8String]())))

  def toBytes: Array[Byte] = {
    var bytes = 8
    var i = 0
    while (i < size) { bytes += 12 + pays(i).numBytes(); i += 1 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(capacity).putInt(size)
    i = 0
    while (i < size) {
      bb.putLong(ords(i))
      val pb = pays(i).getBytes
      bb.putInt(pb.length).put(pb)
      i += 1
    }
    bb.array()
  }
}

object TopNStrBuffer {
  def fromBytes(bytes: Array[Byte]): TopNStrBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopNStrBuffer(bb.getInt())
    val size = bb.getInt()
    var i = 0
    while (i < size) {
      val o = bb.getLong()
      val pb = new Array[Byte](bb.getInt())
      bb.get(pb)
      buf.insert(o, org.apache.spark.unsafe.types.UTF8String.fromBytes(pb))
      i += 1
    }
    buf
  }
}
