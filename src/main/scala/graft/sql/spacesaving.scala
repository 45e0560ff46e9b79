package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Space-Saving heavy hitters (Metwally, Agrawal, El Abbadi, ICDT'05) as a
 * partial/final Spark aggregate — the one-pass frequent-items operator for
 * streams and corpora whose vocabulary does not fit a groupBy: each map
 * task keeps at most `capacity` counters, the SHUFFLE carries
 * capacity-bounded serialized summaries (never a per-item count stream),
 * and the final merge preserves the classic guarantees
 *
 *   true(x) ≤ est(x)              for every tracked x, and
 *   est(x) − err(x) ≤ true(x)     (err is the possible overcount),
 *
 * with every item of true frequency > N/capacity guaranteed tracked.
 * Merging follows the mergeable-summaries construction (Agarwal, Cormode
 * et al., PODS'12): entries of one summary are offered into the other
 * carrying their (count, err); an eviction replaces the minimum-count
 * entry and inherits its count as both floor and error — the same
 * overestimate argument as the streaming update, so bounds ADD across
 * partials instead of breaking. Eviction order is deterministic
 * ((count, item) lexicographic victim; merge offers in sorted order), so
 * with `capacity` ≥ the distinct-item count no eviction ever fires and
 * the aggregate degenerates to EXACT counts with err 0 — the regime the
 * oracle gate runs in; the approximate regime's bounds are spec-tested.
 *
 * Compare [[TopNByOrd]]: that is exact top-k over PRE-AGGREGATED rows;
 * this is approximate top-k over RAW occurrences without any per-item
 * aggregation — the difference between needing a (token, count) shuffle
 * and not, which is what makes it viable as a first-pass over 100 TB of
 * raw tokens. Eviction scans the counter table (O(capacity)); the
 * intended operating point (capacity ≤ 2^16, heavy-hitter-skewed input
 * where most updates hit tracked items) keeps that branch off the hot
 * path.
 */
case class SpaceSavingTopK(item: Expression, capacity: Int, k: Int,
                           mutableAggBufferOffset: Int = 0,
                           inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] with ImplicitCastInputTypes {

  require(capacity >= 1, s"capacity must be positive, got $capacity")
  require(k >= 1 && k <= capacity, s"k must be in [1, capacity], got $k")

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false),
      StructField("max_err", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val s = item.eval(input)
    if (s != null) buf.offer(s.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.absorb(other)
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any =
    new GenericArrayData(buf.top(k).map { case (item, cnt, err) =>
      InternalRow(UTF8String.fromString(item), cnt, err)
    }.toArray[Any])

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(item = newChildren(0))
  override def prettyName: String = "space_saving_topk"
}

/** Counter table for [[SpaceSavingTopK]]: item → (est_count, max_err),
  * bounded at `capacity` entries by minimum-count eviction. */
final class SpaceSavingBuffer(val capacity: Int) {
  private val m = new java.util.HashMap[String, Array[Long]]()

  /** Add `cnt` observations of `item` with prior overcount `err`
    * (streaming update: cnt=1, err=0). An eviction victim is the
    * (count, item)-lexicographic minimum — deterministic; the newcomer
    * inherits the victim's count as floor and error. */
  def offer(item: String, cnt: Long, err: Long): Unit = {
    val cur = m.get(item)
    if (cur != null) { cur(0) += cnt; cur(1) += err }
    else if (m.size < capacity) m.put(item, Array(cnt, err))
    else {
      var minK: String = null
      var minC = Long.MaxValue
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue()(0)
        if (c < minC || (c == minC && (minK == null || e.getKey.compareTo(minK) < 0))) {
          minC = c; minK = e.getKey
        }
      }
      m.remove(minK)
      m.put(item, Array(minC + cnt, minC + err))
    }
  }

  /** Merge `other` in: offer its entries (sorted, for deterministic
    * eviction order) carrying their counts and errors. */
  def absorb(other: SpaceSavingBuffer): Unit =
    other.sortedEntries.foreach { case (item, cnt, err) => offer(item, cnt, err) }

  /** All entries sorted by (count DESC, item ASC) — the deterministic
    * merge/emit order. */
  def sortedEntries: Seq[(String, Long, Long)] = {
    val out = new scala.collection.mutable.ArrayBuffer[(String, Long, Long)](m.size)
    m.forEach((k, v) => out += ((k, v(0), v(1))))
    out.sortBy { case (item, cnt, _) => (-cnt, item) }.toSeq
  }

  def top(k: Int): Seq[(String, Long, Long)] = sortedEntries.take(k)

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(m.size)
    m.forEach { (k, v) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b)
      out.writeLong(v(0)); out.writeLong(v(1))
    }
    out.flush()
    bos.toByteArray
  }
}

/** Broadcast-held Bloom filter over a persisted index's bucket keys: the
  * serialized bytes ship once per executor and the filter deserializes
  * lazily on first use (same holder pattern as `LmState`). */
final class BloomState(bytes: org.apache.spark.broadcast.Broadcast[Array[Byte]])
    extends Serializable {
  @transient lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new ByteArrayInputStream(bytes.value))
}

/** Scan-local Bloom membership test over long keys — the pre-screen that
  * lets an arriving batch drop bucket keys the corpus index cannot
  * contain BEFORE any join or driver collect. Bloom filters have no
  * false negatives, so a screen never changes results — false positives
  * only pass through to the join that would have dropped them anyway. */
case class BloomKeyMightContain(child: Expression, state: BloomState)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_key_might_contain"
  override protected def nullSafeEval(k: Any): Any =
    state.bloom.mightContainLong(k.asInstanceOf[Long])
  override protected def withNewChildInternal(c: Expression): BloomKeyMightContain =
    copy(child = c)
}

object SpaceSavingBuffer {
  def fromBytes(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    // capacity is re-imposed by the merging side; a deserialized partial
    // only ever flows into absorb(), so its own table is exactly its entries
    val buf = new SpaceSavingBuffer(math.max(n, 1))
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val item = new String(b, "UTF-8")
      val cnt = in.readLong()
      val err = in.readLong()
      buf.offer(item, cnt, err)
      i += 1
    }
    buf
  }
}
