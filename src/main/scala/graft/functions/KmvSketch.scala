package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a
  * `TypedImperativeAggregate` — the imperative mutable-buffer UDAF
  * surface (SURVEY.md §2.11, complementing the typed `Aggregator`).
  *
  * The sketch keeps the k smallest md5-derived hashes of the values seen;
  * with the hash space normalized to (0,1], the classic estimator is
  * DV ≈ (k−1)/h_(k) where h_(k) is the k-th smallest normalized hash.
  * Fewer than k distinct hashes → the buffer IS the distinct set and the
  * count is exact.
  *
  * Unlike HLL (`approx_count_distinct`), every ingredient here is
  * engine-replayable: the hash is [[TextHashing.hash15]] (md5 hex fold),
  * so the DuckDB oracle can rank the same hashes and compute the same
  * estimate to the bit — an *oracle-checkable* sketch. Buffers merge by
  * union + truncate-to-k: partial aggregation works and the result is
  * independent of partitioning (set semantics).
  *
  * Scale: O(k) memory per group, O(log k) per row, mergeable — the sketch
  * shape that replaces exact COUNT(DISTINCT)'s shuffle of every value at
  * 100 TB.
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case s: UTF8String => TextHashing.hash15(s.toString)
        case other => TextHashing.hash15(other.toString)
      }
      buf.add(h)
      while (buf.size > k) buf.remove(buf.last())
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    a.addAll(b)
    while (a.size > k) a.remove(a.last())
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else {
      // hashes are uniform in [0, P); normalize the k-th smallest
      val hk = buf.last().toDouble / TextHashing.P.toDouble
      (k - 1).toDouble / hk
    }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}
