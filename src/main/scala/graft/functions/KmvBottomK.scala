package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k DISTINCT values of a long column as a native aggregate — the
  * KMV / theta-sketch building block
  * ([[graft.operators.Sketches.kmvDistinct]]'s estimator reads it out).
  *
  * Why custom: relationally, a per-group bottom-k needs either a
  * (group, value) DISTINCT shuffle followed by a per-group sort window —
  * the full distinct pair set moves — or an unbounded `collect_set`. This
  * `TypedImperativeAggregate` (the same Spark pattern as
  * HyperLogLogPlusPlus / percentile) keeps a ≤ k-element sorted set PER
  * GROUP PER PARTITION: partial aggregation runs map-side, the shuffle
  * carries at most k longs per (group, partition), and merge is the KMV
  * union algebra (union the sets, re-trim to k — min is associative, so
  * merged partials equal the bottom-k of the raw data exactly).
  *
  * The buffer is a `java.util.TreeSet` — dedup and order in one
  * structure; insert is O(log k) and values above the current k-th are
  * rejected in O(log k) without growing the set. Returns the ascending
  * long array (size ≤ k); `size(...)` and `element_at(..., size)` read
  * out n_kept and the k-th minimum.
  */
case class KmvBottomK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, s"graft_kmv_bottomk needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_kmv_bottomk requires BIGINT input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buffer: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // reject values past the saturated k-th min without mutating
    if (buffer.size() < k) { buffer.add(v); () }
    else if (v < buffer.last()) {
      if (buffer.add(v)) { buffer.pollLast(); () }
    }
  }

  override def update(buffer: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next().longValue())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size())
    var i = 0
    val it = buffer.iterator()
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out) // ascending: TreeSet natural order
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.size() * 8)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val set = new java.util.TreeSet[java.lang.Long]()
    while (bb.remaining() >= 8) set.add(bb.getLong())
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvBottomK =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv_bottomk"
}
