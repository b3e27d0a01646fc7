package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** kmv_sketch(hash, k) → array<long> — the k SMALLEST DISTINCT hash
  * values of the group, ascending: a KMV / bottom-k distinct-value
  * synopsis (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07).
  *
  * Where HLL answers only "how many distinct", the KMV sketch is a
  * uniform SAMPLE of the distinct-value space, so two groups' sketches
  * COMPOSE: the k smallest of a union are exactly the k smallest of the
  * two sketches' union, which makes set-overlap estimation (Jaccard,
  * union cardinality) a pure array computation over sketch pairs — the
  * corpus-overlap question at 100 TB without ever joining the corpora.
  *
  * Mergeable by construction (merge = union + retake bottom-k), so it
  * partial-aggregates map-side under ObjectHashAggregate: each task
  * reduces its slice to ≤ k longs before the shuffle, and the same
  * aggregate runs unchanged as a streaming state. Bounded state: a
  * TreeSet of ≤ k longs (dedup is the set property — a hot duplicate
  * value costs O(log k), not memory). NULL hashes are ignored (SQL
  * aggregate convention). Determinism: the result depends only on the
  * SET of input hashes — partitioning-invariant, hash-gateable. */
case class KmvSketch(hashExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]] {
  require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) buf += h
    else if (h < buf.last && !buf.contains(h)) { buf -= buf.last; buf += h }
  }

  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) add(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Long].map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf += bb.getLong)
    buf
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def children: Seq[Expression] = Seq(hashExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hashExpr = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "kmv_sketch"
}
