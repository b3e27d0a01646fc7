package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** heavy_hitters(item, k) → array<struct<token:string, n:long>> — a
  * MERGEABLE Misra-Gries frequent-items summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Why not `groupBy(token).count.orderBy.limit`: that plan's aggregation
  * state is ONE ENTRY PER DISTINCT KEY — fine for a 31-word synthetic
  * vocabulary, a multi-TB hash table for web-corpus token/URL/host
  * streams at 100 TB. This summary holds AT MOST 2k entries per task
  * (<= k after every reduction) and k-sized states cross the shuffle,
  * trading exactness for the classic
  * guarantee: after any sequence of updates and merges totalling N items,
  * every item with true count > N/(k+1) is present, and each reported
  * count undercounts its true count by at most N/(k+1).
  *
  * Update: count if present; insert while the buffer holds fewer than 2k
  * entries; at 2k, one batch reduction (subtract the (k+1)-th largest
  * count, drop non-positives — the mergeable-summaries reduction) brings
  * it back to ≤ k. The textbook MG step decrements ALL k counters for
  * EVERY unseen item once full — O(N·k) per task on exactly the
  * high-cardinality token/URL streams the sketch exists for; batching k
  * inserts per O(k log k) reduction makes updates O(log k) amortized.
  * Delaying reductions only lowers error (the reduction is the lossy
  * step), and each reduction is a merge of ≤ k singleton summaries, so
  * the N/(k+1) bound is unchanged (Agarwal et al. §2). Merge: pointwise
  * sum, then the same reduction. serialize() and eval() reduce first, so
  * AT MOST k entries ever cross the shuffle or reach the caller — the
  * transient 2k in-memory headroom never escapes a task.
  *
  * Determinism contract: in the EXACT regime (fewer than k distinct items
  * ever touch one buffer — no decrement ever fires) counts are exact sums
  * and the output is deterministic under any partitioning/merge order, so
  * it can be oracle-gated against an exact GROUP BY. In the approximate
  * regime reported counts are merge-order-dependent lower bounds within
  * the guarantee (spec-asserted, not oracle-gated). Output is sorted
  * (n DESC, token ASC). NULL items are ignored.
  */
case class HeavyHitters(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < 2 * k => buf.update(item, 1L)
        case None => // 2k reached: batch-reduce to <= k, then insert
          reduceToK(buf)
          buf.update(item, 1L)
      }
    }
    buf
  }

  /** The mergeable-summaries reduction: subtract the (k+1)-th largest
    * count from everything, drop non-positives — at most k entries
    * (those strictly above the cut) survive. No-op at size <= k, so the
    * exact regime never loses a count. */
  private def reduceToK(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size <= k) return
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val cut = counts(counts.length - (k + 1)) // (k+1)-th largest
    val dead = mutable.ArrayBuffer.empty[String]
    buf.keysIterator.foreach { key =>
      val c = buf(key) - cut
      if (c <= 0) dead += key else buf.update(key, c)
    }
    dead.foreach(buf.remove)
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) => buf.update(item, buf.getOrElse(item, 0L) + c) }
    reduceToK(buf)
    buf
  }

  override def eval(buf0: mutable.HashMap[String, Long]): Any = {
    reduceToK(buf0)
    val buf = buf0
    // ties break on UTF-8 BYTE order (UTF8String.compareTo), not Java's
    // UTF-16 code-unit order: supplementary-plane tokens sort differently
    // between the two, and the exact-regime oracle (DuckDB, binary UTF-8
    // collation) must see the identical rank order
    val entries = buf.toArray.map { case (item, c) => (UTF8String.fromString(item), c) }
    val sorted = entries.sortWith { case ((ia, ca), (ib, cb)) =>
      if (ca != cb) ca > cb else ia.compareTo(ib) < 0
    }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(item, c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    reduceToK(buf) // the k-sized-state shuffle contract: <= k entries cross
    val entries = buf.toArray
    val byteArrays = entries.map { case (item, _) => item.getBytes("UTF-8") }
    val size = 4 + byteArrays.map(_.length + 12).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.zip(byteArrays).foreach { case ((_, c), bytes) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0))
  override def prettyName: String = "heavy_hitters"
}

object HeavyHitters {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftshim.{GraftShim => E}

  /** Frequent whitespace tokens of a text column as a bounded-state sketch:
    * explode → heavy_hitters(k) under ObjectHashAggregate (k-sized states
    * shuffle, never one-entry-per-distinct-key) → (rank, token, n).
    * See [[HeavyHitters]] for the exactness/guarantee contract. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val agg: Column = E.column(
      HeavyHitters(E.expression(col("token")), k).toAggregateExpression())
    df.select(explode(graft.pipeline.TextAnalysis.words(col(textCol))).as("token"))
      .agg(agg.as("__hh"))
      .select(posexplode(col("__hh")).as(Seq("__pos", "__e")))
      .select((col("__pos") + 1).cast("int").as("rank"),
        col("__e.token").as("token"), col("__e.n").as("n"))
  }
}
