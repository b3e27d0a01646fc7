package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** top_k_pairs(score, id, k) → array<struct<score:long, id:long>> — the k
  * highest-scoring (score, id) entries of the group, ordered by
  * (score DESC, id ASC).
  *
  * This exists to make per-query top-k a true TWO-PHASE aggregation: as a
  * `TypedImperativeAggregate` it runs under ObjectHashAggregate, which
  * partial-aggregates map-side — every task reduces its slice of a query's
  * scored rows to ≤ k entries BEFORE the shuffle, and only k-sized states
  * cross the wire. The `row_number() OVER (PARTITION BY query_id)` form it
  * replaces shipped every scored row of a query to one reducer — for a
  * brute-force ANN scan that is the whole corpus per query, a guaranteed
  * straggler at scale.
  *
  * State is bounded: the buffer holds at most 2k entries; on overflow it is
  * compacted to the best k (amortized O(1) per row). Ties are broken by
  * ascending id, so the result is deterministic under any partitioning.
  */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // (score DESC, id ASC): better entries first
  private val ord: Ordering[(Long, Long)] =
    Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long)

  private def compact(buf: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    if (buf.length > k) {
      val best = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= best
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    new ArrayBuffer[(Long, Long)](k + 1)

  override def update(buf: ArrayBuffer[(Long, Long)],
                      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Long], i.asInstanceOf[Long]))
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)],
                     other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
    val best = buf.sorted(ord).take(k)
    new GenericArrayData(best.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val compacted = compact(buf)
    val bb = java.nio.ByteBuffer.allocate(4 + compacted.length * 16)
    bb.putInt(compacted.length)
    compacted.foreach { case (s, i) => bb.putLong(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, Long)](n + 1)
    var j = 0
    while (j < n) { buf += ((bb.getLong, bb.getLong)); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "top_k_pairs"
}

object TopKPairs {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.graftshim.{GraftShim => E}

  /** Grouped top-k as a two-phase aggregation: for each distinct value of
    * `groupCols`, the `k` rows with the highest `scoreCol` (ties broken by
    * ascending `idCol`). Output: groupCols*, rank (1-based), id, score.
    * Unlike `row_number() OVER (PARTITION BY …)`, no reducer ever receives
    * a group's full row set — each task pre-reduces to ≤ k map-side.
    *
    * NULL contract: rows whose score or id is NULL are ignored (never
    * ranked), and a group in which EVERY row has a NULL score or id emits
    * no output rows at all — unlike the window formulation, which ranks
    * null-score rows last. Callers that need such groups to survive should
    * coalesce the score to a sentinel before calling. */
  def perGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
               idCol: String, k: Int): DataFrame = {
    // integral types only: a silent cast("long") would truncate fractional
    // scores (a double cosine in [0,1] would rank as all-zero) — callers
    // must pre-scale, e.g. floor(score * 1e6).cast("long")
    import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
    def integral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType => d.scale == 0 // exact integer decimals (e.g. SQL floor) are lossless
      case _ => false
    }
    Seq(scoreCol -> "score", idCol -> "id").foreach { case (c, role) =>
      val dt = df.schema(c).dataType
      require(integral(dt),
        s"TopKPairs.perGroup $role column '$c' must be an integral type, got $dt — " +
          "pre-scale fractional scores (e.g. floor(x * 1e6) cast to long)")
    }
    val agg: Column = E.column(TopKPairs(
      E.expression(col(scoreCol).cast("long")),
      E.expression(col(idCol).cast("long")), k).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*).agg(agg.as("__top"))
      .select(groupCols.map(col) :+ posexplode(col("__top")).as(Seq("__pos", "__e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("__pos") + 1).cast("int").as("rank"),
        col("__e.id").as("id"), col("__e.score").as("score")): _*)
  }
}

/** top_k_strings(score, item, k) → array<struct<score:long, item:string>> —
  * [[TopKPairs]] with a STRING payload: the k highest-scoring (score, item)
  * entries of the group, ordered by (score DESC, item ASC by UTF-8 BYTES —
  * `UTF8String.compareTo`, the order DuckDB's binary collation sees, so an
  * exact-SQL oracle ranks supplementary-plane terms identically).
  *
  * Same scale contract as TopKPairs: a bounded TypedImperativeAggregate
  * under ObjectHashAggregate — each task reduces its slice of a group to
  * ≤ k entries map-side and only k-sized states cross the shuffle, where
  * `row_number() OVER (PARTITION BY doc)` would ship every candidate row
  * of a document to one reducer. Buffer holds at most 2k entries
  * (compacted to k on overflow — amortized O(log k) per row). NULL score
  * or item rows are ignored. */
case class TopKStrings(scoreExpr: Expression, itemExpr: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Long, org.apache.spark.unsafe.types.UTF8String)]] {
  require(k >= 1, s"k must be >= 1, got $k")
  import org.apache.spark.unsafe.types.UTF8String

  // (score DESC, item bytes ASC): better entries first
  private val ord: Ordering[(Long, UTF8String)] = new Ordering[(Long, UTF8String)] {
    def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else a._2.compareTo(b._2)
    }
  }

  private def compact(buf: ArrayBuffer[(Long, UTF8String)]): ArrayBuffer[(Long, UTF8String)] = {
    if (buf.length > k) {
      val best = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= best
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Long, UTF8String)] =
    new ArrayBuffer[(Long, UTF8String)](k + 1)

  override def update(buf: ArrayBuffer[(Long, UTF8String)],
                      input: InternalRow): ArrayBuffer[(Long, UTF8String)] = {
    val s = scoreExpr.eval(input)
    val i = itemExpr.eval(input)
    if (s != null && i != null) {
      // clone: the evaluated UTF8String may alias a reused row buffer
      buf += ((s.asInstanceOf[Long], i.asInstanceOf[UTF8String].clone()))
      if (buf.length >= 2 * k) compact(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, UTF8String)],
                     other: ArrayBuffer[(Long, UTF8String)]): ArrayBuffer[(Long, UTF8String)] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[(Long, UTF8String)]): Any = {
    val best = buf.sorted(ord).take(k)
    new GenericArrayData(best.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Long, UTF8String)]): Array[Byte] = {
    val compacted = compact(buf)
    val bytes = compacted.map { case (_, i) => i.getBytes }
    val bb = java.nio.ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(compacted.length)
    compacted.zip(bytes).foreach { case ((s, _), b) =>
      bb.putLong(s); bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, UTF8String)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Long, UTF8String)](n + 1)
    var j = 0
    while (j < n) {
      val s = bb.getLong
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf += ((s, UTF8String.fromBytes(b)))
      j += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("item", StringType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, itemExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStrings =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStrings =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStrings =
    copy(scoreExpr = newChildren(0), itemExpr = newChildren(1))
  override def prettyName: String = "top_k_strings"
}
