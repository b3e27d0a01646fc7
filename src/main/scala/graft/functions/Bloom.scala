package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Bloom-filter sizing + the shared bit math for [[BloomAgg]] /
  * [[BloomMightContain]].
  *
  * Wire format of a filter (BinaryType): `[int32 k][int64 numBits][words…]`
  * — self-describing, so a stored filter carries its own geometry and a
  * query can never probe with mismatched parameters (the same contract as
  * the near-dup gate's `meta/` table).
  *
  * Bit placement is classic double hashing (Kirsch & Mitzenmacher, ESA'06:
  * two hash functions simulate k with no loss in the FPP bound):
  * `bit_i = (h1 + i·h2) mod numBits` with h1/h2 independent splitmix64
  * streams of the input — deterministic, so the filter bytes are identical
  * under ANY partitioning/merge order (bitwise OR commutes), and a filter
  * built today gates batches forever.
  */
object Bloom {
  /** Optimal geometry for `n` expected distinct items at false-positive
    * rate `fpp`: m = -n·ln p / (ln 2)², k = (m/n)·ln 2 — the standard
    * formulas. Bits round up to a word multiple; k clamps to [1, 16]. */
  def geometry(expectedItems: Long, fpp: Double): (Long, Int) = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2)
    val bitsRaw = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val numBits = ((bitsRaw.max(64) + 63) / 64) * 64
    require(numBits <= (1L << 36),
      s"bloom filter would need $numBits bits (> 8 GiB); lower expectedItems or raise fpp")
    val k = math.round(numBits.toDouble / expectedItems * ln2).toInt.max(1).min(16)
    (numBits, k)
  }

  @inline private def bitIndex(h1: Long, h2: Long, i: Int, numBits: Long): Long =
    ((h1 + i.toLong * h2) & Long.MaxValue) % numBits

  def set(words: Array[Long], numBits: Long, k: Int, v: Long): Unit = {
    val h1 = Mix.splitmix64(v ^ 0xb100f11eL)
    val h2 = Mix.splitmix64(v ^ 0x5eedb1001975L) | 1L
    var i = 0
    while (i < k) {
      val bit = bitIndex(h1, h2, i, numBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      i += 1
    }
  }

  def contains(words: Array[Long], wordOffset: Int, numBits: Long, k: Int, v: Long): Boolean = {
    val h1 = Mix.splitmix64(v ^ 0xb100f11eL)
    val h2 = Mix.splitmix64(v ^ 0x5eedb1001975L) | 1L
    var i = 0
    while (i < k) {
      val bit = bitIndex(h1, h2, i, numBits)
      if ((words(wordOffset + (bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(words: Array[Long], numBits: Long, k: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + words.length * 8)
    bb.putInt(k)
    bb.putLong(numBits)
    words.foreach(bb.putLong)
    bb.array()
  }

  /** (k, numBits, words) of a serialized filter. */
  def deserialize(bytes: Array[Byte]): (Int, Long, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val numBits = bb.getLong
    val words = new Array[Long]((bytes.length - 12) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (k, numBits, words)
  }
}

/** bloom_agg(hash64, numBits, k) → binary — build a Bloom filter over a
  * BIGINT hash column as a MERGEABLE bounded-state aggregate: the
  * aggregation state is the fixed-size bit array regardless of input
  * cardinality (a distinct-set state grows with the data; this never
  * does), partials merge by bitwise OR, and the result bytes are
  * DETERMINISTIC under any partitioning. NULL inputs are ignored.
  *
  * This is the build side of the exact-dedup bloom gate
  * (`Dedup.buildBloomGate`): at a 100 TB reference corpus the DISTINCT
  * content-hash set outgrows any broadcast, but its Bloom filter — a few
  * GB at one byte per document — still ships to every task as plan-constant
  * bytes and prefilters the fresh side with a pure map. */
case class BloomAgg(child: Expression, numBits: Long, numHashFuncs: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numBits <= (1L << 36), s"numBits $numBits exceeds the 8 GiB cap")
  require(numHashFuncs >= 1 && numHashFuncs <= 16, s"numHashFuncs must be in [1,16], got $numHashFuncs")

  override def createAggregationBuffer(): Array[Long] = new Array[Long]((numBits / 64).toInt)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buf, numBits, numHashFuncs, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = Bloom.serialize(buf, numBits, numHashFuncs)

  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.serialize(buf, numBits, numHashFuncs)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val (k, bits, words) = Bloom.deserialize(bytes)
    require(k == numHashFuncs && bits == numBits,
      s"bloom state geometry mismatch: state ($bits bits, k=$k) vs aggregate ($numBits, k=$numHashFuncs)")
    words
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a BIGINT hash input, got ${other.catalogString}")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAgg = copy(child = newChildren(0))
  override def prettyName: String = "bloom_agg"
}

/** bloom_might_contain(filterBytes, hash64) → boolean — membership probe
  * against a serialized [[BloomAgg]] filter. FALSE is definitive (no false
  * negatives); TRUE is a candidate to be confirmed exactly downstream.
  * NULL hash → NULL (mirroring `IN` semantics on the gate's join key).
  *
  * The filter side is plan-constant in every intended use (a literal of
  * the built filter's bytes), so the header parse + word-array copy is
  * cached per expression instance keyed on reference identity — per-row
  * work is k word probes, nothing else. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  @transient private var cachedRef: AnyRef = _
  @transient private var cachedK: Int = _
  @transient private var cachedBits: Long = _
  @transient private var cachedWords: Array[Long] = _

  override def nullSafeEval(filter: Any, hash: Any): Any = {
    val bytes = filter.asInstanceOf[Array[Byte]]
    if (!(bytes.asInstanceOf[AnyRef] eq cachedRef)) {
      val (k, bits, words) = Bloom.deserialize(bytes)
      cachedK = k; cachedBits = bits; cachedWords = words
      cachedRef = bytes
    }
    Bloom.contains(cachedWords, 0, cachedBits, cachedK, hash.asInstanceOf[Long])
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (BINARY, BIGINT), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_might_contain"
}
