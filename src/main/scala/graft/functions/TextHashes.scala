package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-hashing expressions for the dedup family.
  *
  * Scale rationale (SURVEY §2.6): a 128-hash MinHash signature computed in
  * one pass per row keeps the LSH pipeline shuffle-free until the band
  * bucket join — the naive shingle-explode formulation shuffles
  * |doc| × |shingles| rows. SimHash is one 64-bit word per document.
  */
object Mix {
  /** splitmix64 — standard public-domain 64-bit mixer. */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Rolling shingle hashes over the codepoints of `s` (window = k chars),
    * lowercased, whitespace collapsed. Calls `f` once per shingle. */
  def forEachShingle(s: String, k: Int)(f: Long => Unit): Unit = {
    // normalize: lowercase, collapse runs of whitespace to single space
    val norm = new StringBuilder(s.length)
    var prevSpace = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (!prevSpace) { norm.append(' '); prevSpace = true }
      } else { norm.append(Character.toLowerCase(c)); prevSpace = false }
      i += 1
    }
    val t = norm.toString
    if (t.length >= k) {
      var j = 0
      while (j + k <= t.length) {
        var h = 0xcbf29ce484222325L // FNV offset basis
        var m = 0
        while (m < k) {
          h ^= t.charAt(j + m).toLong
          h *= 0x100000001b3L // FNV prime
          m += 1
        }
        f(splitmix64(h))
        j += 1
      }
    } else if (t.nonEmpty) {
      var h = 0xcbf29ce484222325L
      var m = 0
      while (m < t.length) { h ^= t.charAt(m).toLong; h *= 0x100000001b3L; m += 1 }
      f(splitmix64(h))
    }
  }

  /** FNV-1a over the normalized text — whole-document fingerprint. */
  def rollingFingerprint(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var prevSpace = true
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val emit: Int =
        if (Character.isWhitespace(c)) { if (prevSpace) -1 else { prevSpace = true; ' ' } }
        else { prevSpace = false; Character.toLowerCase(c).toInt }
      if (emit >= 0) { h ^= emit.toLong; h *= 0x100000001b3L }
      i += 1
    }
    h
  }
}

/** minhash_signature(text, numHashes, shingleSize) → array<bigint>.
  * k permutations derived from splitmix64 streams; min per permutation. */
case class MinHashSignature(child: Expression, numHashes: Int, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes > 0 && shingleSize > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // permutation parameters fixed per expression instance
  @transient private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(i => Mix.splitmix64(0x5eed0000L + i) | 1L) // odd
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(i => Mix.splitmix64(0xb5eed00L + i))

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val mins = Array.fill(numHashes)(Long.MaxValue)
    Mix.forEachShingle(s, shingleSize) { h =>
      var i = 0
      while (i < numHashes) {
        val p = as(i) * h + bs(i)
        if (p < mins(i)) mins(i) = p
        i += 1
      }
    }
    new GenericArrayData(mins.map(Long.box): Array[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** simhash64(text, shingleSize) → bigint (64-bit SimHash over shingle hashes). */
case class SimHash64(child: Expression, shingleSize: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val counts = new Array[Int](64)
    Mix.forEachShingle(s, shingleSize) { h =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    Long.box(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** rolling_hash64(text) → bigint — FNV-1a document fingerprint over
  * normalized text (lowercase, collapsed whitespace). */
case class RollingHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Long.box(Mix.rollingFingerprint(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash64"
}

/** shingle_set(text, n) → array<string>: distinct character n-grams of the
  * normalized text, first-occurrence order. Normalization replicates
  * `regexp_replace(lower(text), '\s+', ' ')` EXACTLY (runs collapsed to one
  * space, no trim, regex-\s class) so DuckDB oracles can mirror it.
  *
  * Single pass — the built-in `transform(sequence(...), i -> substr(norm, i, n))`
  * formulation re-evaluates the regexp_replace per shingle position after
  * CollapseProject inlines it into the lambda (measured 30× slower). */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback with RequiresStringInput {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  private def isWs(c: Char): Boolean = // regex \s = [ \t\n\x0B\f\r]
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(v: Any): Any = {
    // Full-string lowering first via the UTF8String.toLowerCase replica
    // (ASCII per-char — locale-independent — else String#toLowerCase), not a
    // bare per-char Character.toLowerCase loop: special-cased codepoints like
    // U+0130 lower to MULTIPLE chars, which a per-char loop gets wrong.
    // DuckDB (utf8proc) still differs on those rare codepoints; on ASCII the
    // three agree exactly.
    val s = WordTok.lowerLikeSpark(v.asInstanceOf[UTF8String].toString)
    val norm = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) {
        norm.append(' ')
        while (i + 1 < s.length && isWs(s.charAt(i + 1))) i += 1
      } else norm.append(c)
      i += 1
    }
    val t = norm.toString
    val out = new java.util.LinkedHashSet[String]()
    // len <= n (incl. empty) → one element, like the SQL
    // `substr(t, 1, n)` at position 1 — keeps DuckDB-oracle parity
    if (t.length <= n) out.add(t)
    else {
      var j = 0
      while (j + n <= t.length) { out.add(t.substring(j, j + n)); j += 1 }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
  override def prettyName: String = "shingle_set"
}

/** cosine_sim(array<float>, array<float>) → double. Sequential double
  * accumulation; null on length mismatch or empty. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0 || n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else Double.box(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** lsh_buckets(vec) → array<int>: random-hyperplane sign-bucket id per LSH
  * table, all tables in one pass over the vector. Hyperplane components are
  * derived from splitmix64(table, plane, dim) — deterministic, no state to
  * ship. Replaces an interpreted zip_with/aggregate formulation (higher-
  * order functions don't codegen; measured ~10M lambda steps per 2k rows). */
case class LshBuckets(child: Expression, numTables: Int, numPlanes: Int, dim: Int)
    extends UnaryExpression with CodegenFallback {
  require(numPlanes <= 30)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  /** [table][plane][dim] — built once per expression instance */
  @transient private lazy val planes: Array[Array[Array[Double]]] =
    Array.tabulate(numTables, numPlanes, dim) { (t, p, d) =>
      val h = Mix.splitmix64((t.toLong << 40) ^ (p.toLong << 20) ^ d.toLong ^ 0x9e37L)
      (h >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0
      var p = 0
      while (p < numPlanes) {
        val plane = planes(t)(p)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += a.getFloat(d).toDouble * plane(d); d += 1 }
        if (dot >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
  override def prettyName: String = "lsh_buckets"
}

/** lsh_probe_buckets(vec) → array<array<int>>: per LSH table, the query-side
  * multi-probe bucket list — the vector's own bucket plus every bucket
  * reachable by flipping up to `radius` of the `probeBits` planes with the
  * smallest projection margin |dot|. Margin-ranked perturbation is the
  * multi-probe LSH scheme of Lv et al., VLDB 2007: a near neighbor that
  * landed on the wrong side of a hyperplane almost always did so on one the
  * query itself barely cleared, so probing those buckets first buys recall
  * without extra tables. Corpus side stays single-bucket (LshBuckets). */
case class LshProbes(child: Expression, numTables: Int, numPlanes: Int,
                     dim: Int, probeBits: Int, radius: Int)
    extends UnaryExpression with CodegenFallback {
  require(numPlanes <= 30 && probeBits <= numPlanes && radius <= probeBits)

  override def dataType: DataType =
    ArrayType(ArrayType(IntegerType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val planes: Array[Array[Array[Double]]] =
    Array.tabulate(numTables, numPlanes, dim) { (t, p, d) =>
      val h = Mix.splitmix64((t.toLong << 40) ^ (p.toLong << 20) ^ d.toLong ^ 0x9e37L)
      (h >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val out = new Array[Any](numTables)
    var t = 0
    while (t < numTables) {
      val dots = new Array[Double](numPlanes)
      var bucket = 0
      var p = 0
      while (p < numPlanes) {
        val plane = planes(t)(p)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += a.getFloat(d).toDouble * plane(d); d += 1 }
        dots(p) = dot
        if (dot >= 0) bucket |= (1 << p)
        p += 1
      }
      val ranked = (0 until numPlanes).sortBy(p => math.abs(dots(p))).take(probeBits).toArray
      val probes = scala.collection.mutable.ArrayBuffer[Any](Int.box(bucket))
      def expand(start: Int, mask: Int, depth: Int): Unit = {
        var i = start
        while (i < ranked.length) {
          val m = mask | (1 << ranked(i))
          probes += Int.box(bucket ^ m)
          if (depth + 1 < radius) expand(i + 1, m, depth + 1)
          i += 1
        }
      }
      if (radius > 0) expand(0, 0, 0)
      out(t) = new GenericArrayData(probes.toArray)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshProbes =
    copy(child = newChild)
  override def prettyName: String = "lsh_probe_buckets"
}

/** hamming64(a, b) → int — popcount(a XOR b), for SimHash radii.
  * Fully codegen'd (not CodegenFallback): it is evaluated inside the
  * candidate-pair join stage, and a fallback expression there would break
  * whole-stage codegen for the entire join. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any =
    Int.box(java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long]))
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Hamming64 =
    copy(left = l, right = r)
  override def prettyName: String = "hamming64"
}
