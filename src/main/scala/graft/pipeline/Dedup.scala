package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}

import graft.functions.{MinHashSignature, SimHash64}

/** Deduplication family for LLM training-data pipelines.
  *
  * Shuffle budget (SURVEY §2.6), per op:
  *  - exact: 1 shuffle (groupBy content hash)
  *  - minhash LSH: signature map-side (0 shuffles) → 1 shuffle on band
  *    bucket → self-join co-partitioned on bucket → verify map-side via
  *    the joined texts
  *  - simhash: fingerprint map-side → 1 shuffle on hamming band key
  * No all-pairs stage exists anywhere: blocking always precedes verify,
  * which is what keeps these plans viable at 10^9+ documents.
  */
object Dedup {

  private def minhashCol(text: Column, numHashes: Int, shingle: Int): Column =
    E.column(MinHashSignature(E.expression(text), numHashes, shingle))
  private def simhashCol(text: Column, shingle: Int): Column =
    E.column(SimHash64(E.expression(text), shingle))

  /** Exact dedup on normalized content hash. Keeps the smallest id per
    * group. Output: input columns + `is_duplicate`. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.withColumn("__h",
      md5(regexp_replace(lower(col(textCol)), "\\s+", " ")))
    val keepers = hashed.groupBy(col("__h"))
      .agg(min(col(idCol)).as("__keeper"))
    hashed.join(keepers, "__h")
      .withColumn("is_duplicate", col(idCol) =!= col("__keeper"))
      .drop("__h", "__keeper")
  }

  /** MinHash/LSH candidate pairs: (a, b) with a < b sharing ≥1 LSH band.
    * numHashes = bands × rowsPerBand. Oversized buckets (skew guard) are
    * dropped with a count in logs — at 100 TB a degenerate bucket (e.g.
    * boilerplate docs) would otherwise quadratically dominate the join.
    * Persists an intermediate (band, bucket) DataFrame; callers running
    * many dedup jobs in one long-lived session should
    * `spark.catalog.clearCache()` between unrelated corpora. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 128, bands: Int = 16,
                        shingle: Int = 5, maxBucket: Int = 200): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = df.select(col(idCol).as("id"),
      minhashCol(col(textCol), numHashes, shingle).as("sig"))
    // band → bucket key (hash of the band's signature slice + band index).
    // Persisted: referenced by the size guard AND both sides of the
    // self-join — without it the signature pass recomputes 4×.
    val buckets = sigs.select(col("id"), posexplode(
      expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $r + 1, $r)))"))
      .as(Seq("band", "bucket")))
      .select(col("id"), col("band"), col("bucket"))
      .persist()
    val sized = buckets.groupBy("band", "bucket").agg(count("*").as("__n"))
    val kept = buckets.join(sized.where(col("__n") <= maxBucket), Seq("band", "bucket"))
    kept.as("x").join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
  }

  /** Exact character-shingle Jaccard for a pair DataFrame (a, b) against the
    * source texts: appends n_int / n_union / jaccard. Built-in expressions
    * only — stays inside whole-stage codegen. */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, shingle: Int = 3): DataFrame = {
    val sh = shingleSet(col(textCol), shingle)
    // persisted: joined twice, and without it the per-DOC shingle sets are
    // recomputed per PAIR (candidate count ≫ doc count)
    val withSets = docs.select(col(idCol).as("__id"), sh.as("__sh")).persist()
    pairs
      .join(withSets.withColumnRenamed("__sh", "__sha"), pairs("a") === col("__id")).drop("__id")
      .join(withSets.withColumnRenamed("__sh", "__shb"), pairs("b") === col("__id")).drop("__id")
      .withColumn("n_int", size(array_intersect(col("__sha"), col("__shb"))).cast("long"))
      .withColumn("n_union", (size(col("__sha")) + size(col("__shb"))).cast("long") - col("n_int"))
      .withColumn("jaccard", col("n_int").cast("double") / col("n_union"))
      .drop("__sha", "__shb")
  }

  /** Distinct character n-gram set of the normalized text — single-pass
    * Catalyst expression (see ShingleSet scaladoc for why not built-ins). */
  def shingleSet(text: Column, n: Int): Column =
    E.column(graft.functions.ShingleSet(E.expression(text), n))

  /** Near-dup pairs: LSH blocking then exact-Jaccard verification. */
  def minhashDedupPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.8, numHashes: Int = 128,
                        bands: Int = 32, shingle: Int = 5): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, numHashes, bands, shingle)
    verifyJaccard(cands, df, idCol, textCol, shingle)
      .where(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** SimHash near-dup candidates: 64-bit fingerprints blocked on 4 16-bit
    * bands (any pair within hamming distance ≤ 3 shares ≥1 exact band by
    * pigeonhole when distance < bands). */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        shingle: Int = 3, maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), simhashCol(col(textCol), shingle).as("fp"))
    val banded = fp.select(col("id"), col("fp"), posexplode(
      expr("transform(sequence(0, 3), b -> (fp >> (b * 16)) & 65535)"))
      .as(Seq("band", "key")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        E.column(graft.functions.Hamming64(
          E.expression(col("x.fp")), E.expression(col("y.fp")))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs above a cosine threshold, restricted to a
    * blocking window (caller chooses the blocking: LSH buckets, shard key,
    * or a window join). Uses exact quantized-integer cosine (deterministic
    * across engines — see SparkEntry oracle notes). */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                           pairs: DataFrame, threshold: Double): DataFrame = {
    val q = emb.select(col(idCol).as("__id"), quantize(col(vecCol)).as("__q"))
    pairs
      .join(q.withColumnRenamed("__q", "__qa"), pairs("a") === col("__id")).drop("__id")
      .join(q.withColumnRenamed("__q", "__qb"), pairs("b") === col("__id")).drop("__id")
      .withColumn("cos", quantizedCosine(col("__qa"), col("__qb")))
      .drop("__qa", "__qb")
      .where(col("cos") >= threshold)
  }

  /** float vector → scaled bigint vector. The float→double widening is
    * exact and double×1e6 is IEEE-identical in any engine; without the
    * explicit cast Spark multiplies in float while DuckDB promotes. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000000L).cast("long"))

  /** cosine over pre-quantized bigint vectors — integer dot/norms are exact,
    * so the resulting double is bit-identical in any engine. */
  def quantizedCosine(qa: Column, qb: Column): Column = {
    val dot = aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    val na = aggregate(qa, lit(0L), (acc, v) => acc + v * v)
    val nb = aggregate(qb, lit(0L), (acc, v) => acc + v * v)
    dot.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double")))
  }
}
