package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{GraftShim => E}

import graft.functions.{CosineSim, Mix}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast —
  * one pass over the corpus, no corpus shuffle except the final per-query
  * top-k (a window over query_id). Scale path: random-hyperplane LSH
  * bucketing; corpus shuffles once on bucket id, queries probe their own
  * bucket per table. At 100 TB the corpus-side work is the budget — both
  * paths read the corpus exactly once.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column =
    E.column(CosineSim(E.expression(a), E.expression(b)))

  /** floor(1e9 × quantized cosine) — deterministic rank key. */
  def cosScaled(qa: Column, qb: Column): Column =
    floor(lit(1e9) * Dedup.quantizedCosine(qa, qb)).cast("long")

  /** Brute-force top-k neighbors for each query vector.
    * Output: (query_id, rank, neighbor_id, cos_scaled). Deterministic:
    * quantized cosine + id tie-break. Queries are broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), Dedup.quantize(col(vecCol)).as("__qc"))
    val q = queries.select(col(idCol).as("query_id"), Dedup.quantize(col(vecCol)).as("__qq"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_scaled", cosScaled(col("__qq"), col("__qc")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_scaled").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_scaled"))
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane, dim). */
  private def planeComponent(table: Int, plane: Int, dim: Int): Double = {
    val h = Mix.splitmix64((table.toLong << 40) ^ (plane.toLong << 20) ^ dim.toLong ^ 0x9e37L)
    // map to [-1, 1)
    (h >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Random-hyperplane LSH bucket id for one table: sign bits of
    * `numPlanes` projections packed into an int. */
  def lshBucket(vec: Column, table: Int, numPlanes: Int, dim: Int): Column = {
    // hyperplane components are literals baked into the plan (seeded, so
    // executors agree without shipping state)
    val bits = (0 until numPlanes).map { p =>
      val comps = array((0 until dim).map(d => lit(planeComponent(table, p, d))): _*)
      val dot = aggregate(
        zip_with(vec, comps, (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** LSH candidate pairs for `lshTopK` — exposed so callers (and the recall
    * spec) can measure candidate-set size against the N×Q brute-force pair
    * count. Corpus side: one bucket per table per vector (LshBuckets, one
    * pass). Query side: multi-probe — the query's own bucket plus every
    * bucket within `probeRadius` flips of its `probeBits` lowest-margin
    * hyperplanes (Lv et al., VLDB 2007). Multi-probing buys recall on the
    * query side only, so the corpus — the 100 TB side — is still read and
    * bucketed exactly once, and the probe list is broadcast. */
  def lshCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, numTables: Int, numPlanes: Int, dim: Int,
                    probeBits: Int, probeRadius: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
        E.column(graft.functions.LshBuckets(
          E.expression(col(vecCol)), numTables, numPlanes, dim)).as("__bs"))
      .select(col("neighbor_id"), posexplode(col("__bs")).as(Seq("table", "bucket")))
    val q = queries.select(col(idCol).as("query_id"),
        E.column(graft.functions.LshProbes(
          E.expression(col(vecCol)), numTables, numPlanes, dim, probeBits, probeRadius)).as("__ps"))
      .select(col("query_id"), posexplode(col("__ps")).as(Seq("table", "__probes")))
      .select(col("query_id"), col("table"), explode(col("__probes")).as("bucket"))
    // dedup candidate IDs first — distinct over bare (id, id) pairs, not
    // 64-float vectors — then the caller joins vectors back for the rerank
    c.join(broadcast(q),
        c("table") === q("table") && c("bucket") === q("bucket") &&
          col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
  }

  /** LSH-bucketed ANN: `numTables` independent hash tables of `numPlanes`
    * sign bits, query-side multi-probe (see lshCandidates); candidates are
    * reranked exactly. Output schema matches bruteForceTopK. Recall grows
    * with numTables and probeRadius (spec measures ≥ 0.8 on the embeddings
    * table); candidate count stays ≪ N×Q because probing only widens the
    * broadcast query side.
    *
    * Tuning at scale: numPlanes ≈ log2(corpus / target bucket size) — the
    * candidate fraction is ~(probes per table / 2^numPlanes) × numTables,
    * so planes must grow with the corpus; probeRadius then buys back the
    * per-table recall the extra planes cost. Measured at 200k uniform
    * vectors (SCALE_PROBE.md): 12×13 planes, probe 10/3 → recall 0.81 at
    * 35% of brute-force pairs; clustered corpora do markedly better. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, numTables: Int = 8,
              numPlanes: Int = 10, dim: Int = 64,
              probeBits: Int = 8, probeRadius: Int = 3): DataFrame = {
    val cands = lshCandidates(corpus, queries, idCol, vecCol,
      numTables, numPlanes, dim, probeBits, probeRadius)

    val qv = queries.select(col(idCol).as("query_id"), Dedup.quantize(col(vecCol)).as("__qq"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), Dedup.quantize(col(vecCol)).as("__qc"))
    val scored = cands
      .join(broadcast(qv), "query_id")
      .join(cv, "neighbor_id")
      .withColumn("cos_scaled", cosScaled(col("__qq"), col("__qc")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_scaled").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_scaled"))
  }
}
