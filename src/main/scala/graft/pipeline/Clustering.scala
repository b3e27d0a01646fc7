package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over integer-quantized embeddings —
  * deterministic and bit-replayable, the unsupervised twin of
  * [[Similarity.classPrototypes]] (which needs labels).
  *
  * Where the IVF coarse quantizer ([[Similarity.trainCentroids]]) runs
  * k-means on a bounded DRIVER sample to build an index, this is the
  * corpus-scale clustering op itself: every assignment pass and every
  * moment aggregation is a distributed Spark job over the full corpus;
  * only the k×d centroid table (KB-scale by definition, independent of
  * corpus size — the MLlib KMeans architecture and the repo's bounded
  * driver-artifact convention) crosses the driver between rounds.
  *
  * Determinism/replayability (the whole family's contract):
  *  - vectors quantize to `floor(x·10⁶)` longs ([[Dedup.quantize]]);
  *  - the k seeds are the vectors with the k SMALLEST md5-derived
  *    `h60("km:" ∥ id)` hashes (ties → smaller id) — a uniform random
  *    draw both engines can replay with `row_number`; cluster id =
  *    position in that hash order (0-based);
  *  - distance is EXACT integer squared Euclidean via the dot-product
  *    identity `d² = x·x − 2·x·c + c·c` (three [[graft.functions.QuantizedDot]]
  *    tight loops; |q| ≤ ~2·10⁶ ⇒ per-dim ≤ 4·10¹², ×4096 dims still
  *    < 2⁶³ — no floats anywhere in the metric);
  *  - argmin ties break to the smaller cluster id
  *    (`min(struct(d², c))` — an AGGREGATE, never a per-vector sort);
  *  - centroid update is `Σq_d DIV n` per (cluster, dim) with the sum
  *    in DECIMAL(38,0) (overflow-safe to any corpus size), truncating
  *    integral division identical in Spark and DuckDB; a cluster that
  *    captured no vectors keeps its previous centroid (replayable —
  *    no re-seeding randomness).
  *
  * Fixed `rounds` update cycles (the pageRank fixed-horizon discipline:
  * a data-dependent convergence test would make the output depend on
  * float drift; k-means converges monotonically so a short horizon is
  * the standard production cut), then one final assignment against the
  * final centroids. The corpus frame is materialized ONCE and reused by
  * every round (rounds × 2 passes over it, O(1) shuffles each — never a
  * growing lineage).
  */
object Clustering {

  import org.apache.spark.sql.graftshim.{GraftShim => E}

  private def qdot(a: Column, b: Column): Column =
    E.column(graft.functions.QuantizedDot(E.expression(a), E.expression(b)))

  private def h60(v: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), v.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Per-vector assignment under the final centroids:
    * `(vec_id, cluster, dist2)`. `rounds` = Lloyd update cycles run
    * before the output pass. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, rounds: Int): DataFrame = {
    val (q, cents) = kmeansCentroids(emb, idCol, vecCol, k, rounds)
    assign(q, centFrame(q.sparkSession, cents))
      .select(col("vec_id"), col("cluster"), col("dist2"))
  }

  /** Per-cluster rollup under the final centroids: `(cluster, n_members,
    * mean_dist2)` — mean inertia per member (`Σd² DIV n` in
    * DECIMAL(38,0), so the rollup is exact at any corpus size while the
    * output stays a BIGINT bounded by max d², not by n·d²). */
  def kmeansSummary(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, rounds: Int): DataFrame = {
    kmeansAssign(emb, idCol, vecCol, k, rounds)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        expr("CAST(sum(CAST(dist2 AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("mean_dist2"))
  }

  /** SIMPLIFIED SILHOUETTE per cluster (Hruschka, de Castro & Campello,
    * HIS '04 — the centroid-based silhouette): classic silhouette needs
    * the O(n²) mean pairwise distance; the simplified form replaces it
    * with distances to CENTROIDS — a(i) = dist to own centroid, b(i) =
    * min dist to any other centroid, s(i) = (b−a)/max(a,b) — which is
    * the only silhouette that survives 100 TB (per-row work is a fold
    * over the k-entry centroid literal: NO join, NO shuffle, exactly the
    * [[kmeansScore]] map shape; one tiny groupBy ends the plan).
    *
    * Exact integers end to end: quantized d² from the same
    * `x·x − 2·x·c + c·c` fold as assignment (ties to the smaller
    * cluster id — the [[kmeansAssign]] contract), distances as
    * IEEE-sqrt-floor (the ivf/pq convention), s in ppm with truncating
    * DIV. Because assignment IS nearest-centroid, a ≤ b always and
    * s_ppm ∈ [0, 10⁶] — no negative-division semantics to pin across
    * engines. Output: `(cluster, n_members, mean_s_ppm)`; low
    * mean_s_ppm flags the clusters whose members sit nearly as close
    * to a rival centroid (merge candidates). */
  def kmeansSilhouette(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, rounds: Int): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2 clusters, got $k")
    val (q, cents) = kmeansCentroids(emb, idCol, vecCol, k, rounds)
    // A corpus smaller than k can train FEWER than 2 actual centroids;
    // the fold below would then leave db at the Long.MaxValue sentinel
    // and fabricate b ≈ 3·10⁹ "rival" distances (s_ppm ≈ 10⁶ rows) that
    // no oracle replay emits — fail loudly instead, mirroring the k ≥ 2
    // guard on the REQUESTED cluster count.
    require(cents.size >= 2,
      s"silhouette needs >= 2 trained centroids, got ${cents.size} " +
        "(quantized corpus smaller than 2 distinct points?)")
    val centArr = array(cents.sortBy(_._1).map { case (c, v) =>
      struct(lit(c).as("c"), typedLit(v.toSeq).as("cv"),
        lit(v.map(x => x * x).sum).as("nc2"))
    }: _*)
    val d2 = "(__nx2 - 2 * aggregate(zip_with(__qv, s.cv, (a, b) -> a * b), 0L, (x, y) -> x + y) + s.nc2)"
    q.withColumn("__cents", centArr)
      // one fold tracks the two smallest (d², c) in cluster order: d1 =
      // own-centroid d² (strict < keeps the smaller c on ties), db =
      // second-smallest = min over the OTHER k−1 centroids
      .withColumn("__best", expr(
        s"""aggregate(__cents,
              named_struct('d1', CAST(9223372036854775807 AS BIGINT),
                           'c1', CAST(-1 AS BIGINT),
                           'db', CAST(9223372036854775807 AS BIGINT)),
              (acc, s) -> CASE
                WHEN $d2 < acc.d1
                  THEN named_struct('d1', $d2, 'c1', s.c, 'db', acc.d1)
                WHEN $d2 < acc.db
                  THEN named_struct('d1', acc.d1, 'c1', acc.c1, 'db', $d2)
                ELSE acc END)"""))
      .select(col("vec_id"), col("__best.c1").as("cluster"),
        expr("CAST(floor(sqrt(CAST(__best.d1 AS DOUBLE))) AS BIGINT)").as("__a"),
        expr("CAST(floor(sqrt(CAST(__best.db AS DOUBLE))) AS BIGINT)").as("__b"))
      .withColumn("__s", expr(
        "CASE WHEN greatest(__a, __b) > 0 THEN ((__b - __a) * 1000000) DIV greatest(__a, __b) ELSE 0 END"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        expr("CAST(sum(CAST(__s AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("mean_s_ppm"))
  }

  /** Train on `train`, score `batch` — the train-once / score-forever
    * lifecycle: centroids fit on the (bounded, curated) training corpus,
    * then every future batch assigns against the FROZEN table as a PURE
    * MAP — the k×d centroids become an array LITERAL and the argmin is
    * a fold over it, so scoring needs no join and no shuffle at all
    * (stream-safe: the same call works on a readStream frame). Values
    * are bit-identical to [[kmeansAssign]]'s assignment under the same
    * centroids: same `d² = x·x − 2·x·c + c·c` integers, same
    * strict-< fold = same smallest-cluster tie-break (the literal is
    * ordered by cluster id; spec-pinned). Output: `(vec_id, cluster,
    * dist2)`. */
  def kmeansScore(train: DataFrame, batch: DataFrame, idCol: String,
                  vecCol: String, k: Int, rounds: Int): DataFrame = {
    val (_, cents) = kmeansCentroids(train, idCol, vecCol, k, rounds)
    val centArr = array(cents.sortBy(_._1).map { case (c, v) =>
      struct(lit(c).as("c"), typedLit(v.toSeq).as("cv"),
        lit(v.map(x => x * x).sum).as("nc2"))
    }: _*)
    val d2 = "(__nx2 - 2 * aggregate(zip_with(__qv, s.cv, (a, b) -> a * b), 0L, (x, y) -> x + y) + s.nc2)"
    batch.where(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        Dedup.quantize(col(vecCol)).as("__qv"))
      .withColumn("__nx2", qdot(col("__qv"), col("__qv")))
      .withColumn("__cents", centArr)
      .withColumn("__best", expr(
        s"""aggregate(__cents,
              named_struct('d2', CAST(9223372036854775807 AS BIGINT), 'c', CAST(-1 AS BIGINT)),
              (acc, s) -> CASE WHEN $d2 < acc.d2
                          THEN named_struct('d2', $d2, 'c', s.c)
                          ELSE acc END)"""))
      .select(col("vec_id"), col("__best.c").as("cluster"),
        col("__best.d2").as("dist2"))
  }

  /** The quantized corpus (materialized, with hoisted `__nx2 = x·x`) and
    * the final centroid table `(cluster, components)` after `rounds`
    * Lloyd updates. Exposed for reuse (e.g. scoring a NEW batch against
    * a trained clustering). */
  private[pipeline] def kmeansCentroids(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int): (DataFrame, Seq[(Long, Array[Long])]) = {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    require(rounds >= 0 && rounds <= 64,
      s"rounds must be in [0, 64], got $rounds")
    val q = Materialize.cutLazy(
      emb.where(col(vecCol).isNotNull)
        .select(col(idCol).cast("long").as("vec_id"),
          Dedup.quantize(col(vecCol)).as("__qv"))
        .withColumn("__nx2", qdot(col("__qv"), col("__qv"))))
    // seeds: bottom-k by (h60, id) — a TakeOrdered, never a full sort
    val seedRows = q
      .select(col("vec_id"), col("__qv"), h60(col("vec_id"), "km").as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(k)
      .select(col("__qv")).collect()
    var cents: Seq[(Long, Array[Long])] = seedRows.zipWithIndex.map {
      case (r, i) =>
        (i.toLong, r.getSeq[Long](0).toArray)
    }.toSeq
    val spark = q.sparkSession
    (0 until rounds).foreach { _ =>
      val upd = assign(q, centFrame(spark, cents))
        .select(col("cluster"), posexplode(col("__qv")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(expr("CAST(sum(CAST(v AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("c"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (c, rows) =>
          (c, rows.sortBy(_.getInt(1)).map(_.getLong(2)))
        }
      cents = cents.map { case (c, old) => (c, upd.getOrElse(c, old)) }
    }
    (q, cents)
  }

  private def centFrame(spark: org.apache.spark.sql.SparkSession,
                        cents: Seq[(Long, Array[Long])]): DataFrame = {
    import spark.implicits._
    cents.map { case (c, v) => (c, v.toSeq, v.map(x => x * x).sum) }
      .toDF("cluster", "__qc", "__nc2")
  }

  /** Nearest-centroid assignment: broadcast-hinted product with the
    * k-row centroid table, `d² = __nx2 − 2·dot + __nc2`, per-vector
    * argmin as `min(struct(d², cluster, __qv))` — cluster is unique so
    * the trailing vector never participates in the ordering; it rides
    * along to spare the update pass a second join back to the corpus. */
  private def assign(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(broadcast(cents))
      .withColumn("__d2",
        col("__nx2") - lit(2L) * qdot(col("__qv"), col("__qc")) + col("__nc2"))
      .groupBy("vec_id")
      .agg(min(struct(col("__d2"), col("cluster"), col("__qv"))).as("__b"))
      .select(col("vec_id"), col("__b.__d2").as("dist2"),
        col("__b.cluster").as("cluster"), col("__b.__qv").as("__qv"))
}
