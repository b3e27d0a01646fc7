package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable text-quality classification — the modern curation stage the
  * heuristic signals feed (FineWeb-Edu / DCLM shape: label a small seed
  * set, train a cheap linear classifier, score the whole corpus, keep by
  * threshold).
  *
  * r11: INTEGER-EXACT end to end (the engine's own fixed-point
  * discipline), replacing the MLlib float path whose gradient sums were
  * partition-order floats — the one remaining nondeterminism declaration.
  * The model is a hard-sigmoid linear classifier in micro-units:
  *
  *  - features: hashed bag of words, `f(tok) = h60(md5("qc:" ∥ tok)) mod
  *    numFeatures` — the house oracle-replayable hash (HashingTF's
  *    murmur3 was Spark-private), counts as values;
  *  - score: `p_ppm = clamp(500000 + (b + Σ_f w_f·x_f) DIV 4, 0, 10⁶)`
  *    — the standard hard sigmoid `clamp(½ + z/4)` saturating at |z| = 2,
  *    with weights/bias in micro-units and truncating integer DIV;
  *  - training: `epochs` rounds of full-batch LMS with the classic 1/e
  *    step decay, `w_f ← w_f − g_f DIV (2·e·n)` with `g_f = Σ_docs
  *    (p_ppm − y_ppm)·x_f` folded in DECIMAL(38,0) (overflow-safe at
  *    100 TB token counts) and the update division done in BigInt on the
  *    driver (truncation toward zero — the DIV/`//` convention both
  *    engines share). The BIAS step is scaled by `T = (Σ train tokens)
  *    DIV n` — the standard intercept scaling for unnormalized count
  *    features, without which the intercept moves ~T× slower than the
  *    weights and a length-correlated signal oscillates instead of
  *    separating (measured: 0.56 → 0.97+ held-out on the corpus
  *    length rule).
  *
  * Every step is replayable integer arithmetic, so the backing query
  * (`pipeline_quality_classifier`) HASH-GATES against a 3-epoch unrolled
  * DuckDB oracle (the pageRank unroll shape) instead of rows-only, and
  * training is bit-identical at any partition count (DeterminismSpec).
  *
  * Scale shape: per epoch, ONE corpus pass — scores are a pure map
  * against the broadcast literal weights (numFeatures longs, KBs), the
  * gradient is one explode + map-side-combining groupBy(feature) whose
  * result is a bounded driver artifact (≤ numFeatures rows, the k-means
  * centroid convention). Scoring a corpus is a single read with no
  * shuffle at all, stream-safe.
  *
  * Tokenization is [[TextAnalysis.words]] — the same contract as every
  * other text operator, so classifier features agree with the vocab/
  * dedup/LM families. */
object Classifier {

  /** Trained model: `numFeatures` hashed buckets, micro-unit weights and
    * bias. KBs — rides any closure. */
  case class QualityModel(numFeatures: Int, bias: Long, weights: Array[Long])

  private val dec = "decimal(38,0)"

  /** feature id of a token column: md5-h60("qc:" ∥ tok) mod numFeatures. */
  private def featIdx(tok: org.apache.spark.sql.Column, numFeatures: Int) =
    conv(substring(md5(concat(lit("qc:"), tok)), 1, 15), 16, 10)
      .cast("long") % numFeatures

  /** micro-unit hard-sigmoid score of a token array against literal
    * weights — one aggregate fold per row, a pure map (no join, no
    * shuffle; the scoreWithImportanceModel shape). */
  private def scoreCol(toks: org.apache.spark.sql.Column, m: QualityModel) = {
    val w = lit(m.weights)
    val z = aggregate(coalesce(toks, array()), lit(m.bias),
      (acc, t) => acc + element_at(w, (featIdx(t, m.numFeatures) + 1L).cast("int")))
    // trunc z DIV 4 without a named column: z − (z % 4) is the exact
    // multiple (Spark % carries the dividend's sign, so the subtraction
    // truncates toward zero like DIV/`//`), and an arithmetic shift
    // divides an exact multiple of 4 exactly — negatives included
    least(lit(1000000L), greatest(lit(0L),
      lit(500000L) + shiftright(z - (z % lit(4L)), 2)))
  }

  /** Train on (textCol, labelCol ∈ {0.0, 1.0}) rows. Deterministic:
    * same data → bit-identical model at any parallelism. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 14, epochs: Int = 6): QualityModel = {
    require(numFeatures > 0 && numFeatures <= (1 << 20),
      s"numFeatures must be in (0, 2^20], got $numFeatures")
    require(epochs >= 1 && epochs <= 64, s"epochs must be in [1, 64], got $epochs")
    // r16 optimization: the tokenized training frame is a lazy shared-RDD
    // checkpoint — the head action below warms it, and the 2-actions-per-
    // epoch loop reads the cache instead of re-running words() over the
    // corpus 2·epochs times (the iterative-trainer caching convention;
    // disk-backed, released with the session)
    val docs = Materialize.cutLazy(labeled.select(
      (col(labelCol).cast("double") * 1000000).cast("long").as("__y"),
      coalesce(TextAnalysis.words(col(textCol)), array()).as("__toks")))
    val head = docs.agg(count(lit(1)), sum(size(col("__toks")).cast("long"))).head
    val n = head.getLong(0)
    require(n > 0, "train needs at least one labeled row")
    // intercept scale: mean tokens per doc (exact truncating division)
    val tScale = java.math.BigInteger.valueOf(math.max(1L, head.getLong(1) / n))
    var model = QualityModel(numFeatures, 0L, Array.fill(numFeatures)(0L))
    var e = 1
    while (e <= epochs) {
      // 1/e step decay: LMS with a FIXED step on saturating targets
      // oscillates around the boundary; the decaying schedule converges
      val den = java.math.BigInteger.valueOf(2L * e * n)
      val scored = docs.withColumn("__err", scoreCol(col("__toks"), model) - col("__y"))
      // bias gradient + per-feature gradients in ONE action per epoch
      // (r17, guide §1.2 — was 2: a scalar agg + the feature collect).
      // Every doc emits one SENTINEL row (a null token prepended to its
      // array — empty-token docs included), and featIdx(null) is null, so
      // the null group IS Σ_docs err = the bias gradient while every real
      // feature group is untouched (null never hashes into a feature id).
      // DECIMAL folds (err ≤ 10⁶ per occurrence); the per-feature frame
      // is ≤ numFeatures + 1 rows — a bounded artifact
      val gRows = scored
        .select(explode(concat(array(lit(null).cast("string")), col("__toks"))).as("__t"),
          col("__err"))
        .groupBy(featIdx(col("__t"), numFeatures).as("__f"))
        .agg(sum(col("__err").cast(dec)).as("__g"))
        .collect()
      val w = model.weights.clone()
      var gb = java.math.BigDecimal.ZERO
      gRows.foreach { r =>
        if (r.isNullAt(0)) gb = r.getDecimal(1)
        else {
          val f = r.getLong(0).toInt
          // BigInt `/` truncates toward zero — the DIV convention
          w(f) -= r.getDecimal(1).toBigInteger.divide(den).longValueExact()
        }
      }
      model = QualityModel(numFeatures,
        model.bias - gb.toBigInteger.multiply(tScale).divide(den).longValueExact(), w)
      e += 1
    }
    model
  }

  /** Score a corpus: `idCol, quality_ppm` (micro-unit P(label = 1)).
    * Pure map over one corpus read — stream-safe; NULL text scores as an
    * empty doc (p = clamp(½ + bias/4)). */
  def score(model: QualityModel, df: DataFrame,
            idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      scoreCol(TextAnalysis.words(col(textCol)), model).as("quality_ppm"))

  /** Keep rows scoring ≥ `minPpm` — the filter stage. left_semi: df rows
    * pass through exactly once even if ids repeat (an inner join would
    * multiply duplicate-id rows). */
  def filterByQuality(model: QualityModel, df: DataFrame,
                      idCol: String, textCol: String,
                      minPpm: Long): DataFrame =
    df.join(score(model, df, idCol, textCol)
      .where(col("quality_ppm") >= minPpm).select(idCol), Seq(idCol), "left_semi")

  /** Persist as one parquet row (num_features, bias, weights) — the
    * round-trip is exact (all integers). */
  def save(model: QualityModel, path: String): Unit = {
    val s = SparkSession.active
    import s.implicits._
    Seq((model.numFeatures, model.bias, model.weights.toSeq))
      .toDF("num_features", "bias", "weights")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(path: String): QualityModel = {
    val r = SparkSession.active.read.parquet(path)
      .select("num_features", "bias", "weights").head
    QualityModel(r.getInt(0), r.getLong(1), r.getSeq[Long](2).toArray)
  }
}
