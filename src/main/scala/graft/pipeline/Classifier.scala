package graft.pipeline

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable text-quality classification — the modern curation stage the
  * heuristic signals feed (FineWeb-Edu / DCLM shape: label a small seed
  * set, train a cheap linear classifier, score the whole corpus, keep by
  * threshold). Spark-first: MLlib's hashed bag-of-words + logistic
  * regression, so training is one treeAggregate pass per iteration and
  * scoring is a broadcast-coefficients PURE MAP — at 100 TB the corpus
  * is scored in a single read with no shuffle at all.
  *
  * Tokenization is [[TextAnalysis.words]] — the same contract as every
  * other text operator, so classifier features agree with the vocab/
  * dedup/LM families. Feature hashing (`HashingTF`, murmur3) keeps the
  * feature space bounded regardless of vocabulary: no vocab broadcast,
  * no OOV handling, the classic trade of a controlled collision rate for
  * O(1) memory.
  *
  * Determinism: scoring is deterministic for a fixed model; training
  * sums gradients in partition order, so coefficients can drift ulps
  * across layouts — models meant to be reproducible forever should be
  * persisted ([[save]]/[[load]]), which round-trips bit-exact. Scores are
  * therefore spec-gated (accuracy floors on planted data), not
  * hash-gated. */
object Classifier {

  /** Train on (textCol, labelCol ∈ {0.0, 1.0}) rows. `numFeatures`
    * buckets the hashed token space (power of two; 2^18 ≈ a fastText
    * default). Returns the fitted model (coefficients = numFeatures
    * doubles — KBs, broadcastable anywhere). */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            numFeatures: Int = 1 << 18, maxIter: Int = 64,
            regParam: Double = 1e-4): LogisticRegressionModel = {
    require(numFeatures > 0 && (numFeatures & (numFeatures - 1)) == 0,
      s"numFeatures must be a power of two, got $numFeatures")
    // NULL text must not NPE inside HashingTF's transform UDF — crawled
    // corpora routinely carry null bodies; they contribute an empty doc
    val toks = labeled.select(col(labelCol).cast("double").as("label"),
      coalesce(TextAnalysis.words(col(textCol)), array()).as("__toks"))
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(numFeatures)
    new LogisticRegression().setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(tf.transform(toks))
  }

  /** Score a corpus: `idCol, quality_prob` (P(label = 1)). Coefficients
    * ride the closure (broadcast) — scoring is a pure map over one
    * corpus read, stream-safe. */
  def score(model: LogisticRegressionModel, df: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    val tf = new HashingTF().setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(model.numFeatures)
    val feats = tf.transform(df.select(col(idCol),
      coalesce(TextAnalysis.words(col(textCol)), array()).as("__toks")))
    model.transform(feats)
      .select(col(idCol),
        vector_to_array(col(model.getProbabilityCol)).getItem(1).as("quality_prob"))
  }

  /** Keep rows scoring ≥ `minProb` — the filter stage. left_semi: df rows
    * pass through exactly once even if ids repeat (an inner join would
    * multiply duplicate-id rows). */
  def filterByQuality(model: LogisticRegressionModel, df: DataFrame,
                      idCol: String, textCol: String,
                      minProb: Double): DataFrame =
    df.join(score(model, df, idCol, textCol)
      .where(col("quality_prob") >= minProb).select(idCol), Seq(idCol), "left_semi")

  def save(model: LogisticRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): LogisticRegressionModel =
    LogisticRegressionModel.load(path)
}
