package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed at SPARK_GRAFT_SF_DIR,
  * one JSON line to stdout. entry() runs untimed first so JVM/codegen
  * warmup isn't booked to whichever query happens to run first.
  *
  * Each query is materialized with a `noop`-format write, not `.count()`:
  * count lets the optimizer prune unreferenced projections and eliminate
  * sorts, so projection-heavy queries (text_*, jq scalar extraction) would
  * be timed as bare scan+count. The noop sink consumes every column of
  * every row and discards them — the honest analogue of writing output.
  *
  * A query that throws is reported with time -1 and listed under "failed",
  * so a failure can never masquerade as a fast success. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup covers both engine families so no timed query pays first-call
    // JIT/codegen cost: the jq generator path (entry) and the pipeline
    // expression path (minhash/shingle/LSH over a tiny slice).
    try {
      SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
      pipeline.Dedup.minhashDedupPairs(docs, "doc_id", "text").count()
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)
      pipeline.Similarity.lshTopK(emb, emb.limit(3), "vec_id", "embedding", k = 5).count()
    }
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
