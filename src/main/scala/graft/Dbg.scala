package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.where(col("vec_id") < 5)
    val bf = pipeline.Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 10)
    for ((r, iters, ex) <- Seq((16, 20, 24), (12, 24, 24), (12, 20, 24))) {
      val ann = pipeline.Similarity.pcaTopKExact(emb, q, "vec_id", "embedding", 10, r = r, iters = iters, expand = ex)
      val rec = bf.as("b").join(ann.as("a"),
          col("b.query_id") === col("a.query_id") && col("b.neighbor_id") === col("a.neighbor_id"), "left")
        .groupBy(col("b.query_id")).agg((count(col("a.neighbor_id")) / 10.0).as("recall"))
        .orderBy("query_id").collect()
      println(s"r=$r iters=$iters ex=$ex recall: " + rec.map(x => f"${x.getDouble(1)}%.2f").mkString(" "))
    }
    // float r=16 comparison
    val annF = pipeline.Similarity.pcaTopK(emb, q, "vec_id", "embedding", 10, r = 16)
    val recF = bf.as("b").join(annF.as("a"),
        col("b.query_id") === col("a.query_id") && col("b.neighbor_id") === col("a.neighbor_id"), "left")
      .groupBy(col("b.query_id")).agg((count(col("a.neighbor_id")) / 10.0).as("recall"))
      .orderBy("query_id").collect()
    println("float r=16 recall: " + recF.map(x => f"${x.getDouble(1)}%.2f").mkString(" "))
    spark.stop()
  }
}
