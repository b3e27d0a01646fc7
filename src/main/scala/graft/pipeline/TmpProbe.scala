package graft.pipeline

// TEMPORARY r17 measurement probe — NOT part of the engine; deleted before
// round close. Times the pieces of the r17 optimization targets in
// isolation (guide §1: measure first) against the staged bench parquet.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object TmpProbe {

  def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Forward pass of betweennessCentrality, verbatim replica (for isolating
    * forward vs backward cost). Returns the level count. */
  def bcForwardOnly(edges: DataFrame, nSeeds: Int, rounds: Int): Int = {
    val e0 = Materialize.cutLazy(
      edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src") =!= col("dst")).distinct())
    val nodeSet = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
    val seeds = nodeSet
      .withColumn("__h",
        conv(substring(md5(concat(lit("bc:"), col("node").cast("string"))), 1, 15), 16, 10)
          .cast("long"))
      .orderBy(col("__h"), col("node"))
      .limit(nSeeds)
      .select(col("node").as("seed"))
    val eSrc = Materialize.cutLazy(e0.repartition(col("src")))
    val lvl0 = Materialize.cutLazy(seeds.select(col("seed").as("node"), col("seed"),
      lit(1).cast("decimal(38,0)").as("sigma")))
    val levels = scala.collection.mutable.ArrayBuffer[DataFrame](lvl0)
    var visited = lvl0.select(col("node").as("__vn"), col("seed").as("__vs"))
    var frontier = lvl0
    timed("  fwd: eSrc materialize")(eSrc.count())
    var r = 0
    var done = false
    while (r < rounds && !done) {
      r += 1
      val cand = eSrc.join(frontier.hint("shuffle_hash"),
          eSrc("src") === frontier("node"))
        .groupBy(col("dst"), col("seed"))
        .agg(sum(col("sigma")).cast("decimal(38,0)").as("sigma"))
      val fresh = timed(s"  fwd round $r cutLazy (planning)")(Materialize.cutLazy(
        cand.join(visited.hint("shuffle_hash"),
            cand("dst") === col("__vn") && cand("seed") === col("__vs"),
            "left_anti")
          .select(col("dst").as("node"), col("seed"), col("sigma"))))
      val n = timed(s"  fwd round $r")(fresh.count())
      if (n == 0L) done = true
      else {
        levels += fresh
        visited = visited.union(
          fresh.select(col("node").as("__vn"), col("seed").as("__vs")))
        frontier = fresh
      }
    }
    levels.size
  }

  /** Variant: merged-state full-outer forward (the shortestPaths shape). */
  def bcForwardMerged(edges: DataFrame, nSeeds: Int, rounds: Int): Int = {
    val e0 = Materialize.cutLazy(
      edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
        .where(col("src") =!= col("dst")).distinct())
    val nodeSet = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct()
    val seeds = nodeSet
      .withColumn("__h",
        conv(substring(md5(concat(lit("bc:"), col("node").cast("string"))), 1, 15), 16, 10)
          .cast("long"))
      .orderBy(col("__h"), col("node"))
      .limit(nSeeds)
      .select(col("node").as("seed"))
    val eSrc = Materialize.cutLazy(e0.repartition(col("src")))
    var state = Materialize.cutLazy(seeds.select(col("seed").as("node"), col("seed"),
      lit(0).as("lvl"), lit(1).cast("decimal(38,0)").as("sigma")))
    var frontier = state
    timed("  fwdM: eSrc materialize")(eSrc.count())
    var r = 0
    var done = false
    while (r < rounds && !done) {
      r += 1
      val cand = eSrc.join(frontier.hint("shuffle_hash"),
          eSrc("src") === frontier("node"))
        .groupBy(col("dst"), col("seed"))
        .agg(sum(col("sigma")).cast("decimal(38,0)").as("sigma"))
      val merged = timed(s"  fwdM round $r cutLazy (planning)")(Materialize.cutLazy(
        state.withColumnRenamed("node", "__sn").withColumnRenamed("seed", "__ss")
          .withColumnRenamed("sigma", "__ssig")
          .join(cand.hint("shuffle_hash"),
            col("__sn") === col("dst") && col("__ss") === col("seed"), "full")
          .select(
            coalesce(col("__sn"), col("dst")).as("node"),
            coalesce(col("__ss"), col("seed")).as("seed"),
            coalesce(col("lvl"), lit(r)).as("lvl"),
            coalesce(col("__ssig"), col("sigma")).as("sigma"),
            col("__sn").isNull.as("__new"))))
      frontier = merged.where(col("__new")).select("node", "seed", "sigma")
      val n = timed(s"  fwdM round $r")(frontier.count())
      if (n == 0L) done = true
      state = merged.select("node", "seed", "lvl", "sigma")
    }
    rounds
  }

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("all")
    val dir = "target/bench_staged/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // the tradeEdges memo build (shared frame the bench queries read)
    def tradeEdges(): DataFrame = {
      val e0 = orders
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .agg(countDistinct(col("o_orderkey")).as("w"))
      Materialize(
        e0.select(col("c").as("src"), (col("sp") + 1000000L).as("dst"), col("w"))
          .union(e0.select((col("sp") + 1000000L).as("src"), col("c").as("dst"),
            col("w"))).select("src", "dst"))
    }

    // warmup: JIT + codegen on an unrelated small query
    noop(docs.limit(100).select(length(col("text"))))

    if (what == "all" || what == "bc") {
      val te = timed("tradeEdges build")(tradeEdges())
      timed("bc forward-only (8 seeds, 4 rounds)")(
        println("  levels=" + bcForwardOnly(te, 8, 4)))
      timed("bc forward-MERGED (8 seeds, 4 rounds)")(
        println("  rounds=" + bcForwardMerged(te, 8, 4)))
      timed("bc forward-only again")(
        println("  levels=" + bcForwardOnly(te, 8, 4)))
      timed("bc forward-MERGED again")(
        println("  rounds=" + bcForwardMerged(te, 8, 4)))
      timed("bc FULL (8 seeds, 4 rounds)")(
        noop(Graph.betweennessCentrality(te, "src", "dst", 8, 4)))
      timed("bc FULL again")(
        noop(Graph.betweennessCentrality(te, "src", "dst", 8, 4)))
    }

    if (what == "all" || what == "pr") {
      val d500 = docs.where(col("doc_id") < 500)
      timed("minhashCandidates (128h, 16 bands, sh5)")(
        noop(Dedup.minhashCandidates(d500, "doc_id", "text", 128, 16, 5, 200)))
      timed("similarityJoin exact (80pct, sh5)")(
        noop(Dedup.similarityJoin(d500, "doc_id", "text", 80, 5)))
      timed("bandingPrAudit FULL")(
        noop(Dedup.bandingPrAudit(d500, "doc_id", "text")))
      // shingle-only pass cost (the shared-frame candidate)
      timed("shingleSet scan only")(
        noop(d500.select(col("doc_id"), Dedup.shingleSet(col("text"), 5).as("sh"))))
      timed("minhash signature scan only")({
        import org.apache.spark.sql.graftshim.{GraftShim => E}
        noop(d500.select(col("doc_id"),
          E.column(graft.functions.MinHashSignature(
            E.expression(col("text")), 128, 5)).as("sig")))
      })
    }

    if (what == "all" || what == "cc") {
      val li = lineitem.where(col("l_orderkey") % 16 === 0)
      val e = li.as("x").join(li.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        .distinct()
      timed("graph_components cc (run 1)")(
        noop(Graph.connectedComponents(e, "src", "dst")))
      timed("graph_components cc (run 2)")(
        noop(Graph.connectedComponents(e, "src", "dst")))
    }

    spark.stop()
  }
}
