package graft

import org.apache.spark.sql.graftshim.GraftShim
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SharedSpark

/** Plan-shape evidence for the SURVEY §2.6 scale claims: filters reach the
  * parquet scan (PushedFilters) and unused columns are pruned out of the
  * read (ReadSchema). A scan that reads every column for a two-column
  * projection is the kind of regression that only shows up at 100 TB, so
  * it is asserted here, not assumed. */
class PlanSpec extends AnyFunSuite {

  lazy val spark = SharedSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("rel_q1_agg pushes the shipdate filter into the parquet scan") {
    val plan = GraftShim.explainString(SparkEntry.queries("rel_q1_agg")(spark, sf))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate predicate not pushed:\n$plan")
  }

  test("rel_q1_agg prunes the lineitem read schema to the referenced columns") {
    val plan = GraftShim.explainString(SparkEntry.queries("rel_q1_agg")(spark, sf))
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema:"))
      .getOrElse(fail(s"no ReadSchema in:\n$plan"))
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus", "l_shipdate")
      .foreach(c => assert(readSchema.contains(c), s"$c missing from $readSchema"))
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_comment")
      .foreach(c => assert(!readSchema.contains(c), s"unreferenced $c read anyway: $readSchema"))
  }

  test("jq_single_int reads only event_type and props from the events scan") {
    val plan = GraftShim.explainString(SparkEntry.queries("jq_single_int")(spark, sf))
    val readSchema = plan.linesIterator.find(_.trim.startsWith("ReadSchema:"))
      .getOrElse(fail(s"no ReadSchema in:\n$plan"))
    assert(readSchema.contains("event_type") && readSchema.contains("props"))
    Seq("event_id", "user_id", "value").foreach(c =>
      assert(!readSchema.contains(c), s"generator query reads unreferenced column $c: $readSchema"))
  }

  test("GraftExtensions injects all SQL functions via spark.sql.extensions") {
    val names = GraftShim.extensionFunctionNames(new GraftExtensions()(_))
    // the ENTIRE register() surface, so the two deployment paths can't
    // drift apart again (extensions used to inject only the jq trio)
    graft.Graft.all.map(_._1).foreach(f =>
      assert(names.contains(f), s"$f not injected by GraftExtensions"))
  }

  test("rel_q3_join broadcasts the filtered customer dimension") {
    val plan = GraftShim.explainString(SparkEntry.queries("rel_q3_join")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"small-dimension join not broadcast:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)")
      || plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"mktsegment predicate not pushed:\n$plan")
  }

  test("rel_asof_join plan: no inequality join, single key-partitioned sort") {
    val plan = GraftShim.explainString(SparkEntry.queries("rel_asof_join")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"as-of join fell back to an inequality/cartesian join:\n$plan")
    assert(plan.contains("Window"), s"running-last window missing:\n$plan")
    // exactly one exchange partitions by the join key; the only other
    // exchange is the final presentation sort (rangepartitioning)
    val hashParts = "hashpartitioning\\(".r.findAllIn(plan).length
    assert(hashParts == 1, s"expected 1 hashpartitioning exchange, got $hashParts:\n$plan")
  }

  test("text_decontam plan: benchmark grams broadcast, train side never hash-shuffled before the join") {
    val plan = GraftShim.explainString(SparkEntry.queries("text_decontam")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"train side shuffled into a merge join:\n$plan")
  }

  test("rel_topk_agg plan: bounded aggregate, no per-group window") {
    val plan = GraftShim.explainString(SparkEntry.queries("rel_topk_agg")(spark, sf))
    assert(plan.contains("top_k_pairs"), s"TopKPairs aggregate missing:\n$plan")
    assert(!plan.contains("Window"), s"single-reducer window still present:\n$plan")
  }

  test("text_packing plan: one shard-partitioned exchange, ROWS-framed running sum") {
    val plan = GraftShim.explainString(SparkEntry.queries("text_packing")(spark, sf))
    val hashParts = "hashpartitioning\\(".r.findAllIn(plan).length
    assert(hashParts == 1, s"expected 1 hashpartitioning exchange, got $hashParts:\n$plan")
    assert(plan.contains("specifiedwindowframe(RowFrame"),
      s"running sum not ROWS-framed (RANGE would merge duplicate ids):\n$plan")
  }

  test("text_vocab plan: per-partition top-N (TakeOrdered), no global sort") {
    val plan = GraftShim.explainString(SparkEntry.queries("text_vocab")(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"top-N not TakeOrdered:\n$plan")
  }

  test("dedup_crosscorpus plan: reference hashes broadcast into a LEFT ANTI join") {
    val plan = GraftShim.explainString(SparkEntry.queries("dedup_crosscorpus")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"cross-corpus gate must be a broadcast anti join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"fresh (100 TB) side shuffled into a merge join:\n$plan")
  }

  test("rel_q6_forecast plan: every predicate reaches the parquet scan") {
    val plan = GraftShim.explainString(SparkEntry.queries("rel_q6_forecast")(spark, sf))
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(plan.contains(s"IsNotNull($c)") || plan.contains(s"GreaterThanOrEqual($c"),
        s"$c predicate not pushed:\n$plan"))
    assert(plan.contains("PushedFilters:") && plan.contains("LessThan(l_quantity,24.0)"),
      s"quantity predicate not pushed:\n$plan")
  }

  test("pipeline_source_filter plan: source verdicts broadcast back, corpus not merge-joined") {
    val plan = GraftShim.explainString(SparkEntry.queries("pipeline_source_filter")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"source verdict table not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled into a merge join:\n$plan")
  }

  test("rel_range_join plan: binned equi join, no nested-loop fallback") {
    val plan = GraftShim.explainString(SparkEntry.queries("rel_range_join")(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested-loop join:\n$plan")
  }

  // Q2/Q20 audit (VERDICT r4 #3): a CTE referenced twice (Q2's correlated
  // scalar-MIN over costs, Q20's ps ⋈ pt) is NOT deduplicated by Spark —
  // the measured plans evaluated the whole lineitem join twice with no
  // ReusedExchange. Both queries were restructured as window aggregates
  // over ONE pass; at 100× a silently recomputed 4-table join is a full
  // extra corpus pass, so the single-scan shape is pinned here.
  test("rel_q2_min_cost plan: ONE lineitem scan (window-min, no CTE re-evaluation)") {
    val plan = SparkEntry.queries("rel_q2_min_cost")(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$plan")
  }

  test("rel_q20_excess_supply plan: ONE lineitem scan (window totals, no CTE re-evaluation)") {
    val plan = SparkEntry.queries("rel_q20_excess_supply")(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans == 1, s"expected 1 lineitem scan, got $scans:\n$plan")
  }

  test("sketch queries plan: ObjectHashAggregate carries k-bounded states, no sort-agg fallback") {
    // the whole point of the sketch aggregates is bounded two-phase
    // aggregation; a SortAggregate fallback would buffer and sort whole
    // groups and a missing partial_ stage would ship raw rows
    Seq("text_heavy_hitters", "text_len_quantile_sketch", "pipeline_sample_per_group")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(plan.contains("ObjectHashAggregate"),
          s"$q must aggregate under ObjectHashAggregate:\n$plan")
        assert(plan.contains("partial_"),
          s"$q must partial-aggregate map-side:\n$plan")
      }
  }

  test("pipeline_source_mix plan: keep filter is a pure map — no join, no exchange before the filter") {
    // the per-source cuts are driver-computed constants folded into ONE
    // when-chain filter; the corpus must not shuffle or join to be gated
    val plan = SparkEntry.queries("pipeline_source_mix")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"source mix must not join the corpus:\n$plan")
    // the only allowed exchange is the final orderBy's range partitioning
    val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(plan.linesIterator.count(_.contains("rangepartitioning")) >= exchanges - 1,
      s"unexpected non-sort exchange in the mix plan:\n$plan")
  }

  test("text_bpe_encode plan: encode stage reads the corpus once, no shuffle") {
    val plan = SparkEntry.queries("text_bpe_encode")(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    assert(scans == 1, s"encode output must be one documents scan, got $scans:\n$plan")
    assert(plan.contains("bpe_encode"), s"encode expression missing:\n$plan")
  }

  test("text_span_dedup plan: equi joins only, gram hashing below every exchange") {
    val plan = SparkEntry.queries("text_span_dedup")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"span removal must never fall back to a non-equi join:\n$plan")
    // the coverage explode is sequence()-based (output-proportional), and
    // the only Generates are the two posexplodes + that sequence
    assert(plan.contains("explode(sequence("), s"coverage explode missing:\n$plan")
  }

  test("pipeline_dsir_weights plan: the 65536-row model broadcasts, corpus rollup is the only doc-side exchange") {
    val plan = SparkEntry.queries("pipeline_dsir_weights")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"model side must broadcast (explicit broadcast hint):\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"scoring must not sort-merge the corpus against the model:\n$plan")
  }

  test("CartesianGuard: unconditioned products fail at planning; hints and conditions pass") {
    import org.apache.spark.sql.functions.{broadcast, lit}
    val guard = graft.plans.CartesianGuard
    spark.conf.set(guard.ConfKey, "true")
    try {
      val a = spark.range(10).toDF("x")
      val b = spark.range(10).toDF("y")
      val err = intercept[IllegalStateException] {
        guard(a.crossJoin(b).queryExecution.optimizedPlan)
      }
      assert(err.getMessage.contains("cartesian"), err.getMessage)
      // the engine's own bounded-cohort pattern (mutualNearest,
      // hardNegatives): an explicit broadcast IS the "one side is small
      // by construction" claim, so it passes
      guard(b.join(broadcast(a), lit(true)).queryExecution.optimizedPlan)
      // ...but an UNHINTED trivially-true condition is still a product —
      // `ON true` never folds to None, so it must not slip the guard
      intercept[IllegalStateException] {
        guard(a.join(b, lit(true)).queryExecution.optimizedPlan)
      }
      // any conditioned join passes (non-equi = the range-join family)
      guard(a.join(b, a("x") === b("y")).queryExecution.optimizedPlan)
      // conditioned CROSS-typed joins pass: after predicate pushdown
      // crossJoin(b).where(x = y) keeps joinType Cross but plans as an
      // ordinary equi join, not a product
      guard(a.crossJoin(b).where(a("x") === b("y")).queryExecution.optimizedPlan)
      // flag off: pure no-op
      spark.conf.set(guard.ConfKey, "false")
      guard(a.crossJoin(b).queryExecution.optimizedPlan)
    } finally spark.conf.unset(guard.ConfKey)
  }

  test("dedup_simjoin_exact plan: prefix-filter candidates via equi joins only") {
    val plan = SparkEntry.queries("dedup_simjoin_exact")(spark, sf)
      .queryExecution.executedPlan.toString
    // the whole point of prefix filtering is that the candidate stage is
    // an EQUI join on prefix tokens — any nested-loop/cartesian fallback
    // means the op silently became the quadratic cross join it replaces
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"similarity join fell back to a non-equi join:\n$plan")
  }

  test("dedup_containment plan: A-prefix × B-postings equi join, no cross join") {
    val plan = SparkEntry.queries("dedup_containment")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"containment join fell back to a non-equi join:\n$plan")
  }

  test("emb_mutual_pairs plan: argmax aggregates, never a per-query window sort") {
    val plan = SparkEntry.queries("emb_mutual_pairs")(spark, sf)
      .queryExecution.executedPlan.toString
    // both directions' top-1 must be max(struct) AGGREGATES (partial agg
    // map-side → one struct per query per task crosses the shuffle); a
    // row_number window would ship every scored row to one reducer per
    // key. Struct-typed max buffers aren't hash-aggregable, so the
    // argmax legitimately runs as SortAggregate — partial+final pairs
    // still bound the shuffle; only a Window violates the contract.
    assert(!plan.contains("Window"), s"mutual-NN must not window-sort:\n$plan")
    assert(plan.contains("SortAggregate") || plan.contains("HashAggregate") ||
      plan.contains("ObjectHashAggregate"), s"argmax aggregate missing:\n$plan")
  }

  test("emb_mutual_pairs_blocked plan: list-key shuffle joins, no product, no window") {
    // the full query's final plan starts at the Materialize cut (Scan
    // ExistingRDD), so the candidate stage is asserted on ivfScoredPairs
    // DIRECTLY: the join must be the hinted shuffle-hash on the list key
    // (no sort of vector-carrying rows) and never a product/BNLJ — a
    // fallback means the op silently became the all-pairs it replaces
    import org.apache.spark.sql.functions.col
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cand = graft.pipeline.Similarity.ivfScoredPairs(
      emb, emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding",
      nLists = 8, nProbe = 2, sampleSize = 200)
    val cplan = cand.queryExecution.executedPlan.toString
    assert(cplan.contains("ShuffledHashJoin"),
      s"list join should be the hinted shuffle-hash join:\n$cplan")
    assert(!cplan.contains("CartesianProduct") && !cplan.contains("BroadcastNestedLoop"),
      s"scored candidates must never form a product:\n$cplan")
    assert(!cplan.contains("SortMergeJoin"),
      s"vector-carrying rows must not be sorted for the list join:\n$cplan")
    // r9: the pair stream is duplicate-free BY CONSTRUCTION (corpus rows
    // carry 1 list, a query probes nProbe DISTINCT lists), so there must
    // be no dedup exchange after the list join — exactly the two list-key
    // exchanges feed the join and nothing re-shuffles the pair stream
    val exchanges = cplan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2,
      s"scored candidates must shuffle exactly twice (list keys), got $exchanges:\n$cplan")
    // the composed query's argmax tail: aggregates, never a window
    val plan = SparkEntry.queries("emb_mutual_pairs_blocked")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no per-query window sort:\n$plan")
  }

  test("emb_decontam plan: benchmark broadcast product + argmax aggregate, no window") {
    val plan = SparkEntry.queries("emb_decontam")(spark, sf)
      .queryExecution.executedPlan.toString
    // the benchmark side is bounded by construction and must BROADCAST
    // (the corpus never shuffles for scoring); the per-vector nearest is
    // an argmax aggregate, never a window
    assert(plan.contains("BroadcastNestedLoop"),
      s"benchmark must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no per-vector window sort:\n$plan")
  }

  test("multimodal pcm/image stats plans: decode maps — no join, no hash shuffle") {
    for (q <- Seq("multimodal_pcm_stats", "multimodal_pcm_silence",
        "multimodal_image_stats", "multimodal_frame_phash")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      // builder → decode → stats is a pure per-partition pipeline: the
      // only exchange is the output orderBy's range partitioning
      assert(!plan.contains("Join"), s"$q must not join:\n$plan")
      val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(hashEx == 0, s"$q must not hash-shuffle, got $hashEx:\n$plan")
    }
  }

  test("text_strip_markup / text_script_profile plans: pure maps — no join, no hash shuffle") {
    for (q <- Seq("text_strip_markup", "text_script_profile")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$q must not join:\n$plan")
      val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(hashEx == 0, s"$q must not hash-shuffle, got $hashEx:\n$plan")
    }
  }

  test("text_gopher_rules plan: pure map — no exchange, no join") {
    val plan = SparkEntry.queries("text_gopher_rules")(spark, sf)
      .queryExecution.executedPlan.toString
    // the orderBy in the query adds a range exchange for output; nothing
    // else may shuffle, and no join may appear
    assert(!plan.contains("Join"), s"gopher rules must not join:\n$plan")
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 0, s"gopher rules must not hash-shuffle, got $hashEx:\n$plan")
  }

  test("rel_skyline plan: the global window runs over the AGGREGATED distinct-x frame") {
    val plan = SparkEntry.queries("rel_skyline")(spark, sf)
      .queryExecution.executedPlan.toString
    // no quadratic fallback anywhere
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"skyline fell back to a non-equi join:\n$plan")
    // the single-partition exchange (the window's input) must sit ABOVE a
    // partial/final aggregate pair — i.e. the window sees per-x maxima,
    // never corpus rows; if the aggregate vanished the op re-became the
    // single-reducer corpus sort it was designed to avoid
    val lines = plan.linesIterator.toSeq
    val spIdx = lines.indexWhere(_.contains("Exchange SinglePartition"))
    assert(spIdx >= 0, s"no single-partition window input found:\n$plan")
    assert(lines.drop(spIdx).exists(l => l.contains("HashAggregate") || l.contains("SortAggregate")),
      s"window input is not the aggregated distinct-x frame:\n$plan")
  }

  test("rel_histogram / pipeline_expectations plans: single aggregate pass, no join, no window") {
    for (q <- Seq("rel_histogram", "pipeline_expectations")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$q must not join:\n$plan")
      assert(!plan.contains("Window"), s"$q must not window:\n$plan")
    }
  }

  test("emb_drift plan: states join AFTER aggregation — corpus rows never join") {
    val plan = SparkEntry.queries("emb_drift")(spark, sf)
      .queryExecution.executedPlan.toString
    // the join input on each side must be an aggregate (bucket×dim state),
    // not raw exploded vectors: a pre-aggregation join would ship the
    // corpus twice through a corpus-sized join
    val lines = plan.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("Join"))
    assert(joinIdx >= 0, s"expected the state join:\n$plan")
    // below the join (its children print after it), the first aggregation-
    // or-explode operator of each side must be the AGGREGATE — the explode
    // must sit under it, so only bucket×dim states reach the join
    val below = lines.drop(joinIdx + 1)
    val firstGen = below.indexWhere(_.contains("Generate"))
    val firstAgg = below.indexWhere(l => l.contains("HashAggregate") || l.contains("SortAggregate"))
    assert(firstGen >= 0 && firstAgg >= 0 && firstAgg < firstGen,
      s"join child is not an aggregated state (agg@$firstAgg vs explode@$firstGen):\n$plan")
  }

  test("search_rbo plan: prefix joins stay equi, weight lookup is a literal array") {
    val plan = SparkEntry.queries("search_rbo")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"rbo joined non-equi:\n$plan")
  }

  test("rel_ks_test plan: the single-partition window input is the distinct-value aggregate") {
    val plan = SparkEntry.queries("rel_ks_test")(spark, sf)
      .queryExecution.executedPlan.toString
    // the skyline rule: the global running-sum window must see per-value
    // side counts, never corpus rows — if the collapse aggregate
    // vanished, the op re-became a single-reducer corpus sort
    val lines = plan.linesIterator.toSeq
    val spIdx = lines.indexWhere(_.contains("Exchange SinglePartition"))
    assert(spIdx >= 0, s"no single-partition window input:\n$plan")
    assert(lines.drop(spIdx).exists(l => l.contains("HashAggregate") || l.contains("SortAggregate")),
      s"KS window input is not the distinct-value aggregate:\n$plan")
  }

  test("ts_islands plan: both island windows share one key-partitioned exchange") {
    val plan = SparkEntry.queries("ts_islands")(spark, sf)
      .queryExecution.executedPlan.toString
    // running-max and running-open-count sort identically — a second
    // hashpartitioning(user_id) exchange between the two Window nodes
    // would mean the sort/partitioning reuse contract broke
    val hashEx = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    // one exchange feeds the windows; the island rollup groupBy(key, isl)
    // legitimately re-exchanges, and the interval build aggregates before
    // it — bound the total rather than pin internals: 3 hash exchanges
    // (interval rollup, window input, island rollup)
    assert(hashEx <= 3, s"expected ≤ 3 hash exchanges, got $hashEx:\n$plan")
    assert(plan.contains("Window"), s"no window in islands plan:\n$plan")
  }

  test("pipeline_benford plan: no shuffle wider than the 9-digit rollup; literal table broadcasts") {
    val plan = SparkEntry.queries("pipeline_benford")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"benford reference table should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"benford must never sort-merge (9-row side):\n$plan")
  }

  test("graph_links plan: wedge join and anti join stay equi — no quadratic fallback") {
    val plan = SparkEntry.queries("graph_links")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"linkPrediction fell back to a non-equi join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be a TakeOrdered, not a global sort:\n$plan")
  }

  test("pipeline_skew_audit plan: cumulative sums ride the RangeScan buckets, totals broadcast") {
    // r12: the two-level collapse (per-key counts → count-of-counts) runs
    // inside RangeScan's materialize job (its exactness is pinned by
    // RangeScanSpec + the value gate); the FINAL plan must show only
    // bucket-disciplined windows and broadcast combines — a SortMergeJoin
    // or a __rs_b-free window means the collapse/scan discipline broke
    val plan = SparkEntry.queries("pipeline_skew_audit")(spark, sf)
      .queryExecution.executedPlan.toString
    val badWin = plan.split('\n').filter(l =>
      l.contains("Window [") && !l.contains("__rs_b"))
    assert(badWin.isEmpty, s"window outside the bucket discipline:\n${badWin.mkString("\n")}")
    assert(!plan.contains("SortMergeJoin"), s"offsets/totals must broadcast:\n$plan")
  }

  test("pipeline_join_delta plan: stored sides are semi-filtered via broadcast, never scanned wide") {
    val plan = SparkEntry.queries("pipeline_join_delta")(spark, sf)
      .queryExecution.executedPlan.toString
    // the delta keys are tiny by definition and must BROADCAST into the
    // stored-side semi filters; a shuffle of a stored side keyed by the
    // delta would re-pay the full-join cost the op exists to avoid
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"stored sides must be broadcast-semi filtered:\n$plan")
  }

  test("sketch_hll_rolling plan: the range window runs over the CUT register grid, never raw events") {
    val plan = SparkEntry.queries("sketch_hll_rolling")(spark, sf)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val winIdx = lines.indexWhere(_.contains("Window ["))
    assert(winIdx >= 0, s"no window in:\n$plan")
    assert(lines(winIdx).contains("RangeFrame"),
      s"trailing-day frame must be a RANGE frame (gap days):\n$plan")
    // below the window: only the materialized register table (ExistingRDD
    // — the Materialize cut) feeds the grid join; a parquet scan of the
    // raw events here would mean the per-(day, bucket) collapse vanished
    // and the window slides over identity rows
    assert(!lines.drop(winIdx).exists(_.contains("FileScan")),
      s"raw corpus scan below the rolling window:\n$plan")
    assert(lines.drop(winIdx).exists(_.contains("ExistingRDD")),
      s"window input is not the cut register grid:\n$plan")
  }

  test("emb_kmeans plan: centroid table broadcasts, argmin is an aggregate, no window/SMJ") {
    val plan = SparkEntry.queries("emb_kmeans")(spark, sf)
      .queryExecution.executedPlan.toString
    // the k-row centroid frame must BROADCAST against the corpus (the
    // corpus never shuffles for assignment) and the per-vector nearest
    // centroid is a min(struct) AGGREGATE — a per-vector window sort or
    // a sort-merge join of vector rows is the 100 TB killer here
    assert(plan.contains("BroadcastNestedLoop"),
      s"centroids must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no per-vector window sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no SMJ of vector rows in assignment:\n$plan")
  }

  test("pipeline_pack_chop plan: the only single-partition window rides the 1024-row stratum offsets") {
    val plan = SparkEntry.queries("pipeline_pack_chop")(spark, sf)
      .queryExecution.executedPlan.toString
    val lines = plan.split('\n')
    // corpus prefix sums run under stratum-partitioned windows; exactly
    // ONE SinglePartition exchange is allowed — the bounded 1024-row
    // stratum-offset frame (a corpus-sized global window is the killer)
    assert(lines.count(_.contains("Exchange SinglePartition")) == 1,
      s"exactly one bounded single-partition exchange:\n$plan")
    assert(plan.contains("windowspecdefinition(__stratum"),
      s"interior prefix must partition by stratum:\n$plan")
    // offsets come back as a broadcast, never a shuffle of the corpus
    assert(plan.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no SMJ:\n$plan")
  }

  test("ts_seasonal plan: ONE trended-spine computation (materialized), phase means broadcast back") {
    val plan = SparkEntry.queries("ts_seasonal")(spark, sf)
      .queryExecution.executedPlan.toString
    // the trended spine is cut once: below the final join only the
    // materialized frame (ExistingRDD) appears — a FileScan of events
    // there means Catalyst re-expanded the gap-fill + MA window per reader
    assert(plan.split("FileScan").length - 1 == 0,
      s"post-materialize plan must not rescan the corpus:\n$plan")
    assert(plan.contains("ExistingRDD"), s"spine must be the cut frame:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"phase means must broadcast back:\n$plan")
  }

  test("pipeline_luhn_audit plan: pure map — no exchange except the output ordering") {
    val plan = SparkEntry.queries("pipeline_luhn_audit")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.split('\n').filter(_.contains("Exchange"))
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"the audit itself must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"no join in a per-row checksum:\n$plan")
  }

  test("rel_welch_t / events_ab_conversion plans: one partial-aggregated pass to a 1-row frame") {
    for (q <- Seq("rel_welch_t", "events_ab_conversion")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      // the global statistic collapses via map-side partials into ONE
      // SinglePartition exchange; a sort or join would mean the moments
      // stopped folding
      assert(plan.contains("Exchange SinglePartition"), s"$q:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
        s"$q must stay join-free:\n$plan")
      assert(plan.contains("partial"), s"$q moments must partial-aggregate:\n$plan")
    }
  }

  test("ts_cusum plan: all three detector windows + the rollup share ONE key-only exchange") {
    val plan = SparkEntry.queries("ts_cusum")(spark, sf)
      .queryExecution.executedPlan.toString
    // the gap-fill join (spine ⟕ rollup) is the operator's own; the
    // detector itself must not add a self-join
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cusum fell back to a product:\n$plan")
    // exactly one exchange partitions by the KEY ALONE — the baseline,
    // running-prefix and running-min windows plus the final groupBy(key)
    // all reuse it (the gap-fill's (key, day) exchanges are separate)
    val keyOnly = "hashpartitioning\\(user_id#\\d+L?, \\d+\\)".r
      .findAllIn(plan).length
    assert(keyOnly >= 1 && keyOnly <= 2,
      s"expected 1-2 key-only partitionings (window + maybe span agg), got $keyOnly:\n$plan")
    assert(plan.contains("Window"), s"no window in cusum plan:\n$plan")
  }

  test("ts_theil_sen plan: pair join stays equi on the key, spine materialized once") {
    val plan = SparkEntry.queries("ts_theil_sen")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pairwise slopes fell back to a product:\n$plan")
    // the spine materializes (localCheckpoint → ExistingRDD) and feeds
    // BOTH join sides — the gap-fill chain must not appear (and so not
    // expand twice) in the pair plan
    assert(plan.contains("ExistingRDD") || plan.contains("InMemoryTableScan"),
      s"spine not materialized:\n$plan")
    assert(!plan.contains("explode(sequence"),
      s"gap-fill chain re-expanded into the pair join:\n$plan")
  }

  test("events_top_paths plan: both leads share one user exchange; census partial-aggregates") {
    val plan = SparkEntry.queries("events_top_paths")(spark, sf)
      .queryExecution.executedPlan.toString
    val userEx = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(userEx == 1, s"expected 1 user exchange, got $userEx:\n$plan")
    assert(!plan.contains("Join"), s"path census must not join:\n$plan")
    assert(plan.contains("partial"), s"census must partial-aggregate:\n$plan")
  }

  test("text_zipf plan: bounded top-k aggregate, no window over the vocabulary") {
    val plan = SparkEntry.queries("text_zipf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("top_k_strings"), s"TopKStrings aggregate missing:\n$plan")
    assert(!plan.contains("Window"), s"vocabulary window crept in:\n$plan")
  }

  test("text_source_kl plan: token join only; the corpus total is a hinted 1-row product") {
    val plan = SparkEntry.queries("text_source_kl")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"unhinted product in source-kl plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"1-row total not broadcast:\n$plan")
  }

  test("emb_quantize plan: per-dim scales broadcast back, no window, no merge join") {
    val plan = SparkEntry.queries("emb_quantize")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"scales not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"quant audit must stay broadcast+aggregate:\n$plan")
  }

  test("search_ndcg plan: judgments join stays equi, windows bounded by the eval set") {
    val plan = SparkEntry.queries("search_ndcg")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"eval fell back to a product:\n$plan")
  }

  test("text_c4_clean plan: the whole battery is a pure map — no join, no hash shuffle") {
    val plan = SparkEntry.queries("text_c4_clean")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"line battery must not join:\n$plan")
    val exchanges = plan.split('\n').filter(_.contains("Exchange"))
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"only the presentation sort may shuffle:\n$plan")
  }

  test("dedup_threshold_curve plan: thresholds broadcast against the pair stream, no product") {
    val plan = SparkEntry.queries("dedup_threshold_curve")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"unhinted product in the curve plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"threshold grid not broadcast:\n$plan")
  }

  test("rel_mann_whitney / rel_kruskal plans: corpus collapses before the rank window, no join on the corpus side") {
    for (q <- Seq("rel_mann_whitney", "rel_kruskal")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      // the rank window must see the DISTINCT-VALUE frame, which means a
      // partial-aggregated groupBy(value) sits below it
      assert(plan.contains("partial"), s"$q: value counts must partial-aggregate:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
        s"$q: the corpus must never join:\n$plan")
    }
  }

  test("rel_spearman plan: two value-keyed rank joins, no global row sort") {
    val plan = SparkEntry.queries("rel_spearman")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"product in spearman:\n$plan")
    // no rangepartitioning over the raw rows — the only sorts allowed sit
    // inside the collapsed distinct-value windows and join machinery
    val globalSort = plan.split('\n')
      .exists(l => l.contains("Exchange rangepartitioning") && !l.contains("ENSURE"))
    assert(!globalSort, s"spearman must not globally sort the corpus:\n$plan")
  }

  test("pipeline_gini plan: Lorenz window rides the collapsed source frame behind one partial agg") {
    val plan = SparkEntry.queries("pipeline_gini")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial"), s"per-source rollup must partial-aggregate:\n$plan")
    assert(!plan.contains("Join"), s"gini must stay join-free:\n$plan")
  }

  test("rank-stat family: every window rides the RangeScan bucket discipline (r11 verdict #1)") {
    // The one structural 100×-scale risk r11 named: an unpartitioned
    // Window over a distinct-VALUE frame puts 10⁷–10⁸ rows on ONE reducer
    // when the column is near-continuous. After the RangeScan rewrite the
    // ONLY windows these plans may contain are (a) the per-bucket local
    // scan, partitioned by __rs_b, and (b) the bucket-offset scan, ordered
    // by __rs_b over ≤ shuffle.partitions rows — so every Window node in
    // the executed plan must reference __rs_b. A regression back to the
    // global Window.orderBy(value) shows up as a __rs_b-free Window line.
    for (q <- Seq("rel_ks_test", "rel_mann_whitney", "rel_kruskal",
        "rel_spearman", "rel_skyline", "events_survival", "pipeline_skew_audit",
        // r13: logRank's per-ARM cumulative window moved onto the keyed
        // RangeScan (2 arms over the pooled duration grid is still the
        // single-reducer regime)
        "events_survival_ab")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      val bad = plan.split('\n').filter(l =>
        l.contains("Window [") && !l.contains("__rs_b"))
      assert(bad.isEmpty,
        s"$q: window over a data-sized frame outside the RangeScan discipline:\n${bad.mkString("\n")}")
    }
    // NOTE (r12 verdict #7): the engine's three REMAINING unpartitioned
    // windows are over frames BOUNDED BY CONSTRUCTION, not by data, and
    // deliberately stay off RangeScan — TextAnalysis.vocabGrowth (the
    // caller-fixed nBuckets spine), TextAnalysis.mixPlan (one row per
    // source), TextAnalysis.packChop (≤ 1024 stratum totals; interior
    // prefixes are stratum-partitioned). Each site carries a boundedness
    // comment naming its bound; if any of those bounds ever becomes
    // data-proportional, wire the site through RangeScan and extend the
    // query list above.
  }

  test("emb_silhouette plan: pure map over the centroid literal — no join before the rollup") {
    // a(i)/b(i) come from ONE fold over the frozen k-entry centroid
    // array (the kmeansScore shape): the executed plan must carry no
    // join at all, and the only exchanges are the final k-row rollup +
    // its orderBy
    val plan = SparkEntry.queries("emb_silhouette")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"silhouette must not join:\n$plan")
    assert(!plan.contains("Window ["), s"silhouette must not window:\n$plan")
    // the corpus arrives as the ONE materialized quantized frame
    // (kmeansCentroids' cut → LogicalRDD) — exactly one scan of it
    val scans = plan.linesIterator.count(_.contains("Scan ExistingRDD"))
    assert(scans == 1, s"one quantized-corpus scan expected, got $scans:\n$plan")
  }

  test("graph_louvain / graph_betweenness / graph_closeness plans: no windows, no cartesians") {
    // the r13 graph wave keeps the iterative-graph discipline: every
    // per-round reduction is an AGGREGATE (argmax via max(struct), σ/δ
    // via sums) — a Window or cartesian product in any of these plans is
    // a single-reducer / blowup regression
    for (q <- Seq("graph_louvain", "graph_betweenness", "graph_closeness")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window ["), s"$q: unexpected Window:\n$plan")
      assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
        s"$q: unexpected product join:\n$plan")
    }
  }

  test("r14 pure-map claims: sentence chunks, ROUGE, and the probes never join or shuffle") {
    // each of these is documented "pure map, stream-safe" — the plan must
    // carry no join and no exchange besides the final orderBy's range
    // partitioning (the pipeline_source_mix convention)
    for (q <- Seq("text_chunks_sentence", "text_rouge",
        "multimodal_video_probe", "multimodal_exif_probe")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$q must not join:\n$plan")
      val exchanges = plan.linesIterator.count(_.trim.startsWith("+- Exchange"))
      assert(plan.linesIterator.count(_.contains("rangepartitioning")) >= exchanges - 1,
        s"$q: unexpected non-sort exchange:\n$plan")
    }
  }

  test("r15 plan claims: track walk is a pure map; fertility and power curve aggregate once") {
    // multimodal_video_tracks: byte walk + explode, no join, no exchange
    // besides the final sort (the r14 pure-map convention)
    val tracks = SparkEntry.queries("multimodal_video_tracks")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!tracks.contains("Join"), s"track walk must not join:\n$tracks")
    val tEx = tracks.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(tracks.linesIterator.count(_.contains("rangepartitioning")) >= tEx - 1,
      s"track walk: unexpected non-sort exchange:\n$tracks")
    // text_token_fertility: encode + langid are maps feeding ONE
    // partial-aggregated groupBy — a single documents scan, no join
    val fert = SparkEntry.queries("text_token_fertility")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!fert.contains("Join"), s"fertility must not join:\n$fert")
    val fScans = fert.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    assert(fScans == 1, s"fertility output must scan documents once, got $fScans:\n$fert")
    assert(fert.contains("bpe_encode"), s"encode expression missing:\n$fert")
    // events_power_curve: ONE aggregation pass serves the whole effect
    // grid — the explode rides the aggregated (tiny) frame, so exactly
    // one events scan and no join
    val pc = SparkEntry.queries("events_power_curve")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!pc.contains("Join"), s"power curve must not join:\n$pc")
    val pScans = pc.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(pScans == 1, s"power curve must scan events once, got $pScans:\n$pc")
    // pipeline_crawl_chain: the whole first mile is maps + filters —
    // no join, no exchange besides the final sort
    val cc = SparkEntry.queries("pipeline_crawl_chain")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!cc.contains("Join"), s"crawl chain must not join:\n$cc")
    val cEx = cc.linesIterator.count(_.trim.startsWith("+- Exchange"))
    assert(cc.linesIterator.count(_.contains("rangepartitioning")) >= cEx - 1,
      s"crawl chain: unexpected non-sort exchange:\n$cc")
  }

  test("text_unigram_tokens plan: encode stage reads the corpus once, no shuffle") {
    // the unigram twin of the bpe_encode assertion: two training scans
    // (word count + substring count) are driver-side collects; the
    // OUTPUT plan itself is one scan + the plan-constant encode
    val plan = SparkEntry.queries("text_unigram_tokens")(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    assert(scans == 1, s"encode output must be one documents scan, got $scans:\n$plan")
    assert(plan.contains("unigram_encode"), s"encode expression missing:\n$plan")
  }

  test("sketch_hll_setops plan: pair frame broadcasts, registers never sort-merge") {
    val plan = SparkEntry.queries("sketch_hll_setops")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"the pair frame must broadcast against the registers:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"register joins must stay hash-shaped (sketch-sized frames):\n$plan")
  }

  test("events_markov_attribution plan: the one window is user-partitioned") {
    // the journey build is the only window in the distributed surface —
    // it must partition by the user key, never a global order
    val plan = SparkEntry.queries("events_markov_attribution")(spark, sf)
      .queryExecution.executedPlan.toString
    val bad = plan.split('\n').filter(l =>
      l.contains("Window [") && !l.contains("partitionBy") &&
        !l.contains("__u"))
    assert(bad.isEmpty,
      s"markov journey window must be user-partitioned:\n${bad.mkString("\n")}")
  }

  test("r16 wire chains plan: pure maps end to end — only the final sort exchanges") {
    // chain_pdf (WARC→HTTP→router→prose), http_decode (dechunk→gunzip),
    // http_charset (→ charset ladder), sitemap_urls (explode) are all
    // per-row byte walks: the corpus must never shuffle except the
    // final presentation orderBy
    Seq("pipeline_crawl_chain_pdf", "pipeline_http_decode",
        "pipeline_http_charset", "pipeline_sitemap_urls").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"$q must not shuffle-join the corpus:\n$plan")
      val exchanges = plan.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Broadcast") &&
          !l.contains("Reused"))
      val sorts = plan.linesIterator.count(_.contains("rangepartitioning"))
      assert(exchanges <= sorts,
        s"$q: non-sort corpus exchange in a pure-map chain:\n$plan")
    }
  }

  test("pipeline_fetch_schedule plan: robots broadcast, window per domain") {
    val plan = SparkEntry.queries("pipeline_fetch_schedule")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"the one-row robots side must broadcast:\n$plan")
    val bad = plan.split('\n').filter(l =>
      l.contains("Window [") && !l.contains("doc_id"))
    assert(bad.isEmpty,
      s"the schedule window must partition per domain:\n${bad.mkString("\n")}")
  }
}
