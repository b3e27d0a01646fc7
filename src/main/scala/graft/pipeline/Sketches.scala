package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency SKETCHES with bit-replayable integer
  * arithmetic — the bounded-state answers to "how many distinct X" and
  * "how often does X occur" at corpus scale, where the exact plans
  * (COUNT(DISTINCT), per-key GROUP BY) carry one-entry-per-distinct-key
  * aggregation state: fine at test SF, a multi-TB hash table over
  * token/URL/user streams at 100 TB.
  *
  * Both sketches here are expressed as PLAIN two-level aggregates over
  * `functions._` arithmetic — no custom Expression, no UDF — because
  * their register state IS a tiny group-by: Spark's partial aggregation
  * collapses each task's contribution to ≤ m (HLL) or ≤ d·w (CMS)
  * fixed-width rows map-side, so only sketch-sized state crosses the shuffle.
  * That is exactly the hand-written mergeable-summary contract, obtained
  * from the declarative plan for free — and unlike the usual
  * float-harmonic-mean HLL implementations, every step below is INTEGER
  * (hash → bucket/rank via string ops on the md5 hex, 2^x via shiftleft,
  * the estimator via DECIMAL(38,0) integral division), so the same rows
  * come out of any engine that replays the recipe: the sketch is
  * oracle-gateable bit-for-bit, not merely "close".
  */
object Sketches {

  /** 60-bit deterministic hash of a value (the repo's md5-prefix
    * convention: first 15 hex digits — stays inside a signed BIGINT in
    * every engine). Salted variants namespace independent hash rows. */
  private def h60(v: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), v.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** HyperLogLog distinct-count per group (Flajolet, Fusy, Gandouet &
    * Meunier, AofA 2007) with 2^p registers, all-integer.
    *
    * Register recipe over the 60-bit hash h: bucket = top p bits, rem =
    * low W = 60−p bits; rank = number of leading zeros of rem within the
    * W-bit field + 1 = (W+1) − len(bin(rem)) (rem = 0 → W+1, the max).
    * Registers are `max(rank)` per (group, bucket) — the first aggregate
    * level; the second folds the m registers of a group into the raw
    * estimator E = α_m · m² / Σ 2^−M[j]. Scaled by 2^(W+1) the sum is an
    * exact LONG (empty buckets contribute 2^(W+1), present ones
    * 1 << (W+1 − M[j])), and E becomes one DECIMAL(38,0) integral
    * division by a compile-time BigInt constant — floor semantics shared
    * exactly with the oracle's HUGEINT replay. α_m is pinned in ppm
    * (0.7213/(1 + 1.079/m), the standard bias constant) so both engines
    * use the identical rational.
    *
    * Contract: `n_distinct_est` is the RAW HLL estimator — its ±1.04/√m
    * relative-error regime is n ≳ 3m; below that HLL standardly switches
    * to linear counting (needs a float ln, deliberately NOT replayed —
    * `v_empty` is emitted so callers can apply it). `reg_sum` witnesses
    * the full register state. The whole pipeline is two shuffles of
    * sketch-sized state regardless of input size, and the register frame
    * is mergeable across corpora/days by construction (max per bucket).
    */
  /** The HLL estimator's numerator α_m·m²·2^(W+1) as one exact integer
    * (α_m pinned in ppm) — public so the DuckDB oracle interpolates the
    * IDENTICAL constant instead of re-deriving the float bias term. */
  def hllNumConstant(p: Int): BigInt = {
    val m = 1 << p
    val maxRank = 60 - p + 1
    val alphaPpm = BigDecimal(721300000L) // 0.7213 in 1e-9 units
      ./(BigDecimal(1000000000L) + BigDecimal(1079000000L) / m)
      .*(BigDecimal(1000000))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
    alphaPpm * BigInt(m) * BigInt(m) * (BigInt(1) << maxRank)
  }

  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int = 8): DataFrame =
    distinctFromState(hllState(df, groupCols, valueCol, p), groupCols, p)

  /** HLL REGISTER state (r15) — the [[Maintenance.momentState]]
    * maintenance shape for DISTINCT counts: per (key, bucket) the max
    * rank, a COMMUTATIVE monoid under [[mergeHllStates]] (per-bucket
    * max = HLL union), so a stored register table plus per-batch
    * register deltas maintains a live distinct-actives estimate
    * continuously — the foreachBatch ledger the batch set-ops
    * ([[hllSetOps]]) had no streaming twin for. State cost is
    * keys-cardinality × ≤ 2^p rows regardless of history, and unlike
    * the ADDITIVE rollup/moment states the max-merge is IDEMPOTENT:
    * re-delivered batches cannot inflate the estimate, so
    * at-least-once streaming delivery is safe where a sum-maintained
    * state would double-count. Output: keys..., `bucket`, `reg`. */
  def hllState(df: DataFrame, keyCols: Seq[String], valueCol: String,
               p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val w = 60 - p // rem field width
    val maxRank = w + 1
    val gs = keyCols.map(col)
    // bucket/rem via integral DIV/%, NOT Column./ (true double division —
    // fractional "buckets" would silently multiply the register space)
    val hashed = df.where(col(valueCol).isNotNull)
      .select((gs :+ h60(col(valueCol), "hll").as("__h")): _*)
    val rem = col("__h") % (1L << w)
    hashed.select(
        (gs :+ expr(s"__h DIV ${1L << w}").as("bucket") :+
          when(rem === 0L, maxRank)
            .otherwise(lit(maxRank) - length(bin(rem))).as("__rank")): _*)
      .groupBy((gs :+ col("bucket")): _*)
      .agg(max(col("__rank")).as("reg"))
  }

  /** Fold register states from (possibly re-delivered) batches: union +
    * per-(key, bucket) max — the HLL union, idempotent and commutative,
    * so merge order and duplicate delivery cannot change the result. */
  def mergeHllStates(keyCols: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeHllStates needs at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(max(col("reg")).as("reg"))
  }

  /** The [[hllDistinct]] estimator read off a maintained register state:
    * `v_empty, reg_sum` (the replayable register digest) and the
    * all-integer `n_distinct_est`. The state is VALIDATED against `p`
    * in-column (bucket < 2^p, 1 ≤ reg ≤ 60-p+1, bucket count ≤ 2^p per
    * key): a state built at a different precision silently skews
    * v_empty/maxRank otherwise — loudly wrong beats silently skewed. */
  def distinctFromState(state: DataFrame, keyCols: Seq[String],
                        p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    val m = 1 << p
    val maxRank = 60 - p + 1
    val gs = keyCols.map(col)
    val num = hllNumConstant(p)
    val checked = state.withColumn("reg",
      when(col("bucket") >= 0 && col("bucket") < m &&
          col("reg") >= 1 && col("reg") <= maxRank, col("reg"))
        .otherwise(raise_error(concat(
          lit(s"distinctFromState: register state inconsistent with p=$p " +
            s"(need bucket in [0, ${m - 1}], reg in [1, $maxRank]), got bucket="),
          coalesce(col("bucket").cast("string"), lit("NULL")), lit(" reg="),
          coalesce(col("reg").cast("string"), lit("NULL"))))))
    checked.groupBy(gs: _*)
      .agg(
        count(lit(1)).as("__nb"),
        sum(expr(s"shiftleft(1L, $maxRank - reg)")).as("__s_present"),
        sum(col("reg")).as("reg_sum"))
      .withColumn("v_empty",
        when(col("__nb") <= m.toLong, lit(m.toLong) - col("__nb"))
          .otherwise(raise_error(concat(
            lit(s"distinctFromState: more than $m register rows in one " +
              "group — state not max-merged or built at a larger p; got "),
            col("__nb").cast("string")))))
      .withColumn("__s",
        col("__s_present") + col("v_empty") * (1L << maxRank))
      .withColumn("n_distinct_est",
        expr(s"CAST(CAST('$num' AS DECIMAL(38,0)) DIV " +
          "(CAST(__s AS DECIMAL(38,0)) * 1000000) AS BIGINT)"))
      .select((gs :+ col("v_empty") :+ col("reg_sum") :+ col("n_distinct_est")): _*)
  }

  /** ROLLING-window distinct estimate by HLL register merge — the scale
    * path for trailing-K-day active counts (WAU/MAU) when the exact
    * contribution-explode of `TimeSeries.rollingDistinct` is too big:
    * HLL union = per-bucket `max`, so a trailing window of daily
    * REGISTER tables replaces any window over raw identities.
    *
    * Shape: per-(day, bucket) registers (one partial-aggregated shuffle
    * — the only pass over the corpus), densified to the days × m grid
    * (m = 2^p fixed; days = calendar — BOUNDED state, independent of
    * corpus size), trailing `windowDays` max per bucket as a RANGE
    * window on epoch-day (gap days inside the window count correctly;
    * output rows = observed days, gap-fill is [[TimeSeries]]' job), then
    * the same all-integer estimator as [[hllDistinct]]. Every step
    * replays bit-for-bit. Output: `day, v_empty, reg_sum` (rolling
    * registers, empties as 0), `n_distinct_est` (raw estimator — the
    * [[hllDistinct]] linear-counting caveat applies below n ≈ 3m). */
  def hllRolling(df: DataFrame, dayCol: String, valueCol: String,
                 p: Int = 8, windowDays: Int = 7): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    import org.apache.spark.sql.expressions.Window
    val m = 1 << p
    val w = 60 - p
    val maxRank = w + 1
    val day = col(dayCol).cast("date")
    val hashed = df.where(col(valueCol).isNotNull && day.isNotNull)
      .select(day.as("day"), h60(col(valueCol), "hll").as("__h"))
    val rem = col("__h") % (1L << w)
    // regs is read TWICE (the day spine + the grid join) — cut it once
    // so the corpus scan behind it runs once, not per consumer (the
    // kCore diamond discipline; the frame is days × m, KB-scale)
    val regs = Materialize.cutLazy(hashed
      .select(col("day"), expr(s"__h DIV ${1L << w}").as("__bucket"),
        when(rem === 0L, maxRank)
          .otherwise(lit(maxRank) - length(bin(rem))).as("__rank"))
      .groupBy("day", "__bucket").agg(max(col("__rank")).as("__reg")))
    val grid = regs.select("day").distinct()
      .select(col("day"),
        explode(sequence(lit(0L), lit((m - 1).toLong))).as("__bucket"))
    val win = Window.partitionBy("__bucket")
      .orderBy("__dn").rangeBetween(-(windowDays - 1).toLong, 0L)
    val num = hllNumConstant(p)
    grid.join(regs, Seq("day", "__bucket"), "left")
      .withColumn("__dn", datediff(col("day"), lit("1970-01-01")).cast("long"))
      .withColumn("__rreg", max(col("__reg")).over(win))
      .groupBy("day")
      .agg(
        sum(when(col("__rreg").isNull, 1L).otherwise(0L)).as("v_empty"),
        sum(coalesce(col("__rreg"), lit(0L))).as("reg_sum"),
        sum(when(col("__rreg").isNull, lit(1L << maxRank))
          .otherwise(expr(s"shiftleft(1L, $maxRank - __rreg)"))).as("__s"))
      .withColumn("n_distinct_est",
        expr(s"CAST(CAST('$num' AS DECIMAL(38,0)) DIV " +
          "(CAST(__s AS DECIMAL(38,0)) * 1000000) AS BIGINT)"))
      .select(col("day"), col("v_empty"), col("reg_sum"),
        col("n_distinct_est"))
  }

  /** Count-Min frequency sketch (Cormode & Muthukrishnan, J. Algorithms
    * 2005): d independent hash rows × w counters; an item's estimate is
    * the MIN of its d counters — always ≥ the true count, over by at most
    * εN with probability 1−δ (w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉).
    *
    * The counter table is exact integer sums over (row, bucket) — fully
    * deterministic, so unlike most sketches BOTH the state and the
    * estimates replay bit-for-bit in any engine. d·w fixed-width rows
    * per task cross the shuffle (partial aggregation), never per-key
    * state; the d-fold input explode multiplies only the map side.
    *
    * Returns (probe, n_est, n_exact) for each distinct probe value:
    * n_est ≥ n_exact always (CMS never undercounts), equality whenever
    * no other value collided into any of the probe's d slots. `n_exact`
    * rides along for calibration (the probe set is small — its exact
    * counts are one more aggregate over the same scan); production
    * callers wanting sketch-only cost drop that column. */
  def cmsEstimate(df: DataFrame, valueCol: String, probes: DataFrame,
                  probeCol: String, d: Int = 4, w: Int = 1024): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, s"need 1 <= d <= 16, w >= 2; got d=$d w=$w")
    val vals = df.where(col(valueCol).isNotNull).select(col(valueCol).as("__v"))
    // NULL probes mirror the value-stream NULL policy (dropped): a NULL
    // probe row would otherwise surface as (NULL, 0, 0) — a data-quality
    // problem silently reported as a zero count
    val probeKeys = probes.where(col(probeCol).isNotNull)
      .select(col(probeCol).as("probe")).distinct()
    def slot(v: Column): Column = // row r probes bucket h("r#v") — the
      h60(concat(col("__r").cast("string"), lit("#"), v.cast("string")), "cms") % w
    // counter table: d rows per input value, counters = exact sums;
    // partial aggregation caps per-task shuffle output at d·w rows
    val counters = vals
      .select(col("__v"), explode(sequence(lit(0), lit(d - 1))).as("__r"))
      .select(col("__r"), slot(col("__v")).as("__b"))
      .groupBy("__r", "__b").agg(count(lit(1)).as("__n"))
    val probed = probeKeys
      .select(col("probe"), explode(sequence(lit(0), lit(d - 1))).as("__r"))
      .select(col("probe"), col("__r"), slot(col("probe")).as("__b"))
    val est = probed.join(counters, Seq("__r", "__b"), "left")
      .groupBy("probe")
      .agg(min(coalesce(col("__n"), lit(0L))).as("n_est"))
    // exact counts ONLY for the probe cohort: a bare groupBy over the
    // value stream would build one aggregation-state entry per DISTINCT
    // value — the unbounded hash table this file's contract exists to
    // avoid; the broadcast semi-join keeps the exact pass probe-sized
    val exact = vals
      .join(broadcast(probeKeys), col("__v") === col("probe"), "left_semi")
      .groupBy(col("__v").as("probe"))
      .agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("probe"), "left")
      .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
  }

  /** KMV / bottom-k distinct-value synopsis per group (Bar-Yossef et
    * al. RANDOM'02; Beyer, Haas, Reinwald, Sismanis & Gemulla,
    * SIGMOD'07): the k smallest distinct `h60` hashes, ascending —
    * where [[hllDistinct]] answers only "how many distinct", the KMV
    * sketch is a uniform SAMPLE of the distinct-value space, so
    * sketches COMPOSE across groups (the k smallest of a union are
    * among the two sketches' values) and set overlap becomes a pure
    * k-sized array computation ([[kmvOverlap]]). The aggregation state
    * is a ≤ k TreeSet inside [[graft.functions.KmvSketch]]
    * (ObjectHashAggregate ⇒ map-side partial: ≤ k longs per task cross
    * the shuffle), mergeable and therefore streaming-native. Every
    * value is integer and hash-derived — the sketch replays
    * bit-for-bit in any engine with md5. */
  def kmvSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 128): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    import org.apache.spark.sql.graftshim.{GraftShim => E}
    val agg = E.column(graft.functions.KmvSketch(
      E.expression(h60(col(valueCol), "kmv")), k).toAggregateExpression())
    df.groupBy(groupCols.map(col): _*).agg(agg.as("kmv"))
  }

  /** Per-group distinct-count estimate off the KMV sketch: exact when
    * the group has fewer than k distinct values (the sketch IS the
    * distinct set), else the unbiased bottom-k estimator
    * `(k−1)·2⁶⁰ DIV h_(k)` (Beyer et al. SIGMOD'07 §2.1 — the k-th
    * smallest of n uniform draws on [0, 2⁶⁰) sits near k·2⁶⁰/n).
    * DECIMAL(38,0) numerator: (k−1)·2⁶⁰ overflows a BIGINT at k ≥ 9.
    * Output: groupCols…, `n_kmv`, `kth_min` (NULL in the exact
    * regime), `n_distinct_est`. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int = 128): DataFrame = {
    // k = 1 degenerates the Beyer estimator to (k−1)·2⁶⁰ = 0 — a
    // deterministic wrong answer, not an estimate (the raw KmvSketch
    // keeps k ≥ 1 for pure bottom-k use; the ESTIMATORS need k ≥ 2)
    require(k >= 2, s"kmvDistinct needs k >= 2 (estimator is (k-1)-based), got $k")
    kmvSketches(df, groupCols, valueCol, k)
      .withColumn("n_kmv", size(col("kmv")).cast("long"))
      .withColumn("kth_min",
        when(col("n_kmv") === k, element_at(col("kmv"), k)))
      .withColumn("n_distinct_est", expr(
        s"""CASE WHEN n_kmv < $k THEN n_kmv
                 ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976)
                           DIV CAST(kth_min AS DECIMAL(38,0)) AS BIGINT) END"""))
      .select((groupCols.map(col) :+ col("n_kmv") :+ col("kth_min") :+
        col("n_distinct_est")): _*)
  }

  /** Pairwise set-overlap estimation between groups from their KMV
    * sketches alone — the corpus/audience-overlap question ("how much
    * does source A's content overlap source B's?") WITHOUT ever joining
    * the underlying data: the k smallest of A∪B are computable from the
    * two sketches (union, dedup, retake bottom-k), they are a uniform
    * sample of A∪B, and the fraction of them present in BOTH sketches
    * estimates Jaccard (Beyer et al. SIGMOD'07 §5). Everything after
    * the per-group aggregate is arithmetic over ≤ k-sized arrays on a
    * groups²-row frame — group counts are bounded (sources, event
    * types), the corpora never shuffle. The pair join is an explicitly
    * broadcast-hinted inequality product of two sketch frames.
    *
    * Output per (group_a < group_b): `n_kmv_a, n_kmv_b, inter_k` (both-
    * members among the union's bottom-k), `jaccard_ppm = 10⁶·inter_k
    * DIV ku`, `union_est` (bottom-k estimator on the union sketch —
    * exact when ku < k). All integer, hash-gateable. */
  def kmvOverlap(df: DataFrame, groupCol: String, valueCol: String,
                 k: Int = 128): DataFrame = {
    // same (k−1)-based estimator as kmvDistinct: k = 1 is deterministic 0
    require(k >= 2, s"kmvOverlap needs k >= 2 (estimator is (k-1)-based), got $k")
    val sk = kmvSketches(df, Seq(groupCol), valueCol, k)
    val a = sk.select(col(groupCol).as("group_a"), col("kmv").as("__ka"))
    val b = sk.select(col(groupCol).as("group_b"), col("kmv").as("__kb"))
    a.join(broadcast(b), col("group_a") < col("group_b"))
      .withColumn("__u",
        expr(s"slice(array_sort(array_distinct(concat(__ka, __kb))), 1, $k)"))
      .withColumn("ku", size(col("__u")).cast("long"))
      .withColumn("inter_k", expr(
        "CAST(size(filter(__u, h -> array_contains(__ka, h) AND array_contains(__kb, h))) AS BIGINT)"))
      .select(col("group_a"), col("group_b"),
        size(col("__ka")).cast("long").as("n_kmv_a"),
        size(col("__kb")).cast("long").as("n_kmv_b"),
        col("inter_k"),
        expr("CAST((inter_k * 1000000) DIV ku AS BIGINT)").as("jaccard_ppm"),
        expr(s"""CASE WHEN ku < $k THEN ku
                      ELSE CAST((CAST(${k - 1} AS DECIMAL(38,0)) * 1152921504606846976)
                                DIV CAST(element_at(__u, $k) AS DECIMAL(38,0)) AS BIGINT) END""")
          .as("union_est"))
  }

  /** HLL SET OPERATIONS over per-group register tables (r14) — the
    * mergeability payoff [[hllDistinct]] documents, cashed in: HLL union
    * is per-bucket register `max`, so every UNORDERED GROUP PAIR gets a
    * union estimate from one register merge, and the intersection falls
    * out by inclusion–exclusion (|A∩B| ≈ Ê_A + Ê_B − Ê_A∪B, clamped at
    * 0 — the standard HLL intersection estimator, whose error grows as
    * the true overlap shrinks relative to ±1.04/√m·|A∪B|; documented,
    * not hidden). The cross-corpus planning readout ("how much would
    * these two sources dedup against each other") at sketch cost —
    * beside [[kmvOverlap]]'s bottom-k answer to the same question with
    * a different error trade.
    *
    * Same all-integer estimator as [[hllDistinct]] (shared
    * [[hllNumConstant]] — both engines divide by the identical BigInt),
    * so singles, unions, and the inclusion–exclusion difference all
    * hash-gate. Pairs enumerate from the DISTINCT group set under a
    * LOUD cardinality cap (pairs are quadratic in groups — this is a
    * per-source/per-type readout, never a per-key one); the pair frame
    * broadcasts against the register table, registers shuffle once.
    * Output per pair (a < b): `group_a, group_b, est_a, est_b,
    * est_union, est_intersect, overlap_ppm` (∩/∪ in ppm). */
  def hllSetOps(df: DataFrame, groupCol: String, valueCol: String,
                p: Int = 8, maxGroups: Int = 64): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16], got $p")
    require(maxGroups >= 2 && maxGroups <= 1024,
      s"maxGroups must be in [2, 1024], got $maxGroups")
    val m = 1 << p
    val w = 60 - p
    val maxRank = w + 1
    val hashed = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), h60(col(valueCol), "hll").as("__h"))
    val rem = col("__h") % (1L << w)
    val regs = Materialize.cutLazy(
      hashed.select(col("__g"),
          expr(s"__h DIV ${1L << w}").as("__bucket"),
          when(rem === 0L, maxRank)
            .otherwise(lit(maxRank) - length(bin(rem))).as("__reg"))
        .groupBy("__g", "__bucket").agg(max(col("__reg")).as("__reg")))
    val num = hllNumConstant(p)
    def estimate(regFrame: DataFrame, keys: Seq[String], out: String): DataFrame =
      regFrame.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__nb"),
          sum(expr(s"shiftleft(1L, $maxRank - __reg)")).as("__sp"))
        .withColumn("__s",
          col("__sp") + (lit(m.toLong) - col("__nb")) * (1L << maxRank))
        .withColumn(out, expr(
          s"CAST(CAST('$num' AS DECIMAL(38,0)) DIV " +
            s"(CAST(__s AS DECIMAL(38,0)) * 1000000) AS BIGINT)"))
        .select((keys.map(col) :+ col(out)): _*)
    val groups = regs.select(col("__g")).distinct()
    val nGroups = groups.count()
    require(nGroups <= maxGroups,
      s"hllSetOps: $nGroups groups exceed maxGroups=$maxGroups — this is " +
        "a per-source readout (pairs are quadratic); raise the cap only " +
        "for genuinely bounded group sets")
    val pairs = groups.as("x").join(groups.as("y"),
        col("x.__g") < col("y.__g"))
      .select(col("x.__g").as("group_a"), col("y.__g").as("group_b"))
    val contrib = regs.join(broadcast(pairs),
      regs("__g") === col("group_a") || regs("__g") === col("group_b"))
    val unionEst = estimate(
      contrib.groupBy("group_a", "group_b", "__bucket")
        .agg(max(col("__reg")).as("__reg")),
      Seq("group_a", "group_b"), "est_union")
    val singles = estimate(regs, Seq("__g"), "__est")
    unionEst
      .join(singles.withColumnRenamed("__g", "group_a")
        .withColumnRenamed("__est", "est_a"), Seq("group_a"))
      .join(singles.withColumnRenamed("__g", "group_b")
        .withColumnRenamed("__est", "est_b"), Seq("group_b"))
      .withColumn("est_intersect",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .withColumn("overlap_ppm",
        expr("(est_intersect * 1000000) DIV est_union"))
      .select("group_a", "group_b", "est_a", "est_b", "est_union",
        "est_intersect", "overlap_ppm")
  }
}
