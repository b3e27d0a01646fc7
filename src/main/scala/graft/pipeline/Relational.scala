package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as built-ins, composed from shuffle-
  * efficient primitives (no custom physical operator needed — the
  * declarative plans below already have the shape you'd hand-build).
  */
object Relational {

  /** 64-bit-exact bin id: `t DIV bin` (truncating integer division — the
    * direction is irrelevant as long as every bin computation in a join
    * uses THIS one function; truncation is monotone, so interval bin
    * ranges stay ascending and residual predicates trim the rest). */
  private def binOf(t: org.apache.spark.sql.Column, bin: Long): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftshim.GraftShim.expression(t.cast("long")),
        org.apache.spark.sql.catalyst.expressions.Literal(bin))).cast("long")

  private def requireIntegralTime(df: DataFrame, c: String, op: String,
                                  what: String = "time"): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(c).dataType
    val ok = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: org.apache.spark.sql.types.DecimalType => d.scale == 0
      case _ => false
    }
    require(ok, s"$op $what column '$c' must be integral, got $dt — " +
      "double binning loses integer resolution past 2^53")
  }

  /** Point-in-interval range join WITHOUT an inequality join: every
    * (point, interval) pair with `start <= point < end`.
    *
    * Spark plans a bare `ON p >= s AND p < e` as BroadcastNestedLoopJoin —
    * O(|points| × |intervals|) and a guaranteed non-starter at scale. This
    * operator makes the join an EQUI join on a time bin: intervals are
    * exploded to the bins they overlap (ceil(len/bin)+1 rows each), points
    * map to exactly one bin, the join runs hash-partitioned on the bin,
    * and the residual `start <= p < e` predicate filters within the bin —
    * the standard OLAP binned-range-join recipe (DuckDB/Trino implement
    * the same idea natively as an IEJoin/bin variant).
    *
    * An interval spanning k bins appears k times pre-join but each point
    * matches in exactly ONE bin (its own), so no post-join dedup is needed.
    * `bin` should be chosen near the typical interval length: much smaller
    * explodes intervals into many bins; much larger packs unrelated rows
    * into one bin (both still correct — the residual filter trims).
    * Skewed bins (a hot hour) are ordinary join skew — AQE's skew-join
    * split applies, which a nested-loop join would not get.
    *
    * `points`/`intervals` carry arbitrary columns; output = every point
    * column + every interval column (names must not collide), one row per
    * qualifying pair. Time columns must be INTEGRAL (cast timestamps to
    * epoch seconds/days upstream so `bin` has explicit units): binning is
    * 64-bit integer division end-to-end — a double `floor(x/bin)` loses
    * integer resolution past 2^53 (epoch NANOS are ~1.7e18), where two
    * independently-rounded bin computations can disagree by one bin and
    * silently drop pairs. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, startCol: String, endCol: String,
                bin: Long): DataFrame = {
    require(bin > 0, s"bin must be positive, got $bin")
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "rangeJoin reserves the __bin column name")
    Seq(points -> Seq(pointCol), intervals -> Seq(startCol, endCol)).foreach {
      case (df, cols) => cols.foreach(c => requireIntegralTime(df, c, "rangeJoin"))
    }
    val iBinned = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull && col(startCol) < col(endCol))
      .withColumn("__bin", explode(sequence(
        binOf(col(startCol), bin), binOf(col(endCol) - 1, bin))))
    val pBinned = points
      .where(col(pointCol).isNotNull)
      .withColumn("__bin", binOf(col(pointCol), bin))
    pBinned.join(iBinned, Seq("__bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join WITHOUT an inequality join: every
    * (left, right) pair of half-open intervals with
    * `lStart < rEnd AND rStart < lEnd` — the second classic range-join
    * shape ([[rangeJoin]] is point-in-interval).
    *
    * Same binned equi-join recipe: both sides explode to the bins they
    * cover and join hash-partitioned on the bin with the overlap
    * predicate as a residual. A pair overlapping across k shared bins
    * would emit k duplicates, so each pair is ANCHORED to one bin — the
    * bin of `greatest(lStart, rStart)`, the first instant of the
    * intersection, which both sides provably cover — via a pure-filter
    * dedup: no `distinct()`, no second shuffle. Degenerate (`start >=
    * end`) and NULL intervals drop before the explode.
    *
    * Output: all left + all right columns (names must not collide), one
    * row per overlapping pair. Time columns must be INTEGRAL — cast
    * timestamps to epoch seconds/days upstream so `bin` has units; the
    * anchor-bin dedup depends on every bin computation agreeing exactly,
    * so binning is 64-bit integer division (a double `floor(x/bin)` past
    * 2^53 — epoch nanos — could round the anchor outside a side's
    * exploded range and silently DROP the pair). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bin: Long): DataFrame = {
    require(bin > 0, s"bin must be positive, got $bin")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "intervalOverlapJoin reserves the __bin column name")
    Seq(left -> Seq(lStart, lEnd), right -> Seq(rStart, rEnd)).foreach {
      case (df, cols) => cols.foreach(c => requireIntegralTime(df, c, "intervalOverlapJoin"))
    }
    def binned(df: DataFrame, s: String, e: String) = df
      .where(col(s).isNotNull && col(e).isNotNull && col(s) < col(e))
      .withColumn("__bin", explode(sequence(
        binOf(col(s), bin), binOf(col(e) - 1, bin))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq("__bin"))
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd) &&
        col("__bin") === binOf(greatest(col(lStart), col(rStart)), bin))
      .drop("__bin")
  }

  /** Backward as-of join: for every left row, the single most recent right
    * row with `right.timeCol <= left.timeCol` in the same `keyCols` group
    * (the time-series "latest snapshot at event time" join; pandas
    * merge_asof / DuckDB ASOF JOIN semantics, LEFT-outer flavor).
    *
    * Plan shape — ONE shuffle, no range/theta join anywhere: both sides are
    * unioned with a side tag, partitioned by `keyCols` and sorted by
    * (time, side, right-row tiebreak); a running `last(right-row struct,
    * ignoreNulls)` then assigns each left row the nearest preceding right
    * row, and left rows are filtered back out. The naive formulations this
    * avoids are the inequality join (quadratic per key) and a per-left-row
    * correlated subquery (one scan per row). At 100 TB the cost is exactly
    * one co-partitioned sort — the minimum any as-of computation needs —
    * and skewed keys are handled by AQE like any other exchange.
    *
    * The right row's columns ride in a packed struct so a right row whose
    * VALUE columns are null is still a match (the struct itself is
    * non-null); ties at identical timestamps are deterministic (right row
    * sorts before left → inclusive `<=`; among equal-time right rows the
    * highest `rightIdCol` wins).
    *
    * `direction`: "backward" (default — latest right at-or-before, the
    * snapshot join) or "forward" (earliest right at-or-after, e.g. "next
    * maintenance event after each failure"). Both are the same single-sort
    * plan, traversed in opposite time order.
    *
    * Output: all left columns + `rightCols` each renamed with `suffix`,
    * null where no right row precedes (follows, for forward) the left row.
    *
    * NULL time semantics match pandas merge_asof / DuckDB ASOF: a right row
    * with NULL `rightTimeCol` can never be a match (filtered before the
    * union — under Spark's nulls-first ascending sort it would otherwise
    * become the running-last match for left rows with no true predecessor),
    * and a left row with NULL `leftTimeCol` matches nothing (ordered before
    * every right row in both directions). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               rightIdCol: String, rightCols: Seq[String],
               suffix: String = "_asof",
               direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    // tolerance (the pandas merge_asof knob): a match older (backward) /
    // later (forward) than `tolerance` away is NO match — "the latest
    // sensor reading, but only if fresher than 10 minutes". Pass an
    // INTERVAL Column for timestamp time columns, a numeric for numeric
    // ones; the check is `matchT >= leftT − tol` (backward) on the
    // matched row's own time, carried in the packed struct. Stale
    // matches null out exactly like no-predecessor rows.
    require(!rightCols.contains("__mt"),
      "asofJoin: right column name '__mt' is reserved")
    val leftCols = left.columns.toSeq
    val rPacked = right
      .where(col(rightTimeCol).isNotNull)
      .withColumn("__t", col(rightTimeCol))
      .withColumn("__side", lit(0))
      .withColumn("__rtb", col(rightIdCol).cast("long"))
      .withColumn("__r", struct((rightCols.map(col) :+
        col(rightTimeCol).as("__mt")): _*))
      .select((keyCols ++ Seq("__t", "__side", "__rtb", "__r")).map(col): _*)
    val lTagged = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
      .withColumn("__rtb", lit(null).cast("long"))
      .withColumn("__r", lit(null).cast(rPacked.schema("__r").dataType))
    val unioned = lTagged.unionByName(rPacked, allowMissingColumns = true)
    // at equal time the right row always sorts first (inclusive match);
    // equal-time right rows resolve deterministically (backward: highest
    // rightId wins; forward: lowest)
    // null-time LEFT rows must sort before every right row in either
    // direction (asc default is nulls-first; desc needs the explicit form)
    // so their running last() sees no right struct and yields no match
    val ordBack = Seq(col("__t").asc_nulls_first, col("__side").asc, col("__rtb").asc)
    val ordFwd = Seq(col("__t").desc_nulls_first, col("__side").asc, col("__rtb").desc)
    def running(ord: Seq[Column]) = last(col("__r"), ignoreNulls = true).over(
      Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    def freshB(m: Column) = tolerance.map(tol =>
      m.getField("__mt") >= col(leftTimeCol) - tol).getOrElse(lit(true))
    def freshF(m: Column) = tolerance.map(tol =>
      m.getField("__mt") <= col(leftTimeCol) + tol).getOrElse(lit(true))
    val joined = direction match {
      case "backward" =>
        unioned.withColumn("__match", running(ordBack))
          .where(col("__side") === 1)
          .withColumn("__match",
            when(freshB(col("__match")), col("__match"))) // stale → NULL struct
      case "forward" =>
        unioned.withColumn("__match", running(ordFwd))
          .where(col("__side") === 1)
          .withColumn("__match", when(freshF(col("__match")), col("__match")))
      case "nearest" =>
        // pandas merge_asof nearest: both runnings over ONE exchange (two
        // sorts of the same partitioning), choose the smaller gap; an
        // exact-gap tie and an equal-time match both go to the BACKWARD
        // side. Gap comparison is generic: timestamp − timestamp is a
        // comparable day-time interval, numerics compare as numerics.
        val b0 = unioned.withColumn("__mb", running(ordBack))
          .withColumn("__mf", running(ordFwd))
          .where(col("__side") === 1)
        val b = when(col("__mb").isNotNull && freshB(col("__mb")), col("__mb"))
        val f = when(col("__mf").isNotNull && freshF(col("__mf")), col("__mf"))
        val gapB = col(leftTimeCol) - col("__mb").getField("__mt")
        val gapF = col("__mf").getField("__mt") - col(leftTimeCol)
        b0.withColumn("__match",
          when(b.isNull, f).when(f.isNull, b)
            .when(gapF < gapB, f).otherwise(b))
      case other => throw new IllegalArgumentException(
        s"asofJoin direction must be backward | forward | nearest, got '$other'")
    }
    rightCols.foldLeft(joined)((df, c) => df.withColumn(c + suffix, col(s"__match.$c")))
      .select((leftCols ++ rightCols.map(_ + suffix)).map(col): _*)
  }

  /** Equal-frequency quantile bucketing (the feature-engineering
    * "discretizer"): adds `outCol` = number of quantile boundaries the
    * row's value exceeds, bucket ∈ [0, nBuckets). Boundaries are EXACT
    * R-7 interpolated percentiles (one aggregate pass — same rule as
    * DuckDB `quantile_cont`, parity proven by `rel_percentiles`),
    * quantized to cents so the comparison is integer-exact cross-engine;
    * values are quantized the same way before comparing. Pass 2 is a pure
    * map against the collected boundary array (nBuckets−1 longs — a
    * driver literal, broadcast with the plan; never a join). Ties sharing
    * a boundary value all land in the lower bucket — equal-frequency up
    * to tie mass, deterministic always; NULL values get a NULL bucket,
    * never a silent minimum-imputation.
    *
    * Scale note: the boundary pass uses `percentile`, a HOLISTIC
    * aggregate (per-partition value buffers merge at one reducer) —
    * exact, and priced accordingly at web scale. When approximate
    * boundaries are acceptable, fit them with the mergeable KLL sketch
    * ([[graft.functions.QuantileSketch]]) instead and keep pass 2
    * unchanged; the exactness contract here is what makes the result
    * oracle-replayable. */
  def quantileBuckets(df: DataFrame, valueCol: String, nBuckets: Int,
                      outCol: String = "bucket"): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000,
      s"nBuckets must be in [2, 1000], got $nBuckets")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists")
    require(!df.columns.contains("__cents"),
      "input must not already carry a __cents column")
    val probs = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val row = df.agg(
      expr(s"percentile($valueCol, array(${probs.mkString(", ")}))")).head
    require(!row.isNullAt(0), "quantileBuckets needs a non-empty input")
    val boundaries = row.getSeq[Double](0)
      .map(q => math.floor(q * 100 + 0.5).toLong).toArray
    val cents = expr(s"CAST(floor($valueCol * 100 + 0.5) AS BIGINT)")
    // ONE array literal + a size(filter(...)) scan per row: no chained
    // CASE blowup at large nBuckets, no per-element re-derivation (the
    // lambda compares against a precomputed column, not an expression).
    // NULL values get a NULL bucket — filter() would silently drop the
    // NULL-predicate elements and impute "minimum", the worst kind of
    // missing-value handling for a feature column
    df.withColumn("__cents", cents)
      .withColumn(outCol,
        when(col("__cents").isNull, lit(null).cast("int"))
          .otherwise(size(filter(lit(boundaries), b => col("__cents") > b))))
      .drop("__cents")
  }

  /** Winsorize: clamp `valueCol` (as cents) to its [pLo, pHi] exact
    * percentiles — the outlier-trim before a mean/sum a heavy tail would
    * otherwise own. Same two-pass shape as [[quantileBuckets]] (exact
    * boundary aggregate, then a pure-map `greatest/least` clamp with two
    * driver literals) and the same holistic-boundary scale note applies.
    * Adds `outCol` (BIGINT cents); the source column is untouched and
    * NULL values stay NULL. */
  def winsorize(df: DataFrame, valueCol: String, pLo: Double, pHi: Double,
                outCol: String = "winsorized_cents"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists")
    val row = df.agg(expr(s"percentile($valueCol, array($pLo, $pHi))")).head
    require(!row.isNullAt(0), "winsorize needs a non-empty input")
    val Seq(lo, hi) = row.getSeq[Double](0)
      .map(q => math.floor(q * 100 + 0.5).toLong).toSeq
    // NULL stays NULL: Spark's least/greatest SKIP null arguments, so an
    // unguarded clamp would fabricate the upper boundary for every
    // missing value and silently inflate any downstream sum
    df.withColumn(outCol,
      when(col(valueCol).isNull, lit(null).cast("long"))
        .otherwise(greatest(lit(lo), least(lit(hi),
          expr(s"CAST(floor($valueCol * 100 + 0.5) AS BIGINT)")))))
  }

  /** Equi-width histogram of `valueCol` (in cents): `nBins` integer-width
    * bins over the column's observed [min, max]. Two passes, both trivially
    * scalable: one min/max aggregate (two longs to the driver), then a
    * pure-map bin assignment + one partial-aggregated groupBy — the same
    * shape as [[winsorize]]'s boundary pass, but the boundary aggregate is
    * algebraic (min/max merge), NOT holistic, so unlike the exact-percentile
    * family this histogram costs a cheap map-side-combined pass even at
    * 100 TB. All arithmetic is integer (`width = ceil(span / nBins)`,
    * `bin = (cents - lo) DIV width`): bin edges replay exactly in any
    * engine, no float boundary can drift a row across bins. The max value
    * lands in the LAST bin (half-open bins `[lo+i·w, lo+(i+1)·w)` with the
    * top edge clamped). NULL values are excluded (they have no position on
    * the axis; count them separately with a `count(*) - count(v)` audit).
    * Output: `bin, lo_cents, hi_cents, n` — `hi_cents` exclusive. */
  /** Top-N categories + an exact OTHER bucket — the reporting rollup
    * ("top 10 domains and everything else") with totals that RECONCILE:
    * every row lands in exactly one bucket, so Σn = corpus rows and
    * Σshare_ppm ≈ 10⁶ by construction, unlike a bare top-N whose
    * remainder silently vanishes.
    *
    * Scale shape: per-key counts (one partial-aggregated shuffle,
    * Materialize-cut once — read by the top-N pass and the tag pass),
    * top-N as a TakeOrdered by (n DESC, key) — NEVER a single-partition
    * window over the key frame, which is unbounded for domain-like
    * keys — then a broadcast IN-set tag and a (N+1)-group re-aggregate;
    * the grand total rides in as a broadcast one-row cross (the
    * modularity pattern). NULL keys land in OTHER (documented; a NULL
    * category is "everything else" by definition). A REAL key whose
    * string form is exactly "OTHER" fails loudly (raise_error in the
    * bucket column, the abTest/pageRank guard style): silently merging
    * it with the remainder would conflate both buckets' n_keys/n/share
    * with no signal — rename such a domain upstream. Output per bucket:
    * `bucket, n_keys, n, share_ppm`, top buckets first by n. */
  def topNOther(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val counts = Materialize.cutLazy(
      df.groupBy(col(keyCol).cast("string").as("__k"))
        .agg(count(lit(1)).as("__n")))
    val top = counts.where(col("__k").isNotNull)
      .orderBy(col("__n").desc, col("__k")).limit(topN)
      .select(col("__k").as("__topk"))
    val total = counts.agg(sum(col("__n")).as("__tot"))
    counts
      .join(broadcast(top), col("__k") === col("__topk"), "left")
      .withColumn("bucket",
        when(col("__k") === "OTHER", raise_error(lit(
          "topNOther: a real key stringifies to the reserved bucket " +
            "label 'OTHER'; it would silently merge with the remainder " +
            "bucket - rename or pre-map that key")))
          .when(col("__topk").isNotNull, col("__k"))
          .otherwise(lit("OTHER")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_keys"), sum(col("__n")).as("n"))
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_keys"), col("n"),
        expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000) DIV __tot AS BIGINT)")
          .as("share_ppm"))
  }

  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1 && nBins <= 100000,
      s"nBins must be in [1, 100000], got $nBins")
    val cents = expr(s"CAST(floor($valueCol * 100 + 0.5) AS BIGINT)")
    val row = df.agg(min(cents), max(cents)).head
    require(!row.isNullAt(0), "histogram needs at least one non-NULL value")
    val lo = row.getLong(0)
    val hi = row.getLong(1)
    val width = math.max(1L, (hi - lo) / nBins + (if ((hi - lo) % nBins == 0) 0 else 1))
    df.where(col(valueCol).isNotNull)
      .select(least(lit(nBins - 1L), binOf(cents - lit(lo), width)).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .select(col("bin").cast("int").as("bin"),
        (lit(lo) + col("bin") * width).as("lo_cents"),
        (lit(lo) + (col("bin") + 1) * width).as("hi_cents"),
        col("n"))
  }

  /** Per-group MODE, deterministic: the most frequent value of `valueCol`
    * within each group, ties broken by the SMALLEST value (an undefined
    * tie would drift between runs/engines — a mode that changes under
    * repartitioning is not a statistic). Two partial-aggregated groupBys:
    * (group, value) counts, then an argmax carried as `min(struct(-cnt,
    * value))` — both merge map-side, no window, no value list ever
    * materializes per group. NULL values are excluded (a "most frequent:
    * unknown" answer is an audit row, not a mode). Output: the group
    * columns + `mode_value` (valueCol's type) + `mode_n`. */
  def modeBy(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "modeBy: groupCols must be non-empty")
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    counts
      .groupBy(groupCols.map(col): _*)
      .agg(min(struct((-col("__n")).as("negn"), col(valueCol).as("v"))).as("__best"))
      .select((groupCols.map(col) :+
        col("__best.v").as("mode_value") :+
        (-col("__best.negn")).as("mode_n")): _*)
  }

  /** Per-group MEDIAN ABSOLUTE DEVIATION — the robust spread statistic
    * (insensitive to the outliers that own a stddev): exact R-7 median of
    * `|v − median(v)|` per group. Two holistic percentile aggregates with a
    * group-cardinality-sized join between them (the median table is tiny —
    * broadcast — so the detail frame shuffles ONCE, for the final per-group
    * aggregate). The usual exact-percentile scale note applies ([[
    * quantileBuckets]]): per-group value buffers at one reducer each —
    * exact and priced accordingly; swap in the KLL sketch for the
    * approximate variant. NULLs are excluded from both passes. Output:
    * group columns + `med` + `mad` (both DOUBLE — R-7 interpolates
    * halves; quantize at the call site for hashing). */
  def mad(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "mad: groupCols must be non-empty")
    Seq("__med", "med", "mad").foreach(c =>
      require(!df.columns.contains(c), s"mad: column name '$c' is reserved"))
    val meds = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    df.where(col(valueCol).isNotNull)
      .join(broadcast(meds), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(first(col("__med")).as("med"),
        expr(s"percentile(abs($valueCol - __med), 0.5)").as("mad"))
  }

  /** 2-D SKYLINE (Pareto front), both dimensions maximized: the rows no
    * other row dominates (x' ≥ x ∧ y' ≥ y with one strict) — "orders
    * that are both recent AND large", the multi-objective top-N that no
    * single ORDER BY expresses. Exact-duplicate (x, y) pairs don't
    * dominate each other and all survive.
    *
    * NOT the naive quadratic NOT-EXISTS self-join: pass 1 collapses the
    * corpus to its per-x maximum y (ONE partial-aggregated shuffle on
    * x); pass 2 runs the running-max scan over the DISTINCT-X frame via
    * the range-partitioned [[RangeScan]] (r12 — a near-unique x no
    * longer lands the whole collapsed frame on one reducer; the skyline
    * recurrence: an x survives iff its ymax strictly beats every larger
    * x's ymax); pass 3 semi-joins survivors back. Both columns must be
    * integral (loud — a silent cast would corrupt the dominance order
    * exactly like the graph ops' id casts); NULL in either column = no
    * position in the dominance order, excluded. */
  def skylineMax(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    requireIntegralTime(df, xCol, "skylineMax", what = "dominance")
    requireIntegralTime(df, yCol, "skylineMax", what = "dominance")
    val clean = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = clean.groupBy(col(xCol).cast("long").as("__x"))
      .agg(max(col(yCol).cast("long")).as("__ymax"))
    // larger-x rows precede under DESC; no peers (x is distinct here)
    val sky = RangeScan.runningAgg(perX, Seq(col("__x").desc), Seq(
        RangeScan.Scan(col("__ymax"), "__ma", isMax = true)))
      .where(col("__ma").isNull || col("__ymax") > col("__ma"))
    df.join(sky, col(xCol).cast("long") === col("__x") &&
      col(yCol).cast("long") === col("__ymax"), "left_semi")
  }

  /** Two-sample KOLMOGOROV–SMIRNOV distance, integer-exact: the
    * distribution-drift gate ("did today's spend/doc-length/score
    * distribution shift vs yesterday's?") as the max CDF gap
    * `D = max_x |F_a(x) − F_b(x)|`, cross-multiplied so no division
    * appears before the verdict:
    *
    *   D_scaled = max_x |n_b·cum_a(x) − n_a·cum_b(x)|,  D = D_scaled/(n_a·n_b)
    *
    * — every step integer (DECIMAL(38,0)-exact to ~10¹⁸ rows/side), the
    * argmax value replays exactly in any engine; `d_ppm` is the floor'd
    * ppm of D for a single-number readout. Ties on D break to the
    * SMALLEST value (first time the evidence peaks, the changepoint
    * rule). Values must be integral (cents/ppm — quantize upstream; the
    * exactness contract is what makes this hash-gateable); NULL values
    * and rows of neither side are excluded.
    *
    * Plan: ONE partial-aggregated groupBy collapses the corpus to
    * per-distinct-value side counts, then the [[RangeScan]] two-pass
    * running sum over the DISTINCT-value frame (r12 — cost was already
    * distinct values, not rows; now those distinct values are also
    * range-partitioned across the cluster instead of one reducer, so a
    * near-unique micros column merely costs a bigger scan, not a
    * straggler). Totals ride a broadcast one-row frame; the final
    * argmax is one aggregate.
    * Output (one row): `n_a, n_b, d_scaled, d_ppm, at_value`. */
  def ksTest(df: DataFrame, valueCol: String, sideCol: String,
             sideA: String, sideB: String): DataFrame = {
    require(sideA != sideB, s"ksTest: sides must differ, got '$sideA' twice")
    requireIntegralTime(df, valueCol, "ksTest", what = "sample value")
    val dec = "decimal(38,0)"
    val counts = df
      .where(col(valueCol).isNotNull && col(sideCol).isin(sideA, sideB))
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(sideCol) === sideA, 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol) === sideB, 1L).otherwise(0L)).as("c2"))
    val cum = RangeScan.runningAgg(counts, Seq(col("v")), Seq(
        RangeScan.Scan(col("c1"), "__c1r", includeCurrent = true),
        RangeScan.Scan(col("c2"), "__c2r", includeCurrent = true)))
    // side totals from the MATERIALIZED scan frame, not the raw lineage —
    // the corpus collapse runs once, in RangeScan's job
    val tot = cum.agg(sum(col("c1")).cast(dec).as("__n1"),
      sum(col("c2")).cast(dec).as("__n2"))
    val scored = cum
      .withColumn("__f1", col("__c1r").cast(dec))
      .withColumn("__f2", col("__c2r").cast(dec))
      .crossJoin(broadcast(tot))
      .withColumn("__d", abs(col("__n2") * col("__f1") - col("__n1") * col("__f2")))
    scored
      .groupBy()
      .agg(min(struct((-col("__d")).as("negd"), col("v").as("v"))).as("__best"),
        first(col("__n1")).as("__n1"), first(col("__n2")).as("__n2"))
      // empty input: the global aggregate still emits one all-NULL row —
      // drop it so "no data" reads as zero rows in ANY engine (a DuckDB
      // LIMIT-1-over-empty replay produces none)
      .where(col("__best").isNotNull)
      .select(
        col("__n1").cast("long").as("n_a"),
        col("__n2").cast("long").as("n_b"),
        (-col("__best.negd")).cast("long").as("d_scaled"),
        expr("CAST((-__best.negd) * 1000000 DIV (__n1 * __n2) AS BIGINT)").as("d_ppm"),
        col("__best.v").as("at_value"))
  }

  /** WILSON score lower bound in ppm — "rank by rating, fairly": the
    * lower end of the binomial confidence interval for `pos/n`, so an
    * item with 2/2 positives ranks BELOW one with 80/100 (a raw rate
    * can't say that, and additive smoothing needs a magic prior). The
    * sort key for any conversion/CTR/rating leaderboard where group
    * sizes differ by orders of magnitude. All inputs are integers cast
    * to double at pinned points and the expression tree is mirrored
    * TEXTUALLY by the oracle — every IEEE op is correctly rounded, so
    * the result is bit-identical cross-engine (the rel_correlation
    * rule, sqrt included). NULL/zero n → NULL. */
  def wilsonLowerPpm(pos: Column, n: Column, z: Double = 1.96): Column = {
    val nn = n.cast("double")
    val p = pos.cast("double") / nn
    val z2 = lit(z) * lit(z)
    when(n.isNull || n <= 0, lit(null).cast("long"))
      .otherwise(floor(lit(1e6) *
        ((p + z2 / (lit(2.0) * nn)
          - lit(z) * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nn)) / nn))
          / (lit(1.0) + z2 / nn))).cast("long"))
  }

  /** ASSOCIATION RULES over (basket, item) facts — classic
    * market-basket mining at the pair level: for every ordered rule
    * `a → b` with pair support ≥ `minSupport`,
    *
    *   confidence = sup(ab)·10⁶ DIV sup(a)
    *   lift       = sup(ab)·N·10⁶ DIV (sup(a)·sup(b))
    *
    * in integer ppm (N = retained baskets) — "customers who bought a
    * also bought b" with the base-rate correction that separates a real
    * rule from two popular items. Top-k by (lift, confidence,
    * antecedent, consequent) as a TakeOrdered.
    *
    * Plan: distinct (basket, item) collapse (materialized — read by the
    * basket guard, item supports, and the pair build); baskets larger
    * than `maxBasket` items are EXCLUDED before the pair self-join (a
    * d-item basket emits d(d−1)/2 pairs — the LSH maxBucket convention:
    * a megabasket is a crawler/bot artifact, not signal; N counts
    * retained baskets so supports stay consistent); the pair join is
    * EQUI on the basket key (the bipartiteProjection shape). Pair
    * magnitude: sup·N·10⁶ ≤ N²·10⁶ — BIGINT-exact to ~3·10⁶ baskets,
    * DECIMAL past that (used unconditionally).
    * Output: `antecedent, consequent, support, conf_ppm, lift_ppm`. */
  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
                  minSupport: Long, k: Int,
                  maxBasket: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val dec = "decimal(38,0)"
    val bi0 = df.where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val sizes = bi0.groupBy("__b").agg(count(lit(1)).as("__sz"))
    val bi = Materialize.cutLazy(
      bi0.join(sizes.where(col("__sz") <= maxBasket), Seq("__b"), "left_semi")
        .repartition(col("__b")))
    val nB = bi.agg(countDistinct(col("__b")).cast(dec).as("__nb"))
    val itemSup = bi.groupBy(col("__i")).agg(count(lit(1)).as("__sup"))
    val pairSup = bi.as("x").join(bi.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("__a"), col("y.__i").as("__c"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
    val rules = pairSup.select(col("__a"), col("__c"), col("support"))
      .union(pairSup.select(col("__c"), col("__a"), col("support")))
    rules
      .join(itemSup.select(col("__i").as("__a"), col("__sup").as("__sa")), "__a")
      .join(itemSup.select(col("__i").as("__c"), col("__sup").as("__sc")), "__c")
      .crossJoin(broadcast(nB))
      .select(col("__a").as("antecedent"), col("__c").as("consequent"),
        col("support"),
        expr(s"CAST((CAST(support AS $dec) * 1000000) DIV __sa AS BIGINT)")
          .as("conf_ppm"),
        expr(s"CAST((CAST(support AS $dec) * __nb * 1000000) DIV (CAST(__sa AS $dec) * __sc) AS BIGINT)")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("conf_ppm").desc,
        col("antecedent"), col("consequent"))
      .limit(k)
  }

  /** CHI-SQUARE independence test over two CATEGORICAL columns — the
    * drift/association gate where [[ksTest]] needs an ordered axis
    * ("is event mix independent of weekday?", "did the source×language
    * composition shift?"). The statistic is computed cell-exactly with
    * the classic algebraic identity `(O−E)²/E = (N·o − r·c)²/(N·r·c)`
    * so every term is an integer ratio, floored per cell at ×10⁶ —
    * `chi2_scaled ≈ χ²·10⁶` with ≤1 floor-ulp error per cell, an exact
    * DEFINED metric any engine replays bit-for-bit. ZERO cells of the
    * full contingency grid contribute (their term is `r·c·10⁶ DIV N` —
    * omitting them understates the statistic exactly where a category
    * pair never co-occurs, the strongest dependence signal there is).
    * NULL categories are excluded.
    *
    * Plan: one partial-aggregated groupBy collapses the corpus to
    * observed cells (materialized — read by the row rollup, the column
    * rollup, and the grid join); the full grid is rowTotals ×
    * colTotals — a CONTINGENCY TABLE, so the category cardinality
    * product must be modest (that is what "categorical" means; guard
    * cardinality upstream for id-like columns). One cross join of two
    * category-sized frames + one broadcast scalar; corpus shuffles
    * once. Magnitude: the per-cell cross-term peaks at ~N⁴·10⁶, so
    * DECIMAL(38,0) is exact to roughly 10⁸ rows — past that, run the
    * test on a deterministic sample (the abTest rule: at such N any
    * real dependence is significant long before the sample hurts).
    *
    * Output (one row; empty input → zero rows): `n, r_card, c_card,
    * dof, chi2_scaled`. */
  def chiSquareTest(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val obs = Materialize.cutLazy(
      df.where(col(rowCol).isNotNull && col(colCol).isNotNull)
        .groupBy(col(rowCol).cast("string").as("__r"),
          col(colCol).cast("string").as("__c"))
        .agg(count(lit(1)).as("__o")))
    val rt = obs.groupBy("__r").agg(sum(col("__o")).cast(dec).as("__rt"))
    val ct = obs.groupBy("__c").agg(sum(col("__o")).cast(dec).as("__ct"))
    val tot = obs.agg(sum(col("__o")).cast(dec).as("__n"))
    // broadcast: ct is category-cardinality-sized by construction (a
    // chi-square grid past broadcast size is not a runnable test) — the
    // hint is also what clears the CartesianGuard now standing in the
    // gate/bench sessions
    rt.crossJoin(broadcast(ct))
      .join(obs, Seq("__r", "__c"), "left")
      .select(col("__r"), col("__c"), coalesce(col("__o"), lit(0L)).as("__o"),
        col("__rt"), col("__ct"))
      .crossJoin(broadcast(tot))
      .select(col("__r"), col("__c"), col("__n"),
        expr("CAST(((__n * CAST(__o AS DECIMAL(38,0)) - __rt * __ct) * (__n * CAST(__o AS DECIMAL(38,0)) - __rt * __ct) * 1000000) DIV (__n * __rt * __ct) AS DECIMAL(38,0))")
          .as("__t"))
      .groupBy()
      .agg(first(col("__n")).as("__n"),
        countDistinct(col("__r")).as("r_card"),
        countDistinct(col("__c")).as("c_card"),
        sum(col("__t")).as("__chi"))
      .where(col("__n").isNotNull)
      .select(col("__n").cast("long").as("n"),
        col("r_card"), col("c_card"),
        ((col("r_card") - 1) * (col("c_card") - 1)).as("dof"),
        col("__chi").cast("long").as("chi2_scaled"))
  }

  /** CRAMÉR's V (r11) — the EFFECT-SIZE companion [[chiSquareTest]]'s
    * χ² statistic needs at corpus scale: with 10⁸ rows a χ² of
    * thousands can mean a practically irrelevant association (χ² grows
    * with n; V = √(χ²/(n·min(r−1, c−1))) ∈ [0, 1] does not). Same exact
    * integer pipeline — the only new op is the one mirrored IEEE sqrt
    * over the already-gated `chi2_scaled` (the wilson rule). Degenerate
    * 1×k grids (min(r−1, c−1) = 0) read NULL. Output: `n, r_card,
    * c_card, chi2_scaled, v_ppm`. */
  def cramersV(df: DataFrame, rowCol: String, colCol: String): DataFrame =
    chiSquareTest(df, rowCol, colCol).selectExpr(
      "n", "r_card", "c_card", "chi2_scaled",
      """CASE WHEN n > 0 AND least(r_card - 1, c_card - 1) > 0
        | THEN CAST(floor(sqrt(CAST(chi2_scaled AS DOUBLE)
        |   / (1000000.0 * CAST(n AS DOUBLE)
        |     * CAST(least(r_card - 1, c_card - 1) AS DOUBLE))) * 1000000.0) AS BIGINT)
        | END AS v_ppm""".stripMargin)

  /** Two-proportion A/B TEST, integer-exact (the [[TimeSeries.anomalies]]
    * discipline): per-unit conversion (a unit converts if ANY of its rows
    * has `successCol` true — row-level counting would let chatty users
    * vote repeatedly), two variants compared by the pooled two-proportion
    * z-test at z = 1.96 (two-sided 5%), CROSS-MULTIPLIED so no float,
    * sqrt, or division appears before the verdict:
    *
    *   625 · (c₁n₂ − c₂n₁)² · N  >  2401 · c · (N−c) · n₁ · n₂
    *
    * (z² = 3.8416 = 2401/625 exactly; c = c₁+c₂, N = n₁+n₂.) Runs in
    * DECIMAL(38,0): exact to ~3·10⁶ units per variant — past that, run
    * the test on a deterministic unit sample (at that n any real
    * difference is significant anyway). A unit observed under MULTIPLE
    * variants (or a NULL variant) is assignment corruption and fails
    * LOUDLY inside the consumed column — the sample-ratio-mismatch class
    * of bug silently biases every downstream readout. Exactly two
    * variants required (checked in the consumed output, same rule).
    * Variant `a` is the smaller variant value; `diff_ppm` = a's
    * conversion minus b's in ppm (integral division).
    *
    * One row out; two partial-aggregated groupBys (unit, then variant —
    * the second input is variant-cardinality-sized). Output: `variant_a,
    * n_a, conv_a, variant_b, n_b, conv_b, diff_ppm, significant`. */
  def abTest(df: DataFrame, unitCol: String, variantCol: String,
             successCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val units = df.groupBy(col(unitCol))
      .agg(countDistinct(col(variantCol)).as("__nv"),
        max(col(variantCol)).as("__v"),
        coalesce(max(col(successCol).cast("int")), lit(0)).as("__s"))
      .select(
        // NULL unit ids would silently collapse every identity-less row
        // into one phantom unit — corruption, same as multi-variant
        when(col(unitCol).isNotNull && col("__nv") === 1, col("__v"))
          .otherwise(raise_error(concat(
            lit("abTest: NULL unit id, or unit under multiple/NULL variants ("),
            coalesce(col(unitCol).cast("string"), lit("null")), lit(")")))).as("__v"),
        col("__s"))
    val one = units.groupBy("__v")
      .agg(count(lit(1)).as("n"), sum("__s").cast("long").as("c"))
      .agg(count(lit(1)).as("__k"),
        min(struct(col("__v"), col("n"), col("c"))).as("__a"),
        max(struct(col("__v"), col("n"), col("c"))).as("__b"))
    val Seq(n1, c1, n2, c2) =
      Seq("__a.n", "__a.c", "__b.n", "__b.c").map(f => col(f).cast(dec))
    val bigN = n1 + n2
    val bigC = c1 + c2
    val d = c1 * n2 - c2 * n1
    val sig = lit(625).cast(dec) * d * d * bigN >
      lit(2401).cast(dec) * bigC * (bigN - bigC) * n1 * n2
    one.select(
      when(col("__k") === 2, col("__a.__v"))
        .otherwise(raise_error(concat(lit("abTest: expected exactly 2 variants, got "),
          col("__k").cast("string")))).as("variant_a"),
      col("__a.n").as("n_a"), col("__a.c").as("conv_a"),
      col("__b.__v").as("variant_b"),
      col("__b.n").as("n_b"), col("__b.c").as("conv_b"),
      (expr("(__a.c * 1000000) DIV __a.n")
        - expr("(__b.c * 1000000) DIV __b.n")).as("diff_ppm"),
      // the variant-count guard rides the DECISION column too: a consumer
      // selecting only `significant` must still hit it (column pruning
      // would silently drop a guard that lives on variant_a alone)
      when(col("__k") === 2, sig)
        .otherwise(raise_error(concat(lit("abTest: expected exactly 2 variants, got "),
          col("__k").cast("string")))).as("significant"))
  }

  /** Pre-flight cardinality audit for a proposed equi join: the EXACT
    * output-row count each key would contribute (`n_left × n_right`),
    * top-k heaviest first — computed from per-key count profiles alone,
    * WITHOUT running the join. At 100 TB this is the difference between
    * discovering a skewed/exploding join from a 2-minute profile pass
    * and discovering it from a dead executor three hours in: one hot key
    * past the budget → route it through [[Skew.replicatedJoin]] or block
    * it; a huge total → rethink the plan.
    *
    * SCALE: both profiles are partial-aggregated counts (map-side
    * combine); their join is key-cardinality-sized, and the top-k is a
    * `TakeOrdered` over it — bounded driver result, no global sort
    * materialization. Inner-join semantics: only keys present on BOTH
    * sides contribute (NULL keys match nothing and are excluded, like
    * the join being audited). Ties order by the key for determinism.
    * Output: `key, n_left, n_right, est_pairs`. */
  def joinCardinalityAudit(left: DataFrame, leftKey: String,
                           right: DataFrame, rightKey: String,
                           k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lc = left.where(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val rc = right.where(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    lc.join(rc, "key")
      .withColumn("est_pairs", col("n_left") * col("n_right"))
      .orderBy(col("est_pairs").desc, col("key"))
      .limit(k)
  }

  /** WELCH's unequal-variance two-sample test on MEANS — the A/B readout
    * for a continuous metric (revenue per user, latency) where [[ksTest]]
    * asks about whole distributions and [[chiSquareTest]] about
    * categories. Reported as t² (one squared statistic avoids the
    * transcendental sqrt — compare against F(1, df) = t² critical
    * values) plus the Welch–Satterthwaite df:
    *
    *   t² = (m_a − m_b)² / (s²_a/n_a + s²_b/n_b)
    *   df = (s²_a/n_a + s²_b/n_b)² /
    *        ((s²_a/n_a)²/(n_a−1) + (s²_b/n_b)²/(n_b−1))
    *
    * Moments (n, Σv, Σv²) are EXACT in DECIMAL(38,0) from one
    * partial-aggregated pass; the final t²/df expressions evaluate in
    * IEEE double at pinned casts with the tree mirrored TEXTUALLY by
    * the oracle (the wilson/rel_correlation rule — every op correctly
    * rounded, bit-identical cross-engine). `mean_diff_ppm` stays fully
    * integral. Degenerate inputs (a side under 2 samples, or both
    * variances zero) read NULL t²/df — never a fake statistic; empty
    * input emits zero rows (the ksTest convention). */
  def welchT(df: DataFrame, valueCol: String, sideCol: String,
             sideA: String, sideB: String): DataFrame = {
    require(sideA != sideB, s"welchT: sides must differ, got '$sideA' twice")
    requireIntegralTime(df, valueCol, "welchT", what = "sample value")
    val dec = "decimal(38,0)"
    val m = df
      .where(col(valueCol).isNotNull && col(sideCol).isin(sideA, sideB))
      .select(col(sideCol).as("__s"), col(valueCol).cast("long").cast(dec).as("__v"))
      .groupBy()
      .agg(
        sum(when(col("__s") === sideA, 1L).otherwise(0L)).cast(dec).as("na"),
        sum(when(col("__s") === sideB, 1L).otherwise(0L)).cast(dec).as("nb"),
        sum(when(col("__s") === sideA, col("__v")).otherwise(lit(0).cast(dec))).as("sa"),
        sum(when(col("__s") === sideB, col("__v")).otherwise(lit(0).cast(dec))).as("sb"),
        sum(when(col("__s") === sideA, col("__v") * col("__v"))
          .otherwise(lit(0).cast(dec))).as("qa"),
        sum(when(col("__s") === sideB, col("__v") * col("__v"))
          .otherwise(lit(0).cast(dec))).as("qb"))
      .where(col("na") > 0 || col("nb") > 0)
    // pinned-double tail, mirrored textually by the oracle: variances
    // from exact decimal sums, one double cast point per operand
    val va = "((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)))"
    val vb = "((CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)))"
    val sea = s"($va / CAST(na AS DOUBLE))"
    val seb = s"($vb / CAST(nb AS DOUBLE))"
    val md = "((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)) - (CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)))"
    m.selectExpr(
      "CAST(na AS BIGINT) AS n_a",
      "CAST(nb AS BIGINT) AS n_b",
      "CASE WHEN na > 0 AND nb > 0 THEN CAST((sa * nb - sb * na) * 1000000 DIV (na * nb) AS BIGINT) END AS mean_diff_ppm",
      s"CASE WHEN na >= 2 AND nb >= 2 AND ($sea + $seb) > 0.0 THEN CAST(floor($md * $md / ($sea + $seb) * 1000000.0) AS BIGINT) END AS t2_ppm",
      s"CASE WHEN na >= 2 AND nb >= 2 AND ($sea + $seb) > 0.0 THEN CAST(floor(($sea + $seb) * ($sea + $seb) / ($sea * $sea / (CAST(na AS DOUBLE) - 1.0) + $seb * $seb / (CAST(nb AS DOUBLE) - 1.0)) * 1000.0) AS BIGINT) END AS df_milli")
  }

  /** MANN–WHITNEY U (Wilcoxon rank-sum) — the NONPARAMETRIC A/B on
    * location: does side A stochastically dominate side B, robust to
    * outliers and any monotone transform of the metric (the test to
    * reach for when [[welchT]]'s mean is hostage to whales). Exact
    * integer rank machinery on the [[ksTest]] frame:
    *
    *   - per distinct value: side counts (c1, c2) — ONE partial-agg
    *     groupBy collapses the corpus;
    *   - 2×average-rank of a tie block: `R2 = 2·(ranks before) + t + 1`
    *     (integer — the ×2 trick keeps half-ranks exact);
    *   - `2W_A = Σ c1·R2`, `2U_A = 2W_A − 2·n_a(n_a+1)/2` — shipped as
    *     `u2_a` (U itself can be half-integral under cross-side ties);
    *   - tie correction `Σ(t³−t)` off the same collapsed frame;
    *   - Var(U) = n_a·n_b·[(n³−n) − Σ(t³−t)] / (12·n·(n−1)) held as an
    *     exact DECIMAL numerator/denominator pair (overflow bound:
    *     n_a·n_b·n³ < 10³⁸ — fine to ~4·10⁷ rows/side; beyond that
    *     coarsen or sample, the documented [[ksTest]] contract);
    *   - z_milli = floor((2U−n_a·n_b − sign)·1000 / (2·√(Var))) — the
    *     [[graft.pipeline.TimeSeries.mannKendall]] continuity-corrected
    *     readout: one IEEE sqrt, division pinned, oracle mirrors the
    *     tree textually.
    *
    * Plan: groupBy(value) partial-aggregates map-side; the running-rank
    * scan rides the DISTINCT-value collapsed frame through the
    * range-partitioned [[RangeScan]] (the r12 ksTest bound — cost is
    * distinct values, not rows, and no single reducer owns them); the
    * final verdict is one global aggregate. Output (one row):
    * `n_a, n_b, u2_a, tie_cubes, z_milli`. */
  def mannWhitney(df: DataFrame, valueCol: String, sideCol: String,
                  sideA: String, sideB: String): DataFrame = {
    require(sideA != sideB, s"mannWhitney: sides must differ, got '$sideA' twice")
    requireIntegralTime(df, valueCol, "mannWhitney", what = "sample value")
    val dec = "decimal(38,0)"
    val counts = df
      .where(col(valueCol).isNotNull && col(sideCol).isin(sideA, sideB))
      .groupBy(col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(sideCol) === sideA, 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol) === sideB, 1L).otherwise(0L)).as("c2"))
    val ranked = RangeScan.runningAgg(counts, Seq(col("v")), Seq(
        RangeScan.Scan(col("c1") + col("c2"), "__cbr")))
      .withColumn("__cb", coalesce(col("__cbr"), lit(0L)))
      .withColumn("__r2",
        (lit(2L) * col("__cb") + col("c1") + col("c2") + lit(1L)).cast(dec))
      .withColumn("__t", (col("c1") + col("c2")).cast(dec))
    val m = ranked.groupBy()
      .agg(sum(col("c1")).cast(dec).as("na"),
        sum(col("c2")).cast(dec).as("nb"),
        sum(col("c1").cast(dec) * col("__r2")).as("w2a"),
        sum(col("__t") * col("__t") * col("__t") - col("__t")).as("tc"))
      .where(col("na") > 0 || col("nb") > 0)
    val u2c = "(w2a - na * (na + 1) - na * nb)" // 2U_A − n_a·n_b, the centered stat
    val varNum = "(na * nb * (((na + nb) * (na + nb) * (na + nb) - (na + nb)) - tc))"
    val varDen = "(12 * (na + nb) * (na + nb - 1))"
    m.selectExpr(
      "CAST(na AS BIGINT) AS n_a",
      "CAST(nb AS BIGINT) AS n_b",
      "CAST(w2a - na * (na + 1) AS BIGINT) AS u2_a",
      "CAST(tc AS BIGINT) AS tie_cubes",
      s"""CASE WHEN na > 0 AND nb > 0 AND $varNum > 0
         | THEN CAST(floor((CAST($u2c AS DOUBLE) - CAST(sign($u2c) AS DOUBLE)) * 1000.0
         |   / (2.0 * sqrt(CAST($varNum AS DOUBLE) / CAST($varDen AS DOUBLE)))) AS BIGINT)
         | END AS z_milli""".stripMargin)
  }

  /** KRUSKAL–WALLIS H — [[mannWhitney]]'s k-sample extension: do ANY of
    * the groups differ in location (compare `h_milli/1000` against
    * χ²(k−1) critical values). Same collapsed distinct-value rank frame,
    * but side counts pivot per GROUP:
    *
    *   - per (group): n_g and `R2_g = Σ c_g·R2(v)` — exact 2×rank sums;
    *   - `S = Σ_g ⌊R2_g² / (4·n_g)⌋` — per-group mean-square rank mass
    *     with the division floored EXACTLY in DECIMAL (numerator minus
    *     its pmod, then the now-exact division — Spark's `DIV` returns
    *     BIGINT and would overflow; DuckDB replays with HUGEINT `//`).
    *     The ≤ 1-per-group floor is part of the published recipe (both
    *     engines replay it; it shifts H by < 12k/n² — sub-milli beyond
    *     a few hundred rows);
    *   - H = 12·S/(n(n+1)) − 3(n+1), tie-corrected by
    *     ×(n³−n)/((n³−n) − Σ(t³−t)), assembled in the pinned-double
    *     mirrored tail (DECIMAL magnitude bound: R2_g² ≤ 4n⁴ — safe in
    *     38 digits to ~10⁸ rows).
    *
    * Output (one row): `n, n_groups, tie_cubes, h_milli`. Groups are
    * whatever distinct values `groupCol` holds; NULL group/value rows
    * drop. */
  def kruskalWallis(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    requireIntegralTime(df, valueCol, "kruskalWallis", what = "sample value")
    val dec = "decimal(38,0)"
    val counts = df
      .where(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("v"), col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("c"))
    // per-value totals drive ranks; per-(value, group) counts weight them
    val perV = counts.groupBy("v").agg(sum(col("c")).as("t"))
    val ranked = RangeScan.runningAgg(perV, Seq(col("v")), Seq(
        RangeScan.Scan(col("t"), "__cbr")))
      .withColumn("__cb", coalesce(col("__cbr"), lit(0L)))
      .withColumn("__r2", (lit(2L) * col("__cb") + col("t") + lit(1L)).cast(dec))
    val perG = counts.join(ranked.select(col("v"), col("__r2")), Seq("v"))
      .groupBy("g")
      .agg(sum(col("c")).cast(dec).as("ng"),
        sum(col("c").cast(dec) * col("__r2")).as("r2g"))
    val ties = ranked.groupBy()
      .agg(sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec)
        - col("t").cast(dec)).as("tc"))
    val m = perG.groupBy()
      .agg(sum(col("ng")).as("n"),
        count(lit(1)).cast("long").as("k"),
        sum(expr(
          "CAST((r2g * r2g - pmod(r2g * r2g, 4 * ng)) / (4 * ng) AS DECIMAL(38,0))"))
          .as("s"))
      .crossJoin(broadcast(ties))
      .where(col("n") > 0)
    m.selectExpr(
      "CAST(n AS BIGINT) AS n",
      "k AS n_groups",
      "CAST(tc AS BIGINT) AS tie_cubes",
      """CASE WHEN n >= 2 AND ((n * n * n - n) - tc) > 0
        | THEN CAST(floor((12.0 * CAST(s AS DOUBLE)
        |     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
        |   - 3.0 * (CAST(n AS DOUBLE) + 1.0))
        |   * (CAST(n * n * n - n AS DOUBLE)
        |     / CAST((n * n * n - n) - tc AS DOUBLE)) * 1000.0) AS BIGINT)
        | END AS h_milli""".stripMargin)
  }

  /** SPEARMAN rank correlation — the monotone-association readout
    * (Pearson is linear association; Spearman survives any monotone
    * warp and outliers): Pearson over 2×average ranks, all-integer
    * until the one mirrored sqrt. Ranks come from the same collapsed
    * distinct-value frame as [[mannWhitney]], once per column; each
    * row joins its two R2 ranks back ON THE VALUE (two value-keyed
    * exchanges), then one global moment aggregate:
    *
    *   rho_ppm = floor( (n·Σab − Σa·Σb) · 10⁶
    *                    / (√(n·Σa²−(Σa)²) · √(n·Σb²−(Σb)²)) )
    *
    * with a, b the integer R2 ranks — the `rel_correlation`
    * moment recipe verbatim (DECIMAL sums exact; R2 ≤ 2n so n·Σa² ≤
    * 4n⁴ — the 10⁷-row DECIMAL bound again). Output (one row):
    * `n, rho_ppm`. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    requireIntegralTime(df, xCol, "spearman", what = "x value")
    requireIntegralTime(df, yCol, "spearman", what = "y value")
    val dec = "decimal(38,0)"
    def r2Table(c: String) = {
      val counts = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
        .groupBy(col(c).cast("long").as("v")).agg(count(lit(1)).as("t"))
      RangeScan.runningAgg(counts, Seq(col("v")), Seq(
          RangeScan.Scan(col("t"), "__cbr")))
        .withColumn("__cb", coalesce(col("__cbr"), lit(0L)))
        .select(col("v"), (lit(2L) * col("__cb") + col("t") + lit(1L)).as("r2"))
    }
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val withRanks = base
      .join(r2Table(xCol).withColumnRenamed("r2", "__ra"), col("__x") === col("v"))
      .drop("v")
      .join(r2Table(yCol).withColumnRenamed("r2", "__rb"), col("__y") === col("v"))
      .drop("v")
    val m = withRanks.groupBy()
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("__ra").cast(dec)).as("sa"),
        sum(col("__rb").cast(dec)).as("sb"),
        sum(col("__ra").cast(dec) * col("__ra").cast(dec)).as("qa"),
        sum(col("__rb").cast(dec) * col("__rb").cast(dec)).as("qb"),
        sum(col("__ra").cast(dec) * col("__rb").cast(dec)).as("sab"))
      .where(col("n") > 0)
    m.selectExpr(
      "CAST(n AS BIGINT) AS n",
      """CASE WHEN n >= 2 AND (n * qa - sa * sa) > 0 AND (n * qb - sb * sb) > 0
        | THEN CAST(floor(CAST(n * sab - sa * sb AS DOUBLE) * 1000000.0
        |   / (sqrt(CAST(n * qa - sa * sa AS DOUBLE)) * sqrt(CAST(n * qb - sb * sb AS DOUBLE)))) AS BIGINT)
        | END AS rho_ppm""".stripMargin)
  }

  /** KENDALL's tau-b (r11) — the pair-concordance rank correlation
    * completing the family ([[spearman]] measures rank LINEARITY; tau
    * is the probability-of-concordance readout analysts quote, with
    * the cleaner interpretation under heavy ties). Pairwise, hence the
    * deliberate quadratic — handled by the house [[TimeSeries.theilSen]]
    * contract: EXACT tau over a DETERMINISTIC md5-rank sample of
    * `maxRows` rows (the [[TextAnalysis.samplePerGroup]] bottom-k key —
    * h60("kt:"∥id), ties on (id, x, y) so the key is total even when
    * duplicate ids carry different pairs — so the sample, hence the
    * statistic, replays in any engine forever). Raising `maxRows` is the explicit
    * opt-in; at n = 2000 the pair stage is 2M cheap comparisons.
    *
    *   S   = Σ_{i<j} sign((xᵢ−xⱼ)·(yᵢ−yⱼ))       (exact long)
    *   n1  = Σ_x t(t−1)/2,  n2 = Σ_y t(t−1)/2     (tie pairs)
    *   tau_milli = ⌊1000·S / (√(n0−n1)·√(n0−n2))⌋, n0 = n(n−1)/2
    *
    * — two mirrored IEEE sqrts (the wilson rule); all-tied sides read
    * NULL. Output (one row): `n, s_stat, tie_x, tie_y, tau_milli`.
    *
    * Plan: the sample is one TakeOrdered (never a full sort); the pair
    * stage is a broadcast self-join of the sample against itself; tie
    * counts are two groupBys on the same sample frame. */
  def kendallTau(df: DataFrame, idCol: String, xCol: String, yCol: String,
                 maxRows: Int = 2000): DataFrame = {
    require(maxRows >= 2 && maxRows <= 20000,
      s"maxRows must be in [2, 20000] (pairs are quadratic), got $maxRows")
    requireIntegralTime(df, xCol, "kendallTau", what = "x value")
    requireIntegralTime(df, yCol, "kendallTau", what = "y value")
    val sample = Materialize.cutLazy(df
      .where(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .withColumn("__h",
        conv(substring(md5(concat(lit("kt:"), col("__id").cast("string"))), 1, 15), 16, 10)
          .cast("long"))
      // (x, y) extend the cut key (r11 advice): with DUPLICATE ids
      // carrying different pairs, (h, id) alone is not a total order and
      // the limit would cut arbitrarily among equal-key rows — breaking
      // the replay-forever contract. Oracle mirrors the full key.
      .orderBy(col("__h"), col("__id"), col("__x"), col("__y"))
      .limit(maxRows)
      .drop("__h"))
    val a = sample.select(col("__id").as("__ia"), col("__x").as("__xa"), col("__y").as("__ya"))
    val bb = sample.select(col("__id").as("__ib"), col("__x").as("__xb"), col("__y").as("__yb"))
    // concordance sign via comparisons, not the diff product (which
    // could overflow long at extreme magnitudes)
    val sgn = when((col("__xa") > col("__xb") && col("__ya") > col("__yb")) ||
        (col("__xa") < col("__xb") && col("__ya") < col("__yb")), 1L)
      .when(col("__xa") =!= col("__xb") && col("__ya") =!= col("__yb"), -1L)
      .otherwise(0L)
    val s = a.join(broadcast(bb), col("__ia") < col("__ib"))
      .agg(coalesce(sum(sgn), lit(0L)).as("s_stat"))
    def tiePairs(c: String) = sample.groupBy(col(c)).agg(count(lit(1)).as("__t"))
      .agg(coalesce(sum(expr("__t * (__t - 1) DIV 2")), lit(0L)).as(s"tie$c"))
    val n = sample.agg(count(lit(1)).as("n"))
    n.crossJoin(broadcast(s))
      .crossJoin(broadcast(tiePairs("__x").withColumnRenamed("tie__x", "tie_x")))
      .crossJoin(broadcast(tiePairs("__y").withColumnRenamed("tie__y", "tie_y")))
      .where(col("n") > 0)
      .selectExpr("n", "s_stat", "tie_x", "tie_y",
        """CASE WHEN n >= 2 AND (n * (n - 1) DIV 2 - tie_x) > 0 AND (n * (n - 1) DIV 2 - tie_y) > 0
          | THEN CAST(floor(CAST(s_stat AS DOUBLE) * 1000.0
          |   / (sqrt(CAST(n * (n - 1) DIV 2 - tie_x AS DOUBLE))
          |    * sqrt(CAST(n * (n - 1) DIV 2 - tie_y AS DOUBLE)))) AS BIGINT)
          | END AS tau_milli""".stripMargin)
  }

  /** TWO-PROPORTION z-test — the conversion A/B readout (did cohort A
    * convert more than cohort B), reported as z² (≡ the 2×2 Pearson
    * chi-square with the pooled-variance denominator; compare against
    * χ²(1) critical values — no sqrt needed). Fully determined by four
    * counts, z² collapses to one exact rational:
    *
    *   z² = (x_a·n_b − x_b·n_a)² · (n_a + n_b)
    *        ─────────────────────────────────────────
    *        n_a · n_b · (x_a + x_b) · (n_a + n_b − x_a − x_b)
    *
    * evaluated at pinned double casts over the exact counts (numerator
    * 4th-order in counts — decimal would overflow at ~10⁹ per side; the
    * wilson rule keeps it bit-identical cross-engine at any scale).
    * `successCol` must be exactly 0/1 (booleans cast; anything else
    * fails loudly in the consumed column — a 2 silently counted as one
    * success is how a conversion test lies). Degenerate pooled rates
    * (all success / all failure) read NULL z²; empty input emits zero
    * rows. Output: n_a, x_a, n_b, x_b, rate_a_ppm, rate_b_ppm, z2_ppm. */
  def twoProportionZ(df: DataFrame, successCol: String, sideCol: String,
                     sideA: String, sideB: String): DataFrame = {
    require(sideA != sideB, s"twoProportionZ: sides must differ, got '$sideA' twice")
    val s01 = df.schema(successCol).dataType match {
      case org.apache.spark.sql.types.BooleanType =>
        col(successCol).cast("long")
      case _ => when(col(successCol).isin(0, 1), col(successCol).cast("long"))
        .otherwise(expr(
          s"raise_error(concat('twoProportionZ: $successCol must be 0/1, got ', CAST($successCol AS STRING)))"))
    }
    val m = df
      .where(col(successCol).isNotNull && col(sideCol).isin(sideA, sideB))
      .select(col(sideCol).as("__s"), s01.as("__x"))
      .groupBy()
      .agg(
        sum(when(col("__s") === sideA, 1L).otherwise(0L)).as("na"),
        sum(when(col("__s") === sideB, 1L).otherwise(0L)).as("nb"),
        sum(when(col("__s") === sideA, col("__x")).otherwise(0L)).as("xa"),
        sum(when(col("__s") === sideB, col("__x")).otherwise(0L)).as("xb"))
      .where(col("na") > 0 || col("nb") > 0)
    val num = "(CAST(xa AS DOUBLE) * CAST(nb AS DOUBLE) - CAST(xb AS DOUBLE) * CAST(na AS DOUBLE))"
    val den = "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * (CAST(xa AS DOUBLE) + CAST(xb AS DOUBLE)) * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - CAST(xa AS DOUBLE) - CAST(xb AS DOUBLE)))"
    m.selectExpr(
      "na AS n_a", "xa AS x_a", "nb AS n_b", "xb AS x_b",
      "CASE WHEN na > 0 THEN CAST(xa * 1000000L DIV na AS BIGINT) END AS rate_a_ppm",
      "CASE WHEN nb > 0 THEN CAST(xb * 1000000L DIV nb AS BIGINT) END AS rate_b_ppm",
      s"CASE WHEN na > 0 AND nb > 0 AND (xa + xb) > 0 AND (na + nb - xa - xb) > 0 THEN CAST(floor($num * $num * (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) / $den * 1000000.0) AS BIGINT) END AS z2_ppm")
  }

  /** Poisson-BOOTSTRAP confidence interval for per-group means (Efron
    * '79 via the Poisson(1) approximation — the resampling scheme that
    * needs no global row count and streams): the error bar every
    * A/B/drift readout should carry, computed deterministically so the
    * interval itself hash-gates.
    *
    * Each of `b` resamples weights every row by an md5-derived
    * Poisson(1) draw — `u = h60(md5(id:rep))` against the FIXED
    * cumulative thresholds `⌊CDF_Poisson(1)(k)·2⁶⁰⌋` spliced as
    * literals into both engines (weights 0..9; P(≥9) < 2·10⁻⁶ — the
    * truncation is part of the published contract, not drift). Resample
    * mean = `Σ w·x DIV Σ w` in cents (truncating DIV); the interval is
    * the 2.5%/97.5% ORDER STATISTICS of the b means (ranks
    * `max(1, b DIV 40)` and `b + 1 − that` — values the resamples
    * actually produced, no interpolation). Empty resamples (possible
    * only on tiny groups) drop out and `b_eff` reports the survivors;
    * a group vanishes from the output only when EVERY resample is
    * empty — probability (1/e)^b for a 1-row group, ~10⁻²⁸ at b=64.
    *
    * Output: `groupCols…, n, mean_cents, b_eff, ci_lo_cents,
    * ci_hi_cents`.
    *
    * Plan: ONE pass over the corpus exploded ×b (the bootstrap's
    * intrinsic cost — b=64 reads like 64 map-side passes fused into
    * one shuffle), partial-aggregated to group×b rows; the order
    * statistics ride a window over ≤ b rows per group. `idCol` must be
    * a stable row identity (the hash seed — resampling keys off it). */
  def bootstrapMeanCi(df: DataFrame, groupCols: Seq[String], idCol: String,
                      valueCol: String, b: Int = 64): DataFrame = {
    require(b >= 4 && b <= 4096, s"b must be in [4, 4096], got $b")
    val dec = "decimal(38,0)"
    // ⌊CDF_Poisson(1)(k) · 2^60⌋ for k = 0..8; u >= last → weight 9
    val ts = Seq(424136118829305344L, 848272237658610688L,
      1060340297073263360L, 1131029650211480960L, 1148701988496035328L,
      1152236456152946176L, 1152825534095764608L, 1152909688087595776L,
      1152920207336574720L)
    val gcols = groupCols.map(col)
    val loRank = math.max(1, b / 40)
    val hiRank = b + 1 - loRank
    // The ×b explode multiplies CPU (b md5 draws per row), so parallelism
    // is capped by the SCAN's split count, not the data volume: a small
    // table arriving as a handful of splits serializes b·n hash draws on
    // a few cores (r11: the bench's 4-split lineitem ran the 38M-draw
    // explode ~7× slower than the cores allow). Pre-spread the corpus to
    // the session parallelism when — and only when — the scan gave fewer
    // splits; at real scale the scan already yields ≫ cores splits and
    // the spread is skipped (no 100 TB re-shuffle). Round-robin
    // repartition is value-neutral here: every downstream sum is an
    // exact DECIMAL fold keyed by (group, rep).
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    val spread = if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    // all b draws of a row in ONE digest loop (PoissonWeights) — value-
    // identical to the per-(row, rep) md5/conv SQL chain (same bytes,
    // same h60 fold, same thresholds) but without b expression trees
    // per row, which dominated the operator's cost
    val base = spread
      .select(gcols :+ col(idCol).cast("string").as("__id")
        :+ floor(col(valueCol) * 100 + 0.5).cast("long").as("__x"): _*)
      .select(gcols :+ col("__x") :+ posexplode(
        org.apache.spark.sql.graftshim.GraftShim.column(
          graft.functions.PoissonWeights(
            org.apache.spark.sql.graftshim.GraftShim.expression(col("__id")), b, ts)))
        .as(Seq("__rep", "__w")): _*)
    val reps = base
      .groupBy(gcols :+ col("__rep"): _*)
      .agg(sum(col("__w").cast(dec)).as("__nw"),
        // widen BEFORE the multiply (r10 advice): __w·__x in LONG first
        // would overflow/ANSI-error at cent magnitudes past ~10¹⁸/9 where
        // the DECIMAL oracle (HUGEINT in DuckDB) stays exact — the cast
        // order must match the oracle's widening order
        sum(col("__w").cast(dec) * col("__x").cast(dec)).as("__swx"))
      .where(col("__nw") > 0)
      .select(gcols :+ expr("CAST(__swx DIV __nw AS BIGINT)").as("__mean"): _*)
    val wOrd = Window.partitionBy(gcols: _*).orderBy(col("__mean"))
    val wAll = Window.partitionBy(gcols: _*)
    val ci = reps
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__be", count(lit(1)).over(wAll))
      .groupBy(gcols: _*)
      .agg(first(col("__be")).as("b_eff"),
        min(when(col("__rn") === least(lit(loRank), col("__be")),
          col("__mean"))).as("ci_lo_cents"),
        min(when(col("__rn") === least(lit(hiRank), col("__be")),
          col("__mean"))).as("ci_hi_cents"))
    val point = df
      .select(gcols :+ floor(col(valueCol) * 100 + 0.5).cast("long").as("__x"): _*)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(__x AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("mean_cents"))
    // null-safe group join (the goldenRecords rule): groupBy keeps a
    // NULL group key as a real group, but a name-based equi-join would
    // silently drop it from the output
    val pa = point.alias("__bp")
    val ca = ci.alias("__bc")
    val cond = groupCols.map(c => col(s"__bp.$c") <=> col(s"__bc.$c"))
      .reduce(_ && _)
    pa.join(ca, cond)
      .select(groupCols.map(c => col(s"__bp.$c").as(c)) ++
        Seq(col("__bp.n").as("n"), col("__bp.mean_cents").as("mean_cents"),
          col("__bc.b_eff").as("b_eff"),
          col("__bc.ci_lo_cents").as("ci_lo_cents"),
          col("__bc.ci_hi_cents").as("ci_hi_cents")): _*)
  }

  /** Cohen's kappa (Cohen '60) — agreement between two categorical
    * columns BEYOND CHANCE: raw agreement po alone rewards a rater that
    * always answers the majority class; kappa subtracts the agreement
    * two independent raters with these marginals would reach anyway.
    * The inter-rater metric for classifier-vs-label audits, annotator
    * QC, and heuristic-vs-heuristic comparisons (langid vs declared
    * lang, rule battery vs model verdict).
    *
    * EXACT: with N rows, `agree` matching rows and
    * `pe_num = Σ_c row_c·col_c` (matching-category marginal products),
    * `kappa = (N·agree − pe_num) / (N² − pe_num)` — one integer
    * rational, reported as ppm by truncating DIV (DECIMAL(38,0)
    * arithmetic: N²·10⁶ leaves BIGINT past ~3M rows). Rows with a NULL
    * on either side are EXCLUDED (no category to agree on — count them
    * upstream if NULL-ness itself is the signal); `pe = 1` exactly
    * (all mass in one matched cell) has no beyond-chance margin →
    * kappa NULL, never a fake 0/0.
    *
    * Output: one row — `n, n_agree, kappa_ppm`.
    *
    * Plan: the corpus collapses to contingency CELLS in one
    * partial-aggregated pass (materialized, read 3×: marginals + the
    * diagonal); everything after runs on |categories|-sized frames. */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Materialize.cutLazy(
      df.where(col(aCol).isNotNull && col(bCol).isNotNull)
        .groupBy(col(aCol).cast("string").as("__a"),
          col(bCol).cast("string").as("__b"))
        .agg(count(lit(1)).as("__n")))
    val rowT = cells.groupBy("__a").agg(sum("__n").as("__ra"))
    val colT = cells.groupBy("__b").agg(sum("__n").as("__cb"))
    val peNum = rowT.join(colT, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ra").cast(dec) * col("__cb").cast(dec)),
        lit(0).cast(dec)).as("__pe"))
    val tot = cells.agg(
      coalesce(sum("__n"), lit(0L)).cast(dec).as("__t"),
      coalesce(sum(when(col("__a") === col("__b"), col("__n"))
        .otherwise(0L)), lit(0L)).cast(dec).as("__agree"))
    tot.crossJoin(broadcast(peNum))
      .where(col("__t") > 0)
      .select(col("__t").cast("long").as("n"),
        col("__agree").cast("long").as("n_agree"),
        when(expr("__t * __t - __pe") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "CAST(((__t * __agree - __pe) * 1000000) DIV (__t * __t - __pe) AS BIGINT)"))
          .as("kappa_ppm"))
  }

  /** FLEISS' kappa (Fleiss '71) — [[cohenKappa]]'s n-rater extension:
    * chance-corrected agreement when EVERY item carries the same number
    * of categorical ratings (three annotators, three model votes, an
    * ensemble). Input is the LONG form — one row per (item, rating);
    * the rater identity is irrelevant to the statistic, only the
    * per-item category counts n_ij matter. All-integer:
    *
    *   P̄  = (Σ n_ij² − N·n) / (N·n·(n−1))        (observed agreement)
    *   P̄e = Σ_j c_j² / (N·n)²                     (chance agreement)
    *   kappa = (P̄ − P̄e)/(1 − P̄e)
    *         = [(S2 − T)·T² − D·Σc_j²] / [D·(T² − Σc_j²)]
    *
    * with T = N·n, D = N·n·(n−1) — one exact DECIMAL rational, reported
    * as the truncating `kappa_ppm` (the cohenKappa convention; negative
    * = worse than chance). A ragged panel (items with differing rating
    * counts) FAILS LOUDLY — silently averaging over a ragged design is
    * how agreement numbers lie; n = 1 (no pairs to agree) and the
    * single-category degenerate (den = 0) read NULL.
    *
    * Plan: one (item, category) partial-agg groupBy — the corpus
    * collapses to ≤ N·k cells; per-item and per-category rollups ride
    * that collapsed frame; the verdict is one aggregate row:
    * `n_items, n_raters, n_categories, kappa_ppm`. */
  def fleissKappa(df: DataFrame, itemCol: String, catCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Materialize.cutLazy(
      df.where(col(itemCol).isNotNull && col(catCol).isNotNull)
        .groupBy(col(itemCol).cast("string").as("__i"),
          col(catCol).cast("string").as("__c"))
        .agg(count(lit(1)).as("__n")))
    val perItem = cells.groupBy("__i")
      .agg(sum("__n").as("__ni"),
        sum(col("__n").cast(dec) * col("__n").cast(dec)).as("__s2i"))
    val items = perItem.agg(count(lit(1)).as("__N"),
      min("__ni").as("__nmin"), max("__ni").as("__nmax"),
      sum(col("__s2i")).as("__s2"))
    val cats = cells.groupBy("__c").agg(sum("__n").as("__cj"))
      .agg(coalesce(sum(col("__cj").cast(dec) * col("__cj").cast(dec)),
        lit(0).cast(dec)).as("__cq"),
        count(lit(1)).cast("long").as("__k"))
    items.crossJoin(broadcast(cats))
      .where(col("__N") > 0)
      .selectExpr(
        "CAST(__N AS BIGINT) AS n_items",
        s"""CASE WHEN __nmin = __nmax THEN CAST(__nmin AS BIGINT)
           | ELSE raise_error(concat('fleissKappa: ragged panel — items carry ',
           |   CAST(__nmin AS STRING), ' to ', CAST(__nmax AS STRING),
           |   ' ratings; the statistic requires a constant rater count'))
           | END AS n_raters""".stripMargin,
        "__k AS n_categories",
        s"""CASE WHEN __nmin = __nmax AND __nmin >= 2
           |       AND (CAST(__N AS $dec) * __nmin * (__nmin - 1))
           |         * (CAST(__N AS $dec) * __nmin * (CAST(__N AS $dec) * __nmin) - __cq) <> 0
           | THEN CAST(((__s2 - CAST(__N AS $dec) * __nmin)
           |         * (CAST(__N AS $dec) * __nmin) * (CAST(__N AS $dec) * __nmin)
           |       - (CAST(__N AS $dec) * __nmin * (__nmin - 1)) * __cq) * 1000000
           |     DIV ((CAST(__N AS $dec) * __nmin * (__nmin - 1))
           |       * (CAST(__N AS $dec) * __nmin * (CAST(__N AS $dec) * __nmin) - __cq)) AS BIGINT)
           | END AS kappa_ppm""".stripMargin)
  }

  /** ONE-WAY ANOVA F (Fisher '25): the parametric k-group mean test
    * beside the engine's nonparametric Kruskal–Wallis — when the metric
    * is well-behaved the F test has the power; when it isn't, kruskal is
    * the fallback (both read off the same GROUP BY shape). Also reports
    * η² (SSB/SST ppm) — the effect size a bare p-value hides.
    *
    *   F = [SSB/(k−1)] / [SSW/(N−k)],  SSB = Σ_g T_g²/n_g − T²/N,
    *   SSW = Σx² − Σ_g T_g²/n_g
    *
    * The rel_correlation discipline: per-group exact DECIMAL moments on
    * ONE partial-aggregated groupBy, the k-sized group frame re-aggregated
    * for the grand terms (Σ T_g²/n_g at pinned IEEE — T_g² overflows any
    * integer envelope at corpus scale, and a ratio is the target anyway),
    * F in milli-units. Degenerate designs (k < 2, N ≤ k, zero within-group
    * variance) read NULL, never NaN. Output one row: `k_groups, n_total,
    * f_milli, eta2_ppm`. */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    requireIntegralTime(df, valueCol, "anovaF", what = "sample value")
    val dec = "decimal(38,0)"
    val groups = df.select(col(groupCol).as("__g"),
        col(valueCol).cast("long").cast(dec).as("__x"))
      .groupBy("__g")
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__t"),
        sum(col("__x") * col("__x")).as("__ss"))
    groups.agg(
        count(lit(1)).cast("long").as("k_groups"),
        sum(col("__n")).cast("long").as("n_total"),
        sum(col("__t")).as("__T"),
        sum(col("__ss")).as("__SS"),
        // per-group T_g² DIV n_g as EXACT integers (truncation loses < 1
        // cent² per group — invisible at any scale and replayed by
        // DuckDB's //). DECIMAL end to end: Spark's IntegralDivide (DIV)
        // always lands in BIGINT, and the per-group value is ~4·10¹⁸ at
        // sf0.1 already — a few × more data and the BIGINT squeeze wraps
        // under ANSI while DuckDB's HUGEINT // keeps going. Subtracting
        // the exact remainder first makes the decimal division an exact
        // integer, so the (38,6) quotient carries no rounding to floor
        // away — bit-identical to the truncating // for non-negative T_g.
        sum(expr(
          "CAST((__t * __t - (__t * __t) % __n) / __n AS DECIMAL(38,0))"))
          .as("__bt"))
      .select(col("k_groups"), col("n_total"),
        expr("""CASE WHEN k_groups >= 2 AND n_total > k_groups
                 AND CAST(__SS AS DOUBLE) - CAST(__bt AS DOUBLE) > 0
              THEN CAST(floor(1000 *
                ((CAST(__bt AS DOUBLE)
                    - CAST(__T AS DOUBLE) * CAST(__T AS DOUBLE) / CAST(n_total AS DOUBLE))
                   / CAST(k_groups - 1 AS DOUBLE))
                / ((CAST(__SS AS DOUBLE) - CAST(__bt AS DOUBLE))
                   / CAST(n_total - k_groups AS DOUBLE)))
                AS BIGINT) END""").as("f_milli"),
        expr("""CASE WHEN CAST(__SS AS DOUBLE)
                   - CAST(__T AS DOUBLE) * CAST(__T AS DOUBLE) / CAST(n_total AS DOUBLE) > 0
              THEN CAST(floor(1000000 *
                (CAST(__bt AS DOUBLE)
                   - CAST(__T AS DOUBLE) * CAST(__T AS DOUBLE) / CAST(n_total AS DOUBLE))
                / (CAST(__SS AS DOUBLE)
                   - CAST(__T AS DOUBLE) * CAST(__T AS DOUBLE) / CAST(n_total AS DOUBLE)))
                AS BIGINT) END""").as("eta2_ppm"))
  }

  /** THEIL-T inequality DECOMPOSITION (Theil '67; Shorrocks '80 for the
    * decomposability) in the house lg64 grade: where the Gini
    * (`TextAnalysis.giniConcentration`) gives ONE number, Theil's index
    * splits additively — is the spend inequality BETWEEN segments
    * (markets differ) or WITHIN them (whales everywhere)? — the question
    * a mix-rebalancing decision actually needs answered.
    *
    *   T        = Σᵢ (xᵢ/X)·ln(xᵢ·N/X)          (grand index)
    *   T_within = Σ_g (X_g/X)·T_g,  T_between = Σ_g (X_g/X)·ln((X_g/X)/(n_g/N))
    *
    * ln is replaced by the monotone integer lg64 grade in its ADDITIVE
    * form (lg64(a·b) ≈ lg64(a) + lg64(b) − 64 is NOT used — each factor
    * enters as its own grade term, identically in every engine, so the
    * decomposition is bit-replayable; values are "grade-64 log units",
    * the entropy64 convention, NOT nats). Values must be ≥ 1 (Theil is
    * defined for positive quantities — zero/negative amounts raise
    * in-column). Exact integer products summed in DECIMAL(38,0); one
    * truncating DIV per readout.
    *
    * Plan: one per-group moment groupBy (n, Σx, Σx·lg64(x)), the grand
    * totals re-aggregated from the group frame (group-count-sized) and
    * crossed back as a one-row broadcast. Output per group: `group, n,
    * cents_share_ppm, t_within_64e3, t_between_term_64e3` (both in
    * grade-64 milli-units; Σ of the between terms ≈ T_between·10³). */
  def theilDecomposition(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame = {
    requireIntegralTime(df, valueCol, "theilDecomposition", what = "amount")
    val dec = "decimal(38,0)"
    def lg(x: String) = graft.functions.Lg64.sql(x)
    val guarded = when(col(valueCol).cast("long") >= 1L, col(valueCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("theilDecomposition: amounts must be >= 1 (Theil is defined for "),
        lit("positive quantities), got "),
        coalesce(col(valueCol).cast("string"), lit("NULL")))))
    val groups = df.select(col(groupCol).as("grp"), guarded.as("__x"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(expr(s"CAST(__x * ${lg("__x")} AS DECIMAL(38,0))")).as("__sxlg"))
    val grand = groups.agg(
      sum(col("n")).as("__gn"),
      sum(col("__sx")).as("__gsx"))
    groups.crossJoin(broadcast(grand))
      .select(col("grp").as(groupCol), col("n"),
        expr("CAST(__sx * 1000000 DIV __gsx AS BIGINT)").as("cents_share_ppm"),
        // T_g (grade): [Σx·lg64(x) + Σx·(lg64(n_g) − lg64(Σx_g) − 64)] / Σx_g
        // — the −64 removes the additive form's constant bias (lg64(a) +
        // lg64(b) − lg64(ab) = 64 exactly at powers of two), so an
        // equal-within group reads 0 (exact at power-of-two amounts)
        expr(s"""CAST((__sxlg + __sx * (${lg("n")} - ${lg("CAST(__sx AS BIGINT)")} - 64))
              * 1000 DIV __sx AS BIGINT)""").as("t_within_64e3"),
        // share-weighted between term: (X_g/X)·[lg64(X_g) + lg64(N) − lg64(n_g) − lg64(X)]
        expr(s"""CAST(__sx * (${lg("CAST(__sx AS BIGINT)")} + ${lg("__gn")}
              - ${lg("n")} - ${lg("CAST(__gsx AS BIGINT)")})
              * 1000 DIV __gsx AS BIGINT)""").as("t_between_term_64e3"))
  }

  /** DIFFERENCE-IN-DIFFERENCES (Card & Krueger, AER '94 lineage — the
    * workhorse quasi-experimental readout): when assignment is NOT
    * randomized (a feature shipped to one segment, a policy hit one
    * region), the naive post-period gap confounds the intervention with
    * pre-existing level differences; DiD subtracts each arm's OWN
    * pre-period baseline and reads the effect off the double delta
    *
    *   DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)
    *
    * under the parallel-trends assumption (the caller's burden — pair
    * with [[cuped]]/abTest for the randomized case).
    *
    * Input: one row per (unit, period) with `armCol` ∈ {0 = control,
    * 1 = treated}, `periodCol` ∈ {0 = pre, 1 = post} (any other value
    * fails loudly in-column) and an integral value. Exact DECIMAL(38,0)
    * cell sums on ONE groupBy (four cells — skew-proof), means and the
    * double delta at pinned IEEE points, e3 fixed point. Output one row
    * per arm: `arm, n_pre, n_post, mean_pre_e3, mean_post_e3, delta_e3,
    * did_e3` (the DiD repeated on both rows — the cuped θ convention);
    * any empty cell reads NULL did, never a fake zero. */
  def diffInDiff(df: DataFrame, armCol: String, periodCol: String,
                 valueCol: String): DataFrame = {
    requireIntegralTime(df, valueCol, "diffInDiff", what = "unit value")
    val dec = "decimal(38,0)"
    def flag(c: String, what: String) =
      when(col(c).cast("long").isin(0L, 1L), col(c).cast("long"))
        .otherwise(raise_error(concat(
          lit(s"diffInDiff: $what must be 0 or 1, got "),
          coalesce(col(c).cast("string"), lit("NULL")))))
    val cells = df.select(flag(armCol, "arm").as("arm"),
        flag(periodCol, "period").as("__p"),
        col(valueCol).cast("long").cast(dec).as("__v"))
      .groupBy("arm", "__p")
      .agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val byArm = cells.groupBy("arm").agg(
      sum(when(col("__p") === 0, col("__n"))).as("n_pre"),
      sum(when(col("__p") === 1, col("__n"))).as("n_post"),
      sum(when(col("__p") === 0, col("__s"))).as("__spre"),
      sum(when(col("__p") === 1, col("__s"))).as("__spost"))
    def mean(s: String, n: String) = s"(CAST($s AS DOUBLE) / CAST($n AS DOUBLE))"
    val withMeans = byArm.select(col("arm"), col("n_pre"), col("n_post"),
      expr(s"CASE WHEN n_pre > 0 THEN CAST(floor(1e3 * ${mean("__spre", "n_pre")}) AS BIGINT) END")
        .as("mean_pre_e3"),
      expr(s"CASE WHEN n_post > 0 THEN CAST(floor(1e3 * ${mean("__spost", "n_post")}) AS BIGINT) END")
        .as("mean_post_e3"),
      expr(s"""CASE WHEN n_pre > 0 AND n_post > 0
            THEN CAST(floor(1e3 * (${mean("__spost", "n_post")} - ${mean("__spre", "n_pre")})) AS BIGINT) END""")
        .as("delta_e3"),
      expr(s"""CASE WHEN n_pre > 0 AND n_post > 0
            THEN ${mean("__spost", "n_post")} - ${mean("__spre", "n_pre")} END""")
        .as("__d"))
    // the four-cell double delta crosses back as a one-row broadcast
    val did = withMeans.agg(
      expr("""CASE WHEN count(*) = 2 AND count(__d) = 2
           THEN CAST(floor(1e3 * (max(CASE WHEN arm = 1 THEN __d END)
                                  - max(CASE WHEN arm = 0 THEN __d END))) AS BIGINT)
           END""").as("did_e3"))
    withMeans.crossJoin(broadcast(did))
      .select(col("arm"), col("n_pre"), col("n_post"), col("mean_pre_e3"),
        col("mean_post_e3"), col("delta_e3"), col("did_e3"))
  }

  /** CUPED variance reduction for A/B readouts (Deng, Xu, Kohavi & Walker,
    * WSDM '13 — "Improving the sensitivity of online controlled
    * experiments by utilizing pre-experiment data"): the industry-standard
    * adjustment — regress the experiment metric y on a PRE-experiment
    * covariate x (θ = Cov(x,y)/Var(x), pooled across arms so the
    * adjustment is unbiased under randomization), report each arm's
    * adjusted mean ȳ_a − θ·(x̄_a − x̄); the arm DELTA keeps its expectation
    * while its variance shrinks by the factor 1 − ρ²(x,y) — the readout
    * that turns a week of experiment into the sensitivity of a month.
    *
    * The rel_correlation discipline: per-arm exact moment sums in
    * DECIMAL(38,0) on ONE partial-aggregated groupBy; the pooled moments
    * are re-aggregated from the arm frame (arm-count-sized — no second
    * data pass); θ, the adjusted means and ρ² drop to IEEE double at
    * pinned points only. Output per arm: `arm, n, mean_post_e3 (raw),
    * mean_adj_e3 (CUPED), theta_e6, var_reduction_ppm (= ⌊10⁶·ρ²⌋, the
    * variance removed)`; a zero-variance covariate reads θ = NULL and
    * mean_adj = the raw mean scaled (CUPED disarms, never divides by
    * zero). */
  def cuped(df: DataFrame, armCol: String, preCol: String,
            postCol: String): DataFrame = {
    requireIntegralTime(df, preCol, "cuped", what = "pre-period covariate")
    requireIntegralTime(df, postCol, "cuped", what = "experiment metric")
    val dec = "decimal(38,0)"
    val arms = df.select(col(armCol).as("arm"),
        col(preCol).cast("long").cast(dec).as("__x"),
        col(postCol).cast("long").cast(dec).as("__y"))
      .groupBy("arm")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"),
        sum(col("__x") * col("__y")).as("sxy"))
    val pooled = arms.agg(
      sum(col("n")).cast("long").as("__gn"),
      sum(col("sx")).as("__gsx"), sum(col("sy")).as("__gsy"),
      sum(col("sxx")).as("__gsxx"), sum(col("syy")).as("__gsyy"),
      sum(col("sxy")).as("__gsxy"))
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val varX = s"(${d("__gsxx")} - ${d("__gsx")} * ${d("__gsx")} / ${d("__gn")})"
    val varY = s"(${d("__gsyy")} - ${d("__gsy")} * ${d("__gsy")} / ${d("__gn")})"
    val covXY = s"(${d("__gsxy")} - ${d("__gsx")} * ${d("__gsy")} / ${d("__gn")})"
    val theta = s"($covXY / $varX)"
    arms.crossJoin(broadcast(pooled))
      .select(col("arm"), col("n"),
        expr(s"CAST(floor(1e3 * ${d("sy")} / ${d("n")}) AS BIGINT)")
          .as("mean_post_e3"),
        expr(s"""CASE WHEN $varX > 0
              THEN CAST(floor(1e3 * (${d("sy")} / ${d("n")}
                - $theta * (${d("sx")} / ${d("n")} - ${d("__gsx")} / ${d("__gn")}))) AS BIGINT)
              ELSE CAST(floor(1e3 * ${d("sy")} / ${d("n")}) AS BIGINT) END""")
          .as("mean_adj_e3"),
        expr(s"CASE WHEN $varX > 0 THEN CAST(floor(1e6 * $theta) AS BIGINT) END")
          .as("theta_e6"),
        expr(s"""CASE WHEN $varX > 0 AND $varY > 0
              THEN CAST(floor(1e6 * $covXY * $covXY / ($varX * $varY)) AS BIGINT) END""")
          .as("var_reduction_ppm"))
  }

  /** TWO-FEATURE least squares per group (the normal equations solved by
    * Cramer's rule): ŷ = b0 + b1·x1 + b2·x2 — the multiple-regression
    * step up from the single-slope fits the engine carries
    * (TimeSeries.trend, theilSen): "is price driven by quantity once
    * discount is controlled for" is not answerable with two marginal
    * slopes when x1 and x2 correlate.
    *
    * The rel_correlation discipline end to end: the NINE moment sums
    * (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y, plus Σy² for R²)
    * aggregate EXACTLY in DECIMAL(38,0) — merge-order-independent, one
    * map-side-combined groupBy — and only the closed-form Cramer
    * determinants drop to IEEE double at the same pinned points in
    * every engine. Output per group: `n, b0_e6, b1_e6, b2_e6, r2_ppm`
    * (coefficients in 1e6 fixed point, R² in ppm); a singular system
    * (collinear features, constant columns) reads NULL coefficients —
    * never NaN, never a fake zero.
    *
    * Inputs must be integral (caller quantizes — cents convention).
    * Plan: one pass, one partial-aggregated exchange on the group keys;
    * per-group state is ten numbers, skew-proof at any corpus size. */
  def ols2(df: DataFrame, groupCols: Seq[String], yCol: String,
           x1Col: String, x2Col: String): DataFrame = {
    require(groupCols.nonEmpty, "ols2: at least one group column")
    requireIntegralTime(df, yCol, "ols2", what = "response value")
    requireIntegralTime(df, x1Col, "ols2", what = "feature value")
    requireIntegralTime(df, x2Col, "ols2", what = "feature value")
    val dec = "decimal(38,0)"
    def d(c: String) = s"CAST($c AS DOUBLE)"
    // Cramer solve on A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], b = [sy,s1y,s2y]
    val det = s"(${d("n")} * (${d("s11")} * ${d("s22")} - ${d("s12")} * ${d("s12")})" +
      s" - ${d("s1")} * (${d("s1")} * ${d("s22")} - ${d("s12")} * ${d("s2")})" +
      s" + ${d("s2")} * (${d("s1")} * ${d("s12")} - ${d("s11")} * ${d("s2")}))"
    val det0 = s"(${d("sy")} * (${d("s11")} * ${d("s22")} - ${d("s12")} * ${d("s12")})" +
      s" - ${d("s1")} * (${d("s1y")} * ${d("s22")} - ${d("s12")} * ${d("s2y")})" +
      s" + ${d("s2")} * (${d("s1y")} * ${d("s12")} - ${d("s11")} * ${d("s2y")}))"
    val det1 = s"(${d("n")} * (${d("s1y")} * ${d("s22")} - ${d("s12")} * ${d("s2y")})" +
      s" - ${d("sy")} * (${d("s1")} * ${d("s22")} - ${d("s12")} * ${d("s2")})" +
      s" + ${d("s2")} * (${d("s1")} * ${d("s2y")} - ${d("s1y")} * ${d("s2")}))"
    val det2 = s"(${d("n")} * (${d("s11")} * ${d("s2y")} - ${d("s1y")} * ${d("s12")})" +
      s" - ${d("s1")} * (${d("s1")} * ${d("s2y")} - ${d("s1y")} * ${d("s2")})" +
      s" + ${d("sy")} * (${d("s1")} * ${d("s12")} - ${d("s11")} * ${d("s2")}))"
    val sse = s"(${d("syy")} - ($det0 / $det) * ${d("sy")}" +
      s" - ($det1 / $det) * ${d("s1y")} - ($det2 / $det) * ${d("s2y")})"
    val sst = s"(${d("syy")} - ${d("sy")} * ${d("sy")} / ${d("n")})"
    df.select(
        (groupCols.map(col) ++ Seq(
          col(yCol).cast("long").cast(dec).as("__y"),
          col(x1Col).cast("long").cast(dec).as("__x1"),
          col(x2Col).cast("long").cast(dec).as("__x2"))): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("__x1")).as("s1"), sum(col("__x2")).as("s2"),
        sum(col("__y")).as("sy"),
        sum(col("__x1") * col("__x1")).as("s11"),
        sum(col("__x2") * col("__x2")).as("s22"),
        sum(col("__x1") * col("__x2")).as("s12"),
        sum(col("__x1") * col("__y")).as("s1y"),
        sum(col("__x2") * col("__y")).as("s2y"),
        sum(col("__y") * col("__y")).as("syy"))
      .select(
        (groupCols.map(col) ++ Seq(
          col("n"),
          expr(s"CASE WHEN $det <> 0 THEN CAST(floor(1e6 * $det0 / $det) AS BIGINT) END")
            .as("b0_e6"),
          expr(s"CASE WHEN $det <> 0 THEN CAST(floor(1e6 * $det1 / $det) AS BIGINT) END")
            .as("b1_e6"),
          expr(s"CASE WHEN $det <> 0 THEN CAST(floor(1e6 * $det2 / $det) AS BIGINT) END")
            .as("b2_e6"),
          expr(s"CASE WHEN $det <> 0 AND $sst > 0 " +
            s"THEN CAST(floor(1000000 * (1 - $sse / $sst)) AS BIGINT) END")
            .as("r2_ppm"))): _*)
  }

  /** MINIMUM DETECTABLE EFFECT readout (the standard two-sample sizing
    * identity; Cohen '88 lineage) — the experiment-DESIGN companion the
    * A/B readout family (welch/z/cuped/did) was missing: before a test
    * runs, what effect size could THIS traffic even see?
    *
    *   MDE = (z_{1−α/2} + z_{1−β}) · σ_pooled · √(1/n_a + 1/n_b)
    *
    * at the industry-default α = 5% two-sided / power 80%, whose normal
    * quantiles are PINNED LITERAL doubles (2.8015852181129688 = z₀.₉₇₅
    * + z₀.₈₀ — a compile-time constant spliced into both engines, so no
    * Φ⁻¹ is ever evaluated). Moments follow the rel_correlation
    * discipline: per-(group, arm) exact DECIMAL (n, Σx, Σx²) on ONE
    * partial-aggregated groupBy, pooled variance and the square root at
    * pinned IEEE points, the readout floored to milli-cents. Degenerate
    * designs (an arm with < 2 rows, zero pooled variance, a missing
    * arm) read NULL, never a fake zero. Arms must be 0/1 — guarded
    * in-column (the diffInDiff convention). Output per group:
    * `group, n_a, n_b, mde_cents_milli`. */
  def mdeReadout(df: DataFrame, groupCol: String, armCol: String,
                 valueCol: String): DataFrame = {
    requireIntegralTime(df, valueCol, "mdeReadout", what = "metric value")
    val dec = "decimal(38,0)"
    val arm = when(col(armCol).isin(0, 1), col(armCol).cast("int"))
      .otherwise(raise_error(concat(lit("mdeReadout: arm must be 0/1, got "),
        col(armCol).cast("string"))))
    val m = df.select(col(groupCol).as("__g"), arm.as("__a"),
        col(valueCol).cast("long").cast(dec).as("__x"))
      .groupBy("__g", "__a")
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__ss"))
    m.groupBy(col("__g").as(groupCol))
      .agg(
        sum(when(col("__a") === 0, col("__n"))).as("n_a"),
        sum(when(col("__a") === 1, col("__n"))).as("n_b"),
        sum(when(col("__a") === 0, col("__s"))).as("__sa"),
        sum(when(col("__a") === 1, col("__s"))).as("__sb"),
        sum(when(col("__a") === 0, col("__ss"))).as("__ssa"),
        sum(when(col("__a") === 1, col("__ss"))).as("__ssb"))
      .select(col(groupCol), col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        expr("""CASE WHEN n_a >= 2 AND n_b >= 2
                 AND (CAST(__ssa AS DOUBLE)
                      - CAST(__sa AS DOUBLE) * CAST(__sa AS DOUBLE) / CAST(n_a AS DOUBLE))
                   + (CAST(__ssb AS DOUBLE)
                      - CAST(__sb AS DOUBLE) * CAST(__sb AS DOUBLE) / CAST(n_b AS DOUBLE)) > 0
              THEN CAST(floor(1000 * CAST('2.8015852181129688' AS DOUBLE) *
                sqrt((((CAST(__ssa AS DOUBLE)
                        - CAST(__sa AS DOUBLE) * CAST(__sa AS DOUBLE) / CAST(n_a AS DOUBLE))
                      + (CAST(__ssb AS DOUBLE)
                        - CAST(__sb AS DOUBLE) * CAST(__sb AS DOUBLE) / CAST(n_b AS DOUBLE)))
                     / CAST(n_a + n_b - 2 AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
                AS BIGINT) END""").as("mde_cents_milli"))
  }

  /** Wald SPRT for Bernoulli conversions (Wald, AMS 1945) — the
    * SEQUENTIAL test the fixed-horizon A/B family (z-test, Welch, MDE,
    * power curve) deliberately is not: evaluated after EVERY batch of
    * traffic, it says stop-and-accept, stop-and-reject, or keep
    * collecting, with the α/β guarantees holding under continuous
    * monitoring (peeking at a fixed-horizon test inflates α; the SPRT
    * is the classical always-valid answer).
    *
    * Exactly cross-engine by CONSTRUCTION: with H0: p = p0 vs
    * H1: p = p1, the log-likelihood ratio after s successes in n
    * trials is `s·ln(p1/p0) + (n−s)·ln((1−p1)/(1−p0))` — the two logs
    * and Wald's boundaries `ln((1−β)/α)`, `ln(β/(1−α))` are computed
    * ONCE driver-side and spliced into both engines as shortest
    * round-trip double literals, so each engine evaluates one multiply
    * and one add per group on identical doubles (no libm in either
    * plan — the mdeReadout pinned-quantile discipline taken all the
    * way). Output: group, n_trials, n_success, llr_milli (floored),
    * decision ('accept_h1' past the upper bound, 'accept_h0' below the
    * lower, else 'continue'). Non-0/1 successes raise in-column. */
  def sprt(df: DataFrame, groupCol: String, successCol: String,
           p0: Double, p1: Double,
           alpha: Double = 0.05, beta: Double = 0.2): DataFrame = {
    require(p0 > 0 && p1 > p0 && p1 < 1, s"need 0 < p0 < p1 < 1, got $p0, $p1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      s"alpha/beta must be in (0,1), got $alpha, $beta")
    val c1 = java.lang.Double.toString(math.log(p1 / p0))
    val c2 = java.lang.Double.toString(math.log((1 - p1) / (1 - p0)))
    val up = java.lang.Double.toString(math.log((1 - beta) / alpha))
    val lo = java.lang.Double.toString(math.log(beta / (1 - alpha)))
    // coalesce keeps the diagnostic readable when the bad value is NULL
    // (concat with a NULL cast would null the whole raised message)
    val succ = when(col(successCol).isin(0, 1), col(successCol).cast("long"))
      .otherwise(raise_error(concat(lit("sprt: success must be 0/1, got "),
        coalesce(col(successCol).cast("string"), lit("NULL")))))
    val llr = s"""(CAST(n_success AS DOUBLE) * CAST('$c1' AS DOUBLE)
       + CAST(n_trials - n_success AS DOUBLE) * CAST('$c2' AS DOUBLE))"""
    df.select(col(groupCol), succ.as("__s"))
      .groupBy(groupCol)
      .agg(count(lit(1)).cast("long").as("n_trials"),
        sum(col("__s")).cast("long").as("n_success"))
      .select(col(groupCol), col("n_trials"), col("n_success"),
        expr(s"CAST(floor(1000 * $llr) AS BIGINT)").as("llr_milli"),
        expr(s"""CASE WHEN $llr >= CAST('$up' AS DOUBLE) THEN 'accept_h1'
                      WHEN $llr <= CAST('$lo' AS DOUBLE) THEN 'accept_h0'
                      ELSE 'continue' END""").as("decision"))
  }

  /** The [[sprt]] constants for an oracle builder: (c1, c2, up, lo) as
    * shortest round-trip literals — the oracle splices the SAME strings. */
  private[graft] def sprtConstants(p0: Double, p1: Double, alpha: Double,
                                   beta: Double): (String, String, String, String) =
    (java.lang.Double.toString(math.log(p1 / p0)),
      java.lang.Double.toString(math.log((1 - p1) / (1 - p0))),
      java.lang.Double.toString(math.log((1 - beta) / alpha)),
      java.lang.Double.toString(math.log(beta / (1 - alpha))))

  /** POWER CURVE / inverse-MDE readout (r15 — the [[mdeReadout]]
    * composition the r14 verdict queued): where mdeReadout answers
    * "what effect could THIS traffic see", the power curve answers the
    * planning question "how many users per arm do I need to see a
    * TARGET effect" — the two-sample sizing identity (Cohen '88
    * lineage) solved for n at the same pinned 5%/80% quantile sum:
    *
    *   n_per_arm = ⌈2·(z_{α/2}+z_β)²·s² / δ²⌉,  δ = mean·effect_ppm/10⁶
    *
    * with s² the pooled two-arm sample variance off the SAME exact
    * DECIMAL moments as mdeReadout (one aggregation pass serves every
    * effect size — the grid is a broadcast-literal explode, not a
    * re-scan). The pinned literal 2.8015852181129688 and the
    * floor/ceil-at-the-end double arithmetic replay in DuckDB exactly
    * (the mdeReadout convention). Degenerate cells (arm n < 2, zero
    * variance, zero mean) read NULL. Output: group, `effect_ppm`,
    * `target_cents_milli` (the absolute effect the relative target
    * means on this traffic), `n_per_arm`. */
  def powerCurve(df: DataFrame, groupCol: String, armCol: String,
                 valueCol: String,
                 effectPpms: Seq[Long] = Seq(10000L, 20000L, 50000L, 100000L)): DataFrame = {
    require(effectPpms.nonEmpty && effectPpms.forall(e => e >= 1 && e <= 1000000),
      s"effectPpms must be in [1, 1e6], got $effectPpms")
    requireIntegralTime(df, valueCol, "powerCurve", what = "metric value")
    val dec = "decimal(38,0)"
    val arm = when(col(armCol).isin(0, 1), col(armCol).cast("int"))
      .otherwise(raise_error(concat(lit("powerCurve: arm must be 0/1, got "),
        col(armCol).cast("string"))))
    val m = df.select(col(groupCol).as("__g"), arm.as("__a"),
        col(valueCol).cast("long").cast(dec).as("__x"))
      .groupBy("__g", "__a")
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__ss"))
    val g = m.groupBy(col("__g").as(groupCol))
      .agg(
        sum(when(col("__a") === 0, col("__n"))).cast("long").as("__na"),
        sum(when(col("__a") === 1, col("__n"))).cast("long").as("__nb"),
        sum(when(col("__a") === 0, col("__s"))).as("__sa"),
        sum(when(col("__a") === 1, col("__s"))).as("__sb"),
        sum(when(col("__a") === 0, col("__ss"))).as("__ssa"),
        sum(when(col("__a") === 1, col("__ss"))).as("__ssb"))
    // the variance/mean doubles written ONCE as SQL text so the DuckDB
    // oracle can carry the identical expression tree (IEEE parity)
    val s2 = """(((CAST(__ssa AS DOUBLE)
                   - CAST(__sa AS DOUBLE) * CAST(__sa AS DOUBLE) / CAST(__na AS DOUBLE))
                 + (CAST(__ssb AS DOUBLE)
                   - CAST(__sb AS DOUBLE) * CAST(__sb AS DOUBLE) / CAST(__nb AS DOUBLE)))
                / CAST(__na + __nb - 2 AS DOUBLE))"""
    val mean = "((CAST(__sa AS DOUBLE) + CAST(__sb AS DOUBLE)) / CAST(__na + __nb AS DOUBLE))"
    val delta = s"($mean * CAST(effect_ppm AS DOUBLE) / 1000000.0)"
    val live = s"""__na >= 2 AND __nb >= 2 AND $s2 > 0 AND $mean > 0"""
    g.withColumn("effect_ppm", explode(array(effectPpms.map(lit): _*)))
      .withColumn("effect_ppm", col("effect_ppm").cast("long"))
      .select(col(groupCol), col("effect_ppm"),
        expr(s"CASE WHEN $live THEN CAST(floor(1000 * $delta) AS BIGINT) END")
          .as("target_cents_milli"),
        expr(s"""CASE WHEN $live THEN CAST(ceil(
            2 * CAST('2.8015852181129688' AS DOUBLE) * CAST('2.8015852181129688' AS DOUBLE)
              * $s2 / ($delta * $delta)) AS BIGINT) END""")
          .as("n_per_arm"))
  }

  /** BENJAMINI–HOCHBERG step-up FDR screen (Benjamini & Hochberg,
    * JRSS-B '95) — the multiple-testing governance the engine's whole
    * test family (welch/mann-whitney/kruskal/ks/z/anova …) was missing:
    * run one test per segment and a 5% per-test α silently inflates to
    * ~40% family-wise false discoveries at 10 segments; BH caps the
    * expected FALSE-DISCOVERY RATE at α while keeping far more power
    * than Bonferroni. Step-up rule on the ascending p-values: find the
    * LARGEST rank k with p_(k) ≤ k·α/m, reject ranks 1..k.
    *
    * EXACT integers end to end: p in ppm, the threshold comparison
    * cross-multiplied (`p_ppm·m ≤ rank·alpha_ppm` — no division, no
    * float α), the step-up cutoff as a running max over the descending
    * ranks. Ties on p break by the id column so the rank (and therefore
    * the SCREEN) is deterministic; rejection only depends on p via the
    * rank rule, so tied p-values always decide together (both ≤ k or
    * neither — the step-up k takes the largest qualifying rank).
    * NULL p (a test that disarmed — zero variance, empty cell) is
    * EXCLUDED from m and reported unrejected: a disarmed test is not
    * evidence and must not eat α from the live ones.
    *
    * Plan: the hypothesis frame is the OUTPUT of a test operator — one
    * row per segment, m rows total (tiny by construction: segments, not
    * corpus rows) — so the two rank windows run on a frame the
    * bounded-collect contract already covers; the corpus never sees
    * this operator. Output: `id, p_ppm, p_rank, m_tests,
    * bh_threshold_x, p_x_m, reject`. */
  def bhFdrScreen(df: DataFrame, idCol: String, pPpmCol: String,
                  alphaPpm: Long): DataFrame = {
    require(alphaPpm >= 1 && alphaPpm <= 1000000,
      s"alphaPpm must be in [1, 1e6], got $alphaPpm")
    requireIntegralTime(df, pPpmCol, "bhFdrScreen", what = "p-value (ppm)")
    val guarded = when(col(pPpmCol).isNull, lit(null))
      .when(col(pPpmCol) >= 0 && col(pPpmCol) <= 1000000, col(pPpmCol).cast("long"))
      .otherwise(raise_error(concat(
        lit("bhFdrScreen: p_ppm out of [0, 1e6] on id "), col(idCol).cast("string"))))
    val live = df.select(col(idCol).as("id"), guarded.as("p_ppm"))
      .where(col("p_ppm").isNotNull)
    val wRank = Window.orderBy(col("p_ppm"), col("id"))
    val wAll = Window.partitionBy()
    val wStep = Window.orderBy(col("p_rank").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val screened = live
      .withColumn("p_rank", row_number().over(wRank).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(wAll))
      .withColumn("bh_threshold_x", col("p_rank") * alphaPpm)
      .withColumn("p_x_m", col("p_ppm") * col("m_tests"))
      // step-up: reject iff SOME rank >= mine qualifies — a running
      // "any qualifying seen yet" max over the descending-rank scan
      .withColumn("reject",
        max(when(col("p_x_m") <= col("bh_threshold_x"), 1L).otherwise(0L))
          .over(wStep) === 1L)
    val disarmed = df.select(col(idCol).as("id"), guarded.as("p_ppm"))
      .where(col("p_ppm").isNull)
      .select(col("id"), col("p_ppm"),
        lit(null).cast("long").as("p_rank"),
        lit(null).cast("long").as("m_tests"),
        lit(null).cast("long").as("bh_threshold_x"),
        lit(null).cast("long").as("p_x_m"),
        lit(false).as("reject"))
    screened.select("id", "p_ppm", "p_rank", "m_tests", "bh_threshold_x",
      "p_x_m", "reject").union(disarmed)
  }
}
