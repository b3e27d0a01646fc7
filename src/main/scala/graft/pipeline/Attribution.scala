package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** MARKOV-CHAIN multi-touch attribution by REMOVAL EFFECT (Anderl,
  * Becker, von Wangenheim & Schumann, Int. J. Research in Marketing '16
  * — "Mapping the customer journey") — the data-driven completion of the
  * heuristic attribution rules the engine already carries (last-touch =
  * `events_attribution`'s as-of join; U-shaped =
  * `events_attribution_position`): instead of ASSUMING which touch
  * deserves credit, estimate a first-order Markov chain over observed
  * journeys and credit each channel by how much the chain's conversion
  * probability DROPS when that channel is knocked out.
  *
  * Semantics (each a documented, replayable choice):
  *   - A user's JOURNEY is their channel touches ordered by (ts, tie);
  *     one journey per user. START precedes the first touch; the last
  *     touch transitions to CONV if the user converted, else to NULL.
  *   - The chain is FIRST-ORDER with states {START} ∪ channels ∪
  *     {CONV, NULL}; transition probabilities are the observed
  *     count-ratios (maximum likelihood).
  *   - REMOVING channel r redirects every transition INTO r to NULL
  *     (the journey dies where it would have met the removed channel —
  *     the standard removal-effect convention).
  *   - Conversion probability = absorption mass on CONV starting at
  *     START, computed by `iters` value-iteration sweeps in ppm fixed
  *     point with per-term floor division ⌊n_st·p_t/n_s⌋ (exact
  *     integers, so the whole readout hash-gates; absorption converges
  *     geometrically, so a small horizon is exact to the ppm floor).
  *   - removal_ppm(r) = (p_full − p_removed(r))·10⁶ DIV p_full, and the
  *     attributable conversion value (conversions of users with ≥1
  *     touch) is split cents = Σcents·removal(r) DIV Σremovals.
  *
  * Scale shape: the data-heavy passes — the per-user journey window
  * (one `user`-partitioned exchange), the transition GROUP BY (≤
  * (k+3)² groups after map-side partial agg), the converter semi-join —
  * are fully distributed and skew-free (state pairs, not users, are the
  * final keys). The chain SOLVE is O(k²·iters) on a ≤ `maxChannels`
  * alphabet — driver-side by design under the engine's bounded-collect
  * contract (the BPE merge-table / kmeans-centroid pattern): a 64-state
  * matrix is ~4K counts regardless of whether the journeys behind it
  * are 60k rows or 100 TB. Channel cardinality above the cap fails
  * LOUDLY (it means the caller passed user-ids, not channels).
  */
object Attribution {

  /** Chain-state sentinels, exposed for the streaming maintenance twin
    * (channel ids must be ≥ 0 — guarded loudly below). */
  val START = -1L
  val CONV = -2L
  val ABSNULL = -3L

  /** The journey transition counts feeding [[markovRemovalEffects]]'s
    * solve, exposed standalone: `(src, dst, n)` over states {START = −1}
    * ∪ channels ∪ {CONV = −2, NULL = −3}. One user-partitioned window +
    * one (src, dst) GROUP BY — the whole distributed surface of the
    * attribution model. */
  def journeyTransitions(touches: DataFrame, userCol: String, tsCol: String,
                         tieCol: String, channelCol: String,
                         conversions: DataFrame): DataFrame = {
    // Integral journey keys in the BATCH path too: the streaming twin's
    // maintained state pins __u as LongType, so a string-keyed source
    // that silently worked here would fail only in [[mergeTouchBatch]] —
    // the documented "withTerminals equals journeyTransitions"
    // equivalence must hold or fail identically in both paths.
    Search.requireIntegralId(touches, userCol, "journeyTransitions",
      role = "journey user id")
    val touchedUsers = touches.select(col(userCol).as("__u")).distinct()
    val convUsers = conversions.select(col(userCol).as("__u")).distinct()
      .join(touchedUsers, Seq("__u"), "left_semi")
    val ordered = touches.select(
        col(userCol).as("__u"),
        col(tsCol).as("__ts"),
        col(tieCol).as("__tie"),
        col(channelCol).cast("long").as("__c"))
      .withColumn("__next",
        expr("lead(__c, 1) OVER (PARTITION BY __u ORDER BY __ts, __tie)"))
      .withColumn("__rn",
        expr("row_number() OVER (PARTITION BY __u ORDER BY __ts, __tie)"))
    val withEnd = ordered
      .join(convUsers.select(col("__u"), lit(true).as("__conv")), Seq("__u"), "left")
      .select(col("__u"), col("__c"), col("__rn"),
        coalesce(col("__next"),
          when(col("__conv"), lit(CONV)).otherwise(lit(ABSNULL))).as("__to"))
    withEnd.select(col("__c").as("src"), col("__to").as("dst"))
      .union(withEnd.where(col("__rn") === 1)
        .select(lit(START).as("src"), col("__c").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
  }

  /** Removal-effect attribution over touch journeys.
    *
    * @param touches     one row per channel touch
    * @param userCol     journey key
    * @param tsCol       touch order (any orderable type)
    * @param tieCol      deterministic tie-break within equal `tsCol`
    * @param channelCol  integral channel id ≥ 0 (loud on cardinality > maxChannels)
    * @param conversions one row per converting user: (userCol, centsCol);
    *                    users absent here end their journey in NULL
    * @param centsCol    integral conversion value in `conversions`
    * @param iters       value-iteration sweeps (ppm floor fixed point)
    * @return one row per channel: `channel, p_removed_ppm, removal_ppm,
    *         attributed_cents`, plus the baseline row channel = -1 with
    *         the full chain's p (removal/attributed 0 by construction)
    */
  def markovRemovalEffects(touches: DataFrame, userCol: String, tsCol: String,
                           tieCol: String, channelCol: String,
                           conversions: DataFrame, centsCol: String,
                           iters: Int = 16, maxChannels: Int = 64): DataFrame = {
    require(iters >= 1 && iters <= 64, s"iters must be in [1, 64], got $iters")
    require(maxChannels >= 1 && maxChannels <= 1024,
      s"maxChannels must be in [1, 1024], got $maxChannels")
    Search.requireIntegralId(touches, channelCol, "markovRemovalEffects",
      role = "channel id")
    val spark = touches.sparkSession

    // the attributable pot (conversions of users with >= 1 touch):
    // a semi-join and one tiny aggregate, fully distributed
    val touchedUsers = touches.select(col(userCol).as("__u")).distinct()
    val potCents: Long = conversions
      .join(touchedUsers, conversions(userCol) === col("__u"), "left_semi")
      .agg(coalesce(sum(col(centsCol).cast("long")), lit(0L)))
      .head.getLong(0)

    val trans = journeyTransitions(touches, userCol, tsCol, tieCol,
      channelCol, conversions)

    // bounded collect: the (k+3)^2-entry count matrix IS the model
    val rows = trans.collect()
    require(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      "markovRemovalEffects: NULL channel ids in the touch frame — " +
        "filter or impute them before attribution (a NULL touch is not a channel)")
    val badStates = rows.iterator.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .filter(s => s < 0 && s != START && s != CONV && s != ABSNULL).toSet
    require(badStates.isEmpty,
      s"markovRemovalEffects: negative channel ids ${badStates.mkString(", ")} " +
        "collide with the reserved START/CONV/NULL states — channel ids must be >= 0")
    val channels = rows.iterator.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
      .filter(_ >= 0).toArray.distinct.sorted
    require(channels.length <= maxChannels,
      s"markovRemovalEffects: ${channels.length} distinct channels exceed " +
        s"maxChannels=$maxChannels — channel ids look like entity ids, not channels")
    val counts: Map[(Long, Long), Long] =
      rows.iterator.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // exact ppm value iteration for one removal variant (BigInt: counts
    // can be 100TB-sized; products n_st * 1e6 must not overflow)
    def absorbPpm(removed: Long): BigInt = {
      val redirected = counts.toSeq
        .map { case ((s, d), n) => ((s, if (d == removed) ABSNULL else d), n) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      val bySrc = redirected.groupBy(_._1._1)
        .map { case (s, m) => s -> (m.toSeq, m.valuesIterator.map(BigInt(_)).sum) }
      val states = (channels.toSeq ++ Seq(START, CONV, ABSNULL)).distinct
      var p: Map[Long, BigInt] =
        states.map(s => s -> (if (s == CONV) BigInt(1000000) else BigInt(0))).toMap
      var i = 0
      while (i < iters) {
        p = states.map { s =>
          s -> (bySrc.get(s) match {
            case Some((outs, tot)) if s != CONV && s != ABSNULL =>
              outs.iterator.map { case ((_, d), n) => BigInt(n) * p(d) / tot }.sum
            case _ => p(s) // absorbing (and touch-less) states hold
          })
        }.toMap
        i += 1
      }
      p.getOrElse(START, BigInt(0))
    }

    val pFull = absorbPpm(Long.MinValue) // sentinel: removes nothing
    val removals = channels.map(c => c -> (pFull - absorbPpm(c))).toMap
    val totRemoval = removals.valuesIterator.sum

    val out = Row(-1L, pFull.toLong, 0L, 0L) +: channels.toSeq.map { c =>
      val rem = removals(c)
      val remPpm = if (pFull > 0) (rem * 1000000 / pFull).toLong else 0L
      val cents =
        if (totRemoval > 0) (BigInt(potCents) * rem / totRemoval).toLong else 0L
      Row(c, (pFull - rem).toLong, remPpm, cents)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("channel", LongType, nullable = false),
        StructField("p_removed_ppm", LongType, nullable = false),
        StructField("removal_ppm", LongType, nullable = false),
        StructField("attributed_cents", LongType, nullable = false))))
  }

  // ---- streaming maintenance (the foreachBatch lifecycle) -------------
  //
  // Journeys are OPEN-ENDED under a stream: a user's next touch may be in
  // a later micro-batch, so the per-batch lead() window alone would break
  // every cross-batch edge. The maintained state is therefore
  //   counts — the START + interior transition monoid (src, dst, n)
  //   last   — one boundary row per user (__u, __lc, __lts, __ltie):
  //            the user's latest touch, linking it to the next batch's
  //            first touch
  // Terminal CONV/NULL edges are NEVER stored — a journey's ending isn't
  // known until read time; [[withTerminals]] derives them from `last` and
  // the current converter set. Micro-batches must be time-ordered per
  // user (the scd2Merge/append-log contract — the source IS a log).

  /** Empty maintenance state for [[mergeTouchBatch]]. */
  def emptyTouchState(spark: org.apache.spark.sql.SparkSession): (DataFrame, DataFrame) = {
    val counts = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("src", LongType, nullable = false),
        StructField("dst", LongType, nullable = false),
        StructField("n", LongType, nullable = false))))
    val last = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField("__u", LongType, nullable = false),
        StructField("__lc", LongType, nullable = false))))
    (counts, last)
  }

  /** Folds one micro-batch of touches into the maintained (counts, last)
    * state: interior pairs from the batch's own windows, one BRIDGE edge
    * per user continuing from a previous batch (stored last channel →
    * batch first channel), START edges for users seen first here, and the
    * boundary rows advanced to the batch's last touch. History is never
    * rescanned — the batch pays one window + two user-keyed joins against
    * the user-sized boundary frame; the counts monoid is ≤ (k+3)² rows. */
  def mergeTouchBatch(counts: DataFrame, last: DataFrame, batch: DataFrame,
                      userCol: String, tsCol: String, tieCol: String,
                      channelCol: String): (DataFrame, DataFrame) = {
    // same contract as [[journeyTransitions]] — loud here, not an ANSI
    // cast error three operators later
    Search.requireIntegralId(batch, userCol, "mergeTouchBatch",
      role = "journey user id")
    val ordered = batch.select(
        col(userCol).cast("long").as("__u"),
        col(tsCol).as("__ts"),
        col(tieCol).as("__tie"),
        col(channelCol).cast("long").as("__c"))
      .withColumn("__next",
        expr("lead(__c, 1) OVER (PARTITION BY __u ORDER BY __ts, __tie)"))
      .withColumn("__rn",
        expr("row_number() OVER (PARTITION BY __u ORDER BY __ts, __tie)"))
      .withColumn("__rnd",
        expr("row_number() OVER (PARTITION BY __u ORDER BY __ts DESC, __tie DESC)"))
    val interior = ordered.where(col("__next").isNotNull)
      .select(col("__c").as("src"), col("__next").as("dst"))
    val firsts = ordered.where(col("__rn") === 1)
      .select(col("__u"), col("__c"))
    // users continuing from a prior batch bridge last → first; fresh
    // users open with START → first
    val opener = firsts.join(last.withColumnRenamed("__lc", "__prevc"), Seq("__u"), "left")
      .select(coalesce(col("__prevc"), lit(START)).as("src"), col("__c").as("dst"))
    val batchCounts = interior.union(opener)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    val newCounts = counts.union(batchCounts)
      .groupBy("src", "dst").agg(sum(col("n")).as("n"))
    val lasts = ordered.where(col("__rnd") === 1).select(col("__u"), col("__c").as("__lc"))
    val newLast = last.join(lasts, Seq("__u"), "left_anti").union(lasts)
    (newCounts, newLast)
  }

  /** Read-time completion of the maintained state: the terminal edge of
    * every open journey (stored last channel → CONV if the user is in
    * `conversions`, else → NULL) unioned onto the counts monoid. The
    * result equals [[journeyTransitions]] over every touch folded so
    * far — spec-pinned, including journeys split across batches. */
  def withTerminals(counts: DataFrame, last: DataFrame,
                    conversions: DataFrame, userCol: String): DataFrame = {
    Search.requireIntegralId(conversions, userCol, "withTerminals",
      role = "journey user id")
    val convU = conversions.select(col(userCol).cast("long").as("__u")).distinct()
    val terminals = last.join(convU.withColumn("__conv", lit(true)), Seq("__u"), "left")
      .select(col("__lc").as("src"),
        when(col("__conv"), lit(CONV)).otherwise(lit(ABSNULL)).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
    counts.union(terminals).groupBy("src", "dst").agg(sum(col("n")).as("n"))
  }
}
