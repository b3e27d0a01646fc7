package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-bucket resampling over an event stream: the
  * per-(key, day) rollup, the gap-filled daily spine (missing days
  * materialize as explicit zero rows — the shape every downstream
  * rolling/forecast/monitoring computation needs), and rolling-window
  * metrics over the filled spine.
  *
  * EXACTNESS: event values are fixed to cents BEFORE summing
  * (`floor(v·100 + 0.5)` — the engine-portable half-up rule used across
  * the relational family), so sums are integer-exact and oracle-gated;
  * day bucketing truncates the session-UTC timestamp to a calendar date,
  * identical to a SQL `CAST(ts AS DATE)`.
  *
  * SCALE: the rollup is one groupBy (shuffled by (key, day)); the spine
  * is a per-key min/max aggregate exploded through `sequence()` — output-
  * proportional, no driver loop, no cross join against a global calendar
  * (a key active for a week costs 7 rows regardless of corpus span). The
  * gap-fill join hits two frames both hash-partitioned on (key, day).
  * Rolling metrics ride a window PARTITIONED BY KEY — bounded per-key
  * state, and the gap-filled spine makes `ROWS BETWEEN n PRECEDING`
  * exactly an n+1-day calendar window (no RANGE frame needed). */
object TimeSeries {

  /** Per-(key, day) rollup with the gaps filled: every calendar day in
    * [min(day), max(day)] OF EACH KEY gets a row — `n_events` and
    * `value_cents` are 0 on days the key was silent. Output:
    * `keyCol, day, n_events, value_cents`. */
  def resampleGapFill(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    val rollup = events.groupBy(col(keyCol), day.as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col(valueCol) * 100 + 0.5).cast("long")).as("value_cents"))
    val spine = events.groupBy(col(keyCol))
      .agg(min(day).as("__d0"), max(day).as("__d1"))
      .select(col(keyCol), explode(sequence(col("__d0"), col("__d1"))).as("day"))
    spine.join(rollup, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"))
  }

  /** Trailing `nDays`-day rolling totals over the gap-filled spine:
    * because [[resampleGapFill]] materializes every day, a ROWS frame of
    * `nDays - 1` preceding rows IS the calendar window — no RANGE frame,
    * no per-row interval arithmetic. Output adds `roll_events,
    * roll_cents`. The window partitions by key: per-key bounded state,
    * no global sort. */
  def rollingDaily(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, nDays: Int): DataFrame = {
    require(nDays >= 1, s"nDays must be >= 1, got $nDays")
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(-(nDays - 1), Window.currentRow)
    resampleGapFill(events, keyCol, tsCol, valueCol)
      .withColumn("roll_events", sum(col("n_events")).over(w))
      .withColumn("roll_cents", sum(col("value_cents")).over(w))
  }
}
