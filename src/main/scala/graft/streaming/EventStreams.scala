package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the events stream.
  *
  * The reference engine is batch-only (Hive UDTF); streams are the
  * Spark-first extension: the same jq/relational transforms run over
  * `readStream` unchanged, plus watermarked windows and custom state.
  *
  * Scale notes: file-source streaming partitions by file; the windowed agg
  * shuffles once per trigger on (window, event_type) with partial
  * aggregation map-side. Sessionization keys state by user_id — state size
  * is O(active users), not O(events).
  */
object EventStreams {

  /** Legacy events.parquet physical schema (ts stored as TIMESTAMP(NANOS)
    * → read as long via spark.sql.legacy.parquet.nanosAsLong). Newer
    * generators write ts as TIMESTAMP(MICROS); [[readEvents]] peeks the
    * actual file schema instead of assuming this one. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** events.parquet has shipped `ts` under two physical encodings:
    * TIMESTAMP(NANOS) — which Spark can only read as INT64 nanos via
    * spark.sql.legacy.parquet.nanosAsLong — and TIMESTAMP(MICROS), which
    * reads as TIMESTAMP_NTZ. Normalize either to session-tz TimestampType
    * (every session here pins UTC, so the NTZ cast is a type change, not a
    * wall-clock shift) so all consumers see ONE schema regardless of which
    * generator wrote the file. */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case _        => df.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Streaming read of an events directory; rebuilds a proper timestamp.
    * The stream schema is peeked from the files' parquet footers (a batch
    * metadata read, no data scan) — a pinned literal schema would break
    * whenever the ts physical encoding flips (see [[normalizeEventTs]]).
    * An EMPTY directory at start (producer not yet writing — the normal
    * streaming deployment order) has no footers to peek, so the legacy
    * [[rawSchema]] applies until a restart; a peek failure must not keep
    * the stream from starting. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => rawSchema }
    normalizeEventTs(spark.readStream.schema(fileSchema).parquet(dir))
  }

  /** Watermarked tumbling-window aggregation (same grouping as the batch
    * `stream_window_agg` query in SparkEntry — the oracle for this logic). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count("*").as("n"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("value_cents"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("value_cents"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int)
  case class UserSession(user_id: Long, session_start: Timestamp,
                         session_end: Timestamp, n_events: Int)

  /** Stateful sessionization: gap-close semantics via
    * flatMapGroupsWithState. Emits a session when a gap > `gapMinutes` is
    * observed or on state timeout.
    *
    * Timeout handling is branched per mode — the GroupState API is not
    * symmetric: ProcessingTimeTimeout takes a wall-clock DURATION
    * (`setTimeoutDuration`), while EventTimeTimeout takes an absolute
    * event-time TIMESTAMP (`setTimeoutTimestamp`) and throws
    * UnsupportedOperationException if given a duration. With
    * EventTimeTimeout the session times out `gap` past its last event in
    * event time (the natural semantics; requires a watermark on `events`);
    * with ProcessingTimeTimeout the gap is reused as a wall-clock idle
    * bound — an approximation, flagged here rather than hidden. */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMinutes: Int,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[UserSession] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, rows: Iterator[Event],
               state: GroupState[SessionState]): Iterator[UserSession] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var out = List.empty[UserSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= gapMs =>
            cur = Some(s.copy(last = t, n = s.n + 1))
          case Some(s) =>
            out ::= UserSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach(s => out ::= UserSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
            state.setTimeoutDuration(gapMs)
          else if (timeout == GroupStateTimeout.EventTimeTimeout)
            state.setTimeoutTimestamp(s.last + gapMs)
        }
      }
      out.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update)
  }

  /** Batch-equivalent sessionization via lag + cumulative-sum windows —
    * the verifiable twin of `sessionize` (identical session boundaries on
    * a closed dataset). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMs = gapMinutes * 60000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          (unix_millis(col("ts")) - unix_millis(col("prev_ts"))) > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count("*").cast("long").as("n_events"))
  }
}
