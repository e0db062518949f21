package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface of the engine.
  *
  * The reference has no streaming (SURVEY.md §2.10 — batch ForkJoin crawl
  * with a stop flag); these jobs are the engine's forward-looking stream
  * path for a continuously-arriving page/event feed: file-source streams,
  * watermarked windowed aggregation, and custom session state via
  * `flatMapGroupsWithState` — the three Structured Streaming primitives a
  * production ingest of a Common-Crawl-style feed needs. Batch parity for
  * the windowed agg is oracle-checked by q28_hourly_window (DocOps).
  */
object EventsStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over the events table: the source path must be a
    * DIRECTORY (Structured Streaming watches it for new files), so point
    * at the testdata dir and glob-filter the events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)

  /** Watermarked tumbling-hour aggregation — the streaming form of
    * DocOps.hourlyWindow (same groups once the watermark closes windows). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("v"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("v"))

  final case class SessionUpdate(user_id: Long, n_events: Long, sum_value: Double, closed: Boolean)
  final case class SessState(n: Long, sum: Double, lastTsMs: Long)

  /** Custom session state: `gapMinutes`-gap sessions per user, emitted
    * when the gap closes — flatMapGroupsWithState form of
    * DocOps.sessionize.
    *
    * With `idleTimeout = true` (the production default) the state uses
    * EventTimeTimeout against a `watermarkDelay` watermark: a user's
    * final session is EMITTED AND ITS STATE REMOVED once the watermark
    * passes lastEvent + gap — on a real endless feed state never leaks.
    * `idleTimeout = false` is the bounded-replay parity mode (the q34
    * oracle defines exactly the sessions closed by a later event, so the
    * parity query must not add timeout-closed ones). */
  def sessionize(spark: SparkSession, events: DataFrame,
      gapMinutes: Int = 30,
      idleTimeout: Boolean = true,
      watermarkDelay: String = "2 hours"): Dataset[SessionUpdate] = {
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60L * 1000L

    // the watermarked `ts` column must survive INTO the grouped input
    // (a typed map would SerializeFromObject it away and fail the
    // event-time-timeout analysis check), so rows carry it as _4 unused
    def foldEvents(user: Long, rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
        state: GroupState[SessState]): Iterator[SessionUpdate] = {
      // within a micro-batch rows are not ordered; sort locally
      val sorted = rows.toSeq.sortBy(_._2)
      var st = state.getOption.getOrElse(SessState(0L, 0.0, Long.MinValue))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
      for ((_, tsMs, v, _) <- sorted) {
        if (st.n > 0L && tsMs - st.lastTsMs > gapMs) {
          out += SessionUpdate(user, st.n, st.sum, closed = true)
          st = SessState(0L, 0.0, Long.MinValue)
        }
        // max, not assignment: a late-but-within-watermark event from a
        // LATER micro-batch must not regress the session's time horizon
        // (a regressed lastTsMs splits the session spuriously on the
        // next on-time event and fires the idle timeout early); in the
        // sorted batch-parity path max is the identity
        st = SessState(st.n + 1, st.sum + v, math.max(st.lastTsMs, tsMs))
      }
      state.update(st)
      if (idleTimeout && st.n > 0L) {
        // fire when the watermark passes the session's gap horizon; must
        // be strictly beyond the current watermark (late-data guard)
        state.setTimeoutTimestamp(
          math.max(st.lastTsMs + gapMs, state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }

    val src = if (idleTimeout) events.withWatermark("ts", watermarkDelay) else events
    val timeoutConf =
      if (idleTimeout) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    src
      .selectExpr("user_id", "cast(ts as long) * 1000 as ts_ms", "value", "ts")
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (user: Long, rows: Iterator[(Long, Long, Double, java.sql.Timestamp)],
            state: GroupState[SessState]) => {
          if (state.hasTimedOut) {
            // idle session closed by watermark passage — emit and free state
            val st = state.get
            state.remove()
            Iterator.single(SessionUpdate(user, st.n, st.sum, closed = true))
          } else foldEvents(user, rows, state)
        })
  }

  /** Drive a stream from existing parquet synchronously into a memory
    * sink (local smoke path; production would be a real sink + trigger). */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    q.processAllAvailable()
    q
  }
}
