package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators (SURVEY.md §2B "Streaming"). The
  * batch-equivalent queries live in [[graft.ops.StreamingBatch]] and are
  * oracle-checked; these are the genuinely stream-only semantics —
  * watermarks, late-data drop, stream dedup, session windows, arbitrary
  * state — verified with MemoryStream in ScalaTest.
  *
  * Every transform takes and returns a (possibly streaming) Dataset, so
  * the same code runs under `readStream` in production and under a
  * MemoryStream in tests. */
object StreamOps {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class SessionOut(
      user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  /** Tumbling 1h window counts with a 1h watermark: late events beyond
    * the watermark are dropped; state is bounded by (watermark window ×
    * groups). */
  def tumblingCounts(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_val"))

  /** Built-in session windows (10-minute gap) under a watermark — the
    * streaming twin of the gap-and-island batch query. */
  def sessionWindows(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"))

  /** Exactly-once-ish stream dedup: duplicates of event_id arriving
    * within the watermark are dropped with bounded state. */
  def dedupWithinWatermark(events: Dataset[Event]): Dataset[Event] =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Arbitrary stateful sessionization via flatMapGroupsWithState:
    * custom 10-minute-gap sessions with an explicit event-time timeout —
    * the state shape `mapGroupsWithState` family supports that
    * session_window cannot (e.g. emitting per-session aggregates with
    * custom close rules). */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMinutes: Int = 10): Dataset[SessionOut] = {
    import spark.implicits._
    // state: (nEvents, startUs, endUs)
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var out = List.empty[SessionOut]
          var cur = state.getOption
          if (state.hasTimedOut) {
            cur.foreach { case (n, s, e) => out ::= SessionOut(userId, n, s, e) }
            state.remove()
            cur = None
          }
          sorted.foreach { ev =>
            val us = ev.ts.getTime * 1000
            cur match {
              case Some((n, s, e)) if us - e <= gapUs => cur = Some((n + 1, s, math.max(e, us)))
              case Some((n, s, e)) =>
                out ::= SessionOut(userId, n, s, e)
                cur = Some((1L, us, us))
              case None => cur = Some((1L, us, us))
            }
          }
          cur.foreach { st =>
            state.update(st)
            state.setTimeoutTimestamp(st._3 / 1000 + gapMinutes.toLong * 60 * 1000)
          }
          out.reverseIterator
      }
  }

  final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Spark 4 transformWithState processor: per-user running totals in a
    * ValueState — the successor API to mapGroupsWithState (explicit
    * state variables, timers, TTL; requires the RocksDB state store). */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserTotals] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoder, Encoders}

    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: TimeMode): Unit = {
      val enc: Encoder[(Long, Double)] =
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
      totals = getHandle.getValueState[(Long, Double)]("totals", enc, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserTotals] = {
      var (n, v) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; v += e.value }
      totals.update((n, v))
      Iterator.single(UserTotals(key, n, math.rint(v * 100) / 100))
    }
  }

  /** Running per-user totals via transformWithState (Update mode). */
  def runningTotals(spark: SparkSession, events: Dataset[Event]): Dataset[UserTotals] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class SessionClose(user_id: Long, n_events: Long, closed_at_ms: Long)

  /** transformWithState with EVENT-TIME TIMERS: counts events per user
    * and emits one SessionClose when the watermark passes
    * last-event-time + gap — idle-session detection with explicit timer
    * re-arming. This is the processor shape the older
    * mapGroupsWithState timeout API cannot express: multiple typed
    * state variables plus first-class timers that fire independently of
    * input arriving for the key. */
  class IdleCloseProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionClose] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var counts: ValueState[Long] = _
    @transient private var armed: ValueState[Long] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: TimeMode): Unit = {
      counts = getHandle.getValueState[Long]("counts", Encoders.scalaLong, TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionClose] = {
      var n = if (counts.exists()) counts.get() else 0L
      var maxTs = 0L
      rows.foreach { e => n += 1; maxTs = math.max(maxTs, e.ts.getTime) }
      counts.update(n)
      // re-arm: one live timer per key, at last-event + gap
      val fireAt = maxTs + gapMs
      if (armed.exists() && armed.get() < fireAt) {
        getHandle.deleteTimer(armed.get())
        getHandle.registerTimer(fireAt)
        armed.update(fireAt)
      } else if (!armed.exists()) {
        getHandle.registerTimer(fireAt)
        armed.update(fireAt)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionClose] = {
      val n = if (counts.exists()) counts.get() else 0L
      counts.clear()
      armed.clear()
      Iterator.single(SessionClose(key, n, expiredTimerInfo.getExpiryTimeInMs()))
    }
  }

  /** Idle-session closes via event-time timers (Append mode; requires
    * the RocksDB state store like all transformWithState operators). */
  def idleSessionCloses(
      spark: SparkSession, events: Dataset[Event], gapMinutes: Int = 10): Dataset[SessionClose] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(
        new IdleCloseProcessor(gapMinutes.toLong * 60 * 1000),
        TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Stream-stream inner join: purchases enriched with the user's
    * clicks within the preceding 30 minutes. Both sides watermarked and
    * the join range-bounded — the two conditions Spark needs to bound
    * state retention on BOTH sides at 100 TB/day rates. */
  def purchaseClickJoin(spark: SparkSession, events: Dataset[Event]): DataFrame = {
    import org.apache.spark.sql.functions._
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"))
  }

  /** Incremental file ingestion: tail a landing directory as a stream —
    * new files are discovered per trigger (bounded by
    * maxFilesPerTrigger for backpressure) and processed exactly once
    * per checkpoint. This is the continuous form of the reference's
    * batch export loop: drop files in, they flow through. */
  def fileIngest(
      spark: SparkSession,
      srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)

  /** Stream-static enrichment join: each micro-batch joins against the
    * (broadcast) static dimension — stateless on the stream side, no
    * watermark needed. NOTE: a plain file-backed DataFrame snapshots
    * its file list at creation, so dim updates are NOT picked up
    * mid-stream; for a refreshing dimension re-read it per batch
    * inside foreachBatch (or use a table format with refreshable
    * snapshots). The standard "enrich events with reference data"
    * shape. */
  def enrichWithDim(events: Dataset[Event], dim: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    events.toDF().join(broadcast(dim), Seq("user_id"), "left")
  }

  /** Stream-stream LEFT OUTER join, same keys/range/watermarks as
    * [[purchaseClickJoin]]: purchases with no click in the preceding
    * 30 minutes still emit (null click columns) — but only once the
    * watermark proves no matching click can arrive, so correctness of
    * the null rows is watermark-gated, not timing-dependent. */
  def purchaseClickLeftJoin(spark: SparkSession, events: Dataset[Event]): DataFrame = {
    import org.apache.spark.sql.functions._
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
  }

  /** foreachBatch sink: per-micro-batch custom logic (upserts, multi-
    * sink fan-out — whatever the format API can't express). The handler
    * receives a BATCH DataFrame, so everything in the engine applies. */
  def foreachBatchSink(df: DataFrame, checkpointDir: String)(
      handler: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit) =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(handler)
      .outputMode("append")
      .start()

  /** Streaming parquet sink with checkpointing (the A12 sink in stream
    * form). Returns the started query; caller stops it. */
  def parquetSink(df: DataFrame, outDir: String, checkpointDir: String) =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
