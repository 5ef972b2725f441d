package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The crawl loop itself is deliberately NOT streaming (SURVEY.md §1.2:
  * the wave feedback edge needs a driver loop), but the engine exposes
  * streaming transforms for continuous ingest: watermarked tumbling
  * windows and mapGroupsWithState sessionization. Tested against
  * MemoryStream in StreamingSpec; the same code runs on a Kafka/file
  * source in production.
  */
object EventStream {

  /** Watermarked tumbling-window counts per event type: late data
    * beyond 10 minutes is dropped, state is bounded by the watermark. */
  def windowedCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes").as("win"), $"event_type")
      // integer cents (floor(value*100), the q_running_total
      // convention): a double sum accumulates in micro-batch arrival
      // order on the stream side but partition order in batch, so the
      // stream==batch equality would flake in the last ulp
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * 100).cast("bigint")).as("value_cents"))
      .select($"win.start".as("win_start"), $"event_type", $"n", $"value_cents")
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(nEvents: Long, totalValue: Double, lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long, total_value: Double,
      closed: Boolean)

  /** 30-minute inactivity gap, in ms — shared by the streaming kernels
    * and the batch sessionization so the three formulations agree. */
  val SessionGapMs: Long = 30L * 60 * 1000

  /** Per-user running sessions via mapGroupsWithState — the LIVE view
    * (current session so far per user). Closed sessions' own stats are
    * emitted by [[sessionizeClosed]]; this view only flags that a gap
    * closed one. The state tracks a 30-minute inactivity gap in EVENT
    * time: a new event past the gap closes the old session and starts
    * a fresh one (emitted with closed=true). NoTimeout is deliberate —
    * processing-time timeouts keep a local query permanently busy (the
    * engine schedules empty batches to service them), which breaks
    * bounded test runs; event-time gap handling covers the semantics
    * deterministically. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = SessionGapMs
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        case (userId, rows, state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          var closedPrev = false
          sorted.foreach { e =>
            if (s.lastTs != Long.MinValue && e.ts.getTime - s.lastTs > gapMs) {
              closedPrev = true // previous session ended by the gap
              s = SessionState(0L, 0.0, Long.MinValue)
            }
            s = SessionState(s.nEvents + 1, s.totalValue + e.value,
              math.max(s.lastTs, e.ts.getTime))
          }
          state.update(s)
          SessionOut(userId, s.nEvents, s.totalValue, closed = closedPrev)
      }
  }

  final case class SessionAgg(startTs: Long, lastTs: Long, nEvents: Long, cents: Long)
  final case class ClosedSession(user_id: Long, start_ts: Timestamp, end_ts: Timestamp,
      n_events: Long, value_cents: Long)

  /** The ONE gap-fold both closed-session operators share (a second
    * hand copy of this loop is exactly how stream variants drift):
    * absorbs a batch of events into the running session in (ts,
    * event_id) order, emitting a ClosedSession whenever the gap
    * binds. Returns (emitted, new state). */
  private def foldSessions(userId: Long, events: Seq[Event],
      init: Option[SessionAgg]): (Vector[ClosedSession], Option[SessionAgg]) = {
    val sorted = events.sortBy(e => (e.ts.getTime, e.event_id))
    val out = Vector.newBuilder[ClosedSession]
    var s = init.orNull
    sorted.foreach { e =>
      val tms = e.ts.getTime
      val cents = math.floor(e.value * 100).toLong
      if (s == null) s = SessionAgg(tms, tms, 1L, cents)
      else if (tms - s.lastTs > SessionGapMs) {
        out += ClosedSession(userId, new Timestamp(s.startTs),
          new Timestamp(s.lastTs), s.nEvents, s.cents)
        s = SessionAgg(tms, tms, 1L, cents)
      } else s = SessionAgg(s.startTs, math.max(s.lastTs, tms),
        s.nEvents + 1, s.cents + cents)
    }
    (out.result(), Option(s))
  }

  /** REAL sessionization: one output row per CLOSED session, carrying
    * that session's own stats — flatMapGroupsWithState in Append mode
    * (mapGroupsWithState could only emit the running accumulator, so a
    * gap reset overwrote the closed session's stats before any
    * downstream consumer saw them). A session closes when a later
    * event of the same user arrives past the 30-minute event-time gap;
    * with NoTimeout (see [[sessionize]] for why) the trailing session
    * per user stays open in state — [[sessionizeClosedWithTimeout]]
    * adds the watermark drain. Value is accumulated in INTEGER cents
    * (floor(value*100), the q_running_total convention) so stream,
    * batch, and DuckDB formulations agree bit-for-bit.
    *
    * CONTRACT: equality with [[sessionizeBatchDf]] holds for input
    * that is in event-time order ACROSS micro-batches (within a batch
    * any order is fine — the fold sorts). With no watermark there is
    * no lateness definition, so a cross-batch out-of-order event is
    * absorbed into the CURRENT session like any state-machine
    * sessionizer; the watermarked variant drops such events instead. */
  def sessionizeClosed(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (userId, rows, state: GroupState[SessionAgg]) =>
          val (out, s) = foldSessions(userId, rows.toSeq, state.getOption)
          s.foreach(state.update)
          out.iterator
      }
  }

  /** [[sessionizeClosed]] plus WATERMARK DRAINING: with an event-time
    * timeout armed at lastTs + gap, a session whose user simply stops
    * producing events still emits once the watermark passes its gap —
    * no session is held hostage by a quiet key (the NoTimeout variant
    * keeps trailing sessions in state forever, which is fine for
    * bounded tests but not for production). EventTimeTimeout is
    * watermark-driven, so unlike processing-time timeouts it stays
    * deterministic and does not busy-spin bounded local queries. */
  def sessionizeClosedWithTimeout(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, new Timestamp(s.startTs),
              new Timestamp(s.lastTs), s.nEvents, s.cents))
          } else {
            // the watermark DEFINES lateness here: an event older than
            // it is dropped (its session may already be emitted —
            // absorbing it would mutate the current session's stats
            // and silently diverge from the batch formulation)
            val wm = state.getCurrentWatermarkMs()
            val live = rows.toSeq.filter(_.ts.getTime >= wm)
            val (out, s) = foldSessions(userId, live, state.getOption)
            s.foreach { agg =>
              state.update(agg)
              // the timeout timestamp may not lag the current
              // watermark (Spark rejects it); a session already past
              // its gap when its data arrives times out on the next
              // watermark tick
              state.setTimeoutTimestamp(math.max(agg.lastTs + SessionGapMs, wm + 1))
            }
            out.iterator
          }
      }
  }

  /** Batch sessionization over an events DataFrame — the gaps-and-
    * islands formulation (lag → new-session flag → running session id
    * → per-session agg), bit-equal to [[sessionizeClosed]] on the same
    * rows. Two key shuffles total: the window partitions and the final
    * groupBy ride the SAME user_id hash partitioning, so at 100 TB
    * this is one exchange on user_id plus map-side partials. */
  def sessionizeBatchDf(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // events tables carry TIMESTAMP_NTZ; the UTC session tz makes the
    // TIMESTAMP cast value-preserving, so tms == DuckDB's epoch_ms(ts)
    val tms = unix_millis($"ts".cast("timestamp"))
    events
      .select($"user_id", $"event_id", $"ts",
        floor($"value" * 100).cast("bigint").as("cents"))
      .withColumn("prev_ms", lag(tms, 1).over(w))
      .withColumn("new_sess",
        when($"prev_ms".isNull || tms - $"prev_ms" > SessionGapMs, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum($"new_sess").over(cum))
      .groupBy($"user_id", $"sess_id")
      .agg(min($"ts").as("start_ts"), max($"ts").as("end_ts"),
        count(lit(1)).as("n_events"), sum($"cents").as("value_cents"))
  }

  /** Driver-contract entry over the events table. */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame =
    sessionizeBatchDf(spark.read.parquet(s"$dir/events.parquet"))

  val oracle: Map[String, String] = Map(
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, epoch_ms(ts) AS tms,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(tms) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |    OR tms - lag(tms) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |s AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
        |  FROM m)
        |SELECT user_id, sess_id, min(ts) AS start_ts, max(ts) AS end_ts,
        |  count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS value_cents
        |FROM s GROUP BY 1, 2""".stripMargin
  )

  /** Batch-equivalent of windowedCounts, for oracle comparison (the
    * streaming query over a bounded input must agree with the batch
    * aggregation over the same rows). */
  def windowedCountsBatch(events: DataFrame): DataFrame = windowedCounts(events)

  /** Stream-static enrichment: broadcast dimension join inside a
    * stream — the budget/robots-table shape under continuous ingest.
    * The static side is re-resolved per micro-batch, so a slowly-
    * maintained dimension table (user tiers here) stays current without
    * restarting the query; the join itself is stateless (no watermark
    * needed), the scale path for 100 TB/day enrichment. */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.join(broadcast(userDim), Seq("user_id"), "left")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"tier")
  }

  /** Stream-stream interval join with watermarks: view -> purchase
    * conversions per user within 30 event-time minutes. Both sides
    * carry watermarks and the join condition bounds the time range, so
    * each side's buffered state is evicted once the other side's
    * watermark passes the range — bounded memory on unbounded ingest
    * (an unbounded-range stream-stream join would hoard state forever).
    */
  def conversionJoin(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val views = events.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"ts".as("view_ts"), $"event_id".as("view_id"))
      .withWatermark("view_ts", "10 minutes")
    val buys = events.filter($"event_type" === "purchase")
      .select($"user_id".as("b_user"), $"ts".as("buy_ts"), $"event_id".as("buy_id"))
      .withWatermark("buy_ts", "10 minutes")
    views.join(buys,
        $"v_user" === $"b_user" &&
          $"buy_ts" >= $"view_ts" &&
          $"buy_ts" <= $"view_ts" + expr("INTERVAL 30 MINUTES"))
      .select($"v_user".as("user_id"), $"view_id", $"buy_id", $"view_ts", $"buy_ts")
  }

  /** Streaming exact dedup on event_id with watermark-bounded state —
    * the continuous-ingest form of the pipeline's exact dedup (and of
    * the crawler's URL-seen check): duplicates arriving within the
    * watermark horizon are dropped, state for ids older than the
    * watermark is evicted, so memory is bounded by the horizon rather
    * than the stream's lifetime (the only shape that survives an
    * unbounded 100 TB ingest). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
}
