package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class StreamingSpec extends SparkTestBase {

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("watermarked tumbling window over MemoryStream matches batch aggregation") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(
      (1L, ts(0), 10L, "click", 1.0),
      (2L, ts(1), 11L, "click", 2.0),
      (3L, ts(6), 10L, "view", 3.0),
      (4L, ts(7), 12L, "click", 4.0),
      (5L, ts(12), 10L, "view", 5.0))

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.windowedCounts(streamDf)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    // advance the watermark far enough to close all windows
    mem.addData((99L, ts(120), 99L, "tick", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_counts")
      .filter($"event_type" =!= "tick")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val batch = EventStream.windowedCountsBatch(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.nonEmpty)
  }

  test("streaming dedup drops within-watermark duplicates, state bounded") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.dedupStream(streamDf)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    // duplicates within one batch and across batches (same event_id)
    mem.addData((1L, ts(0), 10L, "click", 1.0), (1L, ts(0), 10L, "click", 1.0),
      (2L, ts(1), 11L, "view", 2.0))
    q.processAllAvailable()
    mem.addData((2L, ts(2), 11L, "view", 2.0), (3L, ts(3), 12L, "click", 3.0))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select($"event_id").as[Long].collect().sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)), ids.mkString(","))
  }

  test("stream-static broadcast enrich matches the batch join") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = Seq((10L, "gold"), (11L, "basic")).toDF("user_id", "tier")
    val rows = Seq(
      (1L, ts(0), 10L, "click", 1.0),
      (2L, ts(1), 11L, "view", 2.0),
      (3L, ts(2), 12L, "click", 3.0)) // no dim row -> null tier

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.enriched(streamDf, dim)
      .writeStream.format("memory").queryName("enriched_out")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("enriched_out")
      .select($"event_id", $"tier").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    val batch = EventStream.enriched(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"), dim)
      .select($"event_id", $"tier").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(streamed == batch && streamed ==
      Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)), streamed.toString)
  }

  test("stream-stream interval join pairs views with purchases within the range") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = Seq(
      (1L, ts(0), 10L, "view", 1.0),
      (2L, ts(5), 10L, "purchase", 9.0),   // within 30 min of view 1 -> pair
      (3L, ts(10), 11L, "view", 1.0),
      (4L, ts(50), 11L, "purchase", 9.0),  // 40 min after view 3 -> no pair
      (5L, ts(20), 12L, "purchase", 9.0))  // no prior view -> no pair

    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.conversionJoin(streamDf)
      .writeStream.format("memory").queryName("conversions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    // push both watermarks past every range so all joinable pairs emit
    mem.addData((99L, ts(300), 99L, "view", 0.0), (98L, ts(300), 98L, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()

    val pairs = spark.table("conversions")
      .filter($"user_id" < 90)
      .select($"view_id", $"buy_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), pairs.toString)

    // batch equivalent over the same rows gives the same pair set
    val batchPairs = EventStream.conversionJoin(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .select($"view_id", $"buy_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs == pairs, s"stream=$pairs batch=$batchPairs")
  }

  test("flatMapGroupsWithState emits one row per CLOSED session, equal to the batch oracle") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    // user 10: two gap-separated sessions + a trailing open one;
    // user 11: one session closed by a late event; user 12: open only
    val rows = Seq(
      EventStream.Event(1L, ts(0), 10L, "click", 1.25),
      EventStream.Event(2L, ts(5), 10L, "view", 2.50),
      EventStream.Event(3L, ts(40), 10L, "click", 4.00),  // closes s1 (gap 35min)
      EventStream.Event(4L, ts(45), 10L, "view", 0.75),
      EventStream.Event(5L, ts(100), 10L, "click", 9.00), // closes s2 (gap 55min)
      EventStream.Event(6L, ts(0), 11L, "click", 3.10),
      EventStream.Event(7L, ts(90), 11L, "view", 1.00),   // closes 11's s1
      EventStream.Event(8L, ts(0), 12L, "view", 7.77))

    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeClosed(mem.toDS())
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode(OutputMode.Append()).start()
    // split across micro-batches mid-session AND mid-gap: closure must
    // work across batch boundaries through the state
    mem.addData(rows.take(3): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(3): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("closed_sessions").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4))).toSet

    // batch oracle over the same rows: every session; the stream emits
    // exactly the CLOSED ones = all but each user's last
    val batch = EventStream.sessionizeBatchDf(
        rows.map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value))
          .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4), r.getLong(5)))
    val lastSess = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expectClosed = batch.filter(s => s._2 != lastSess(s._1))
      .map(s => (s._1, s._3, s._4, s._5, s._6)).toSet

    assert(streamed == expectClosed, s"stream=$streamed batch=$expectClosed")
    // the planted shape: user 10 closed twice, user 11 once, user 12 never
    assert(streamed.count(_._1 == 10L) == 2 && streamed.count(_._1 == 11L) == 1 &&
      !streamed.exists(_._1 == 12L), streamed.toString)
    // closed sessions carry THEIR stats: s1 of user 10 = events 1,2
    assert(streamed.contains((10L, ts(0), ts(5), 2L, 375L)), streamed.toString)
  }

  test("event-time timeout drains trailing sessions once the watermark passes the gap") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeClosedWithTimeout(mem.toDS())
      .writeStream.format("memory").queryName("drained_sessions")
      .outputMode(OutputMode.Append()).start()
    // user 10's session ends at ts(2); nobody closes it with a later
    // event — only the watermark can
    mem.addData(
      EventStream.Event(1L, ts(0), 10L, "click", 1.25),
      EventStream.Event(2L, ts(2), 10L, "view", 2.50))
    q.processAllAvailable()
    assert(spark.table("drained_sessions").count() == 0,
      "session must stay open while the watermark is below lastTs + gap")
    // watermark advances past ts(2) + 30min on the tick; the timeout
    // fires on the FOLLOWING trigger (watermarks commit at batch end)
    mem.addData(EventStream.Event(99L, ts(120), 99L, "tick", 0.0))
    q.processAllAvailable()
    mem.addData(EventStream.Event(98L, ts(125), 98L, "tick", 0.0))
    q.processAllAvailable()
    q.stop()

    val drained = spark.table("drained_sessions")
      .filter($"user_id" < 90).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(drained == Set((10L, ts(0), ts(2), 2L, 375L)), drained.toString)
  }

  test("events older than the watermark are dropped, not absorbed into a wrong session") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeClosedWithTimeout(mem.toDS())
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append()).start()
    mem.addData(
      EventStream.Event(1L, ts(0), 10L, "click", 1.0),
      EventStream.Event(2L, ts(2), 10L, "view", 2.0))
    q.processAllAvailable()
    // push the watermark to ts(110); user 10's session drains below
    mem.addData(EventStream.Event(99L, ts(120), 99L, "tick", 0.0))
    q.processAllAvailable()
    mem.addData(EventStream.Event(98L, ts(121), 98L, "tick", 0.0))
    q.processAllAvailable()
    // a LATE event (ts(5) << watermark ts(110)): with no drop guard it
    // would open a spurious second session for user 10 whose stats
    // duplicate already-emitted data; it must be ignored entirely
    mem.addData(EventStream.Event(3L, ts(5), 10L, "click", 9.0))
    q.processAllAvailable()
    mem.addData(EventStream.Event(97L, ts(240), 97L, "tick", 0.0))
    q.processAllAvailable()
    mem.addData(EventStream.Event(96L, ts(241), 96L, "tick", 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("late_sessions").filter($"user_id" === 10L).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((10L, ts(0), ts(2), 2L, 300L)),
      s"late event leaked into a session: ${out.toSeq}")
  }

  test("mapGroupsWithState sessionization accumulates per-user state") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    mem.addData(
      EventStream.Event(1L, ts(0), 10L, "click", 1.0),
      EventStream.Event(2L, ts(1), 10L, "view", 2.0),
      EventStream.Event(3L, ts(2), 11L, "click", 5.0))
    q.processAllAvailable()
    mem.addData(EventStream.Event(4L, ts(3), 10L, "click", 3.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
    // user 10 appears twice: first batch (2 events, 3.0), second (3 events, 6.0)
    assert(out.contains((10L, 2L, 3.0)) && out.contains((10L, 3L, 6.0)), out.toString)
    assert(out.contains((11L, 1L, 5.0)))
  }
}
