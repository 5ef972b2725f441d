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
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val batch = EventStream.windowedCountsBatch(
        rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

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
