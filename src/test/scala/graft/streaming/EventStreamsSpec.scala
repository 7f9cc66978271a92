package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class EventStreamsSpec extends SparkSuite {
  import spark.implicits._
  import EventStreams._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")
  private def tsi(min: Int): java.time.Instant = ts(min).toInstant

  test("windowedCounts over a memory stream emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    mem.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0),
      (ts(11), "click", 4.0), (ts(25), "view", 8.0))
    q.processAllAvailable()
    // watermark now at 00:20 → the 00:00 window is finalized
    mem.addData((ts(40), "view", 16.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_out")
      .select($"window_start", $"event_type", $"n", $"sm")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows.contains((ts(0), "click", 2L, 3.0)))
    assert(rows.contains((ts(10), "click", 1L, 4.0)))
  }

  test("late data beyond the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.windowedCounts(events, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    mem.addData((ts(1), "click", 1.0), (ts(30), "click", 1.0))
    q.processAllAvailable()
    // ts(2) is far behind the 00:25 watermark → dropped
    mem.addData((ts(2), "click", 99.0), (ts(45), "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val w0 = spark.table("late_out")
      .where($"window_start" === ts(0)).select($"n").as[Long].collect()
    assert(w0.toSeq === Seq(1L)) // late row did not reopen the window
  }

  test("sessionize groups events by gap per user (batch)") {
    val events = Seq(
      Event(1L, tsi(0), "a", 1.0), Event(1L, tsi(2), "a", 2.0),
      Event(1L, tsi(20), "a", 4.0), // > 10 min gap → new session
      Event(2L, tsi(5), "b", 8.0)
    ).toDS()
    val sessions = EventStreams.sessionize(events, gapMs = 10 * 60 * 1000)
      .collect().sortBy(s => (s.user_id, s.session_start.toEpochMilli))
    assert(sessions.length === 3)
    assert(sessions(0) === Session(1L, tsi(0), tsi(2), 2, 3.0))
    assert(sessions(1) === Session(1L, tsi(20), tsi(20), 1, 4.0))
    assert(sessions(2) === Session(2L, tsi(5), tsi(5), 1, 8.0))
  }

  test("sessionizeStream merges a session spanning micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    import org.apache.spark.sql.Encoders
    val events = mem.toDF().toDF("user_id", "ts", "event_type", "value")
      .as(Encoders.product[Event])
    val q = EventStreams.sessionizeStream(events, gapMs = 10 * 60 * 1000,
      watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    // batch 1: user 1 starts a session; user 2 isolated event.
    // max event time stays at 3 min so the 1-minute watermark (2 min)
    // is below batch 2's 4-minute event
    mem.addData((1L, ts(0), "a", 1.0), (1L, ts(2), "a", 2.0),
      (2L, ts(3), "b", 8.0))
    q.processAllAvailable()
    // batch 2: user 1 CONTINUES the same session (within the 10 min
    // gap) — a batch-per-batch folder would fragment it here
    mem.addData((1L, ts(4), "a", 4.0))
    q.processAllAvailable()
    // batch 3: far-future event advances the watermark past
    // session_end + gap → timeouts fire and emit closed sessions
    mem.addData((3L, ts(59), "c", 0.0))
    q.processAllAvailable()
    mem.addData((3L, Timestamp.valueOf("2026-01-01 02:00:00"), "c", 0.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_out")
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        $"total_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      .filter(_._1 == 1L)
    assert(sessions.length === 1, s"fragmented: ${sessions.toSeq}")
    assert(sessions.head === ((1L, ts(0), ts(4), 3L, 7.0)))
  }

  test("sessionizeStream merges out-of-order events across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    import org.apache.spark.sql.Encoders
    val events = mem.toDF().toDF("user_id", "ts", "event_type", "value")
      .as(Encoders.product[Event])
    val q = EventStreams.sessionizeStream(events, gapMs = 10 * 60 * 1000,
      watermarkDelay = "30 minutes")
      .writeStream.format("memory").queryName("sess_ooo")
      .outputMode("append").start()
    // batch 1: events at 10 and 5 min (already out of order in-batch)
    mem.addData((1L, ts(10), "a", 1.0), (1L, ts(5), "a", 2.0))
    q.processAllAvailable()
    // batch 2: OUT-OF-ORDER event at 2 min (watermark is far behind,
    // so the engine admits it); must extend the session backwards,
    // not regress its end
    mem.addData((1L, ts(2), "a", 4.0))
    q.processAllAvailable()
    // advance watermark beyond end+gap to flush
    mem.addData((9L, Timestamp.valueOf("2026-01-01 02:00:00"), "z", 0.0))
    q.processAllAvailable()
    mem.addData((9L, Timestamp.valueOf("2026-01-01 03:00:00"), "z", 0.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_ooo")
      .select($"user_id", $"session_start", $"session_end", $"n_events",
        $"total_value")
      .as[(Long, Timestamp, Timestamp, Long, Double)].collect()
      .filter(_._1 == 1L)
    assert(sessions.length === 1, s"got: ${sessions.toSeq}")
    assert(sessions.head === ((1L, ts(2), ts(10), 3L, 7.0)))
  }

  test("sessionize over the real events table produces sane sessions") {
    val events = graft.queries.Tables(spark, sf0001, "events")
      .select($"user_id", $"ts", $"event_type", $"value")
      .as[Event]
    val sessions = EventStreams.sessionize(events, gapMs = 3600 * 1000)
    val n = sessions.count()
    val users = events.select($"user_id").distinct().count()
    assert(n >= users) // at least one session per active user
    val agg = sessions.agg(sum($"n_events")).as[Long].head()
    assert(agg === events.count()) // every event lands in one session
  }

  test("intervalJoin attributes right events to in-horizon left events " +
      "across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(min: Int): Timestamp =
      Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")
    val imps = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp, String)]
    val clicks = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Timestamp)]
    val joined = EventStreams.intervalJoin(
      imps.toDF().toDF("imp_user", "imp_ts", "creative"),
      clicks.toDF().toDF("clk_user", "clk_ts"),
      "imp_user", "clk_user", "imp_ts", "clk_ts",
      horizon = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    // batch 0: impressions for users 1 and 2
    imps.addData((1L, ts(1), "adA"), (2L, ts(2), "adB"))
    q.processAllAvailable()
    // batch 1: user 1 clicks in-horizon; user 2 clicks 15 min later
    // (out of horizon); user 3 clicks with no impression at all
    clicks.addData((1L, ts(5)), (2L, ts(17)), (3L, ts(6)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attrib")
      .select($"imp_user", $"creative").as[(Long, String)].collect()
    assert(rows.toSet === Set((1L, "adA")))
  }

  test("funnel chains earliest steps within the window; stalled and " +
      "out-of-window users stop at their reached stage") {
    // 20-minute window. user 1: full chain view@0 click@10 purchase@25
    // user 2: click@25 is > 20 min after view@0 -> stage 1
    // user 3: no view at all -> absent (never enters the funnel)
    // user 4: purchase BEFORE click -> stage 2 (steps are ordered)
    // user 5: two views; only the EARLIEST chains (click@35 is in
    //         range of view@30, but the first view@0 already fixed
    //         t1 -> stage 1, the documented greedy trade)
    val events = Seq(
      (1L, "view", 0), (1L, "click", 10), (1L, "purchase", 25),
      (2L, "view", 0), (2L, "click", 25),
      (3L, "click", 5), (3L, "purchase", 10),
      (4L, "view", 0), (4L, "purchase", 5), (4L, "click", 15),
      (5L, "view", 0), (5L, "view", 30), (5L, "click", 35)
    ).map { case (u, t, m) => (u, t, ts(m)) }
      .toDF("user_id", "event_type", "ts")
    val out = EventStreams.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), withinMs = 20 * 60 * 1000L)
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 3, 2L -> 1, 4L -> 2, 5L -> 1))
  }
}
