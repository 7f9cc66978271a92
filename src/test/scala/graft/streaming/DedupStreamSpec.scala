package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DedupStreamSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")

  test("duplicates within the watermark horizon are dropped once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = DedupStream.dedupByFingerprint(docs, "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    mem.addData((1L, ts(1), "alpha"), (2L, ts(2), "alpha"),
      (3L, ts(3), "beta"))
    q.processAllAvailable()
    mem.addData((4L, ts(4), "alpha"), (5L, ts(5), "gamma"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_out")
      .select($"doc_id").as[Long].collect().toSet
    // one "alpha" survivor (id 1), "beta", "gamma"
    assert(kept === Set(1L, 3L, 5L))
  }

  test("state is evicted past the watermark (re-emission after horizon)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = DedupStream.dedupByFingerprint(docs, "ts", "text", "5 minutes")
      .writeStream.format("memory").queryName("dedup_evict")
      .outputMode("append").start()
    mem.addData((1L, ts(1), "alpha"))
    q.processAllAvailable()
    // advance watermark far past ts(1)+5min, evicting alpha's state
    mem.addData((2L, ts(30), "filler"))
    q.processAllAvailable()
    // same content reappears AFTER eviction → emitted again (bounded
    // state trades exactly-once dedup beyond the horizon for survival)
    mem.addData((3L, ts(31), "alpha"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_evict")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }
}
