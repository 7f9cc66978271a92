package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class TermStatsStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streaming term stats converge to the batch computation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = TermStatsStream.termStats(docs, "text")
      .writeStream.format("memory").queryName("ts_out")
      .outputMode("complete").start()
    val batch1 = Seq((1L, "a b a"), (2L, "b c"), (3L, ""))
    val batch2 = Seq((4L, "a a a"), (5L, "c d  c"))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ts_out")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val batch = TermStatsStream
      .termStats((batch1 ++ batch2).toDF("doc_id", "text"), "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(streamed == batch)
    // spot-check: 'a' in docs 1 and 4 (df 2), 5 occurrences total
    assert(streamed("a") == (2L, 5L))
  }

  test("corpus summary tracks running doc count and avgdl") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = TermStatsStream.corpusSummary(docs, "text")
      .writeStream.format("memory").queryName("cs_out")
      .outputMode("complete").start()
    mem.addData((1L, "a b"), (2L, "c d e f"), (3L, "   "))
    q.processAllAvailable()
    val mid = spark.table("cs_out").collect()
    assert(mid.length == 1 &&
      mid(0).getLong(0) == 2L && mid(0).getLong(1) == 6L &&
      mid(0).getDouble(2) == 3.0)
    mem.addData((4L, "g h"))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("cs_out").collect()
    assert(fin.length == 1 &&
      fin(0).getLong(0) == 3L && fin(0).getLong(1) == 8L)
  }

  test("term stats over corpus documents match the BM25 batch model") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val stats = TermStatsStream.termStats(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // df/cf for a known word reconcile with direct SQL
    docs.createOrReplaceTempView("documents")
    val expect = spark.sql(
      """SELECT
        |  count(CASE WHEN text LIKE '%table%' THEN 1 END) AS df,
        |  CAST(sum(size(filter(split(trim(text), ' '), w -> w = 'table'))) AS BIGINT) AS cf
        |FROM documents WHERE length(trim(text)) > 0""".stripMargin)
      .collect().head
    assert(stats("table") == (expect.getLong(0), expect.getLong(1)))
  }
}
