package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class NearDupStreamSpec extends SparkSuite {
  import spark.implicits._

  // word-shingle docs: a/b near-identical, c distinct, d near-dup of a
  private val docA = "the quick brown fox jumps over the lazy dog today"
  private val docB = "the quick brown fox jumps over the lazy dog tonight"
  private val docC = "completely different content about spark query engines"
  private val docD = "the quick brown fox jumps over the lazy dog today ok"

  private def tmp(): String =
    Files.createTempDirectory("neardup").toString

  test("stream drops near-dups within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    val (out, ckp) = (tmp(), tmp())
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = NearDupStream.start(docs, "doc_id", "text",
      out, ckp, tau = 0.5)
    // batch 0: a and its near-dup b arrive together → keep min id only
    mem.addData((1L, docA), (2L, docB), (3L, docC))
    q.processAllAvailable()
    // batch 1: d near-dups the already-kept a; e=c exact dup; f fresh
    mem.addData((4L, docD), (5L, docC),
      (6L, "entirely new subject matter nothing shared with others"))
    q.processAllAvailable()
    q.stop()
    val kept = NearDupStream.survivorsView(spark, out)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 6L))
  }

  test("replaying a batch is idempotent (no self-collision, no dupes)") {
    val out = tmp()
    val b0 = Seq((1L, docA), (2L, docC)).toDF("doc_id", "text")
    NearDupStream.processBatch(b0, 0L, "doc_id", "text", out,
      3, 128, 64, 0.5, 42L)
    // crash-replay batch 0: must produce the identical survivor set,
    // not flag rows against the store copy written by the first run
    NearDupStream.processBatch(b0, 0L, "doc_id", "text", out,
      3, 128, 64, 0.5, 42L)
    val kept0 = NearDupStream.survivorsView(spark, out)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept0 === Set(1L, 2L))
    // next batch still dedups against the (single) index copy
    val b1 = Seq((3L, docB), (4L, docD)).toDF("doc_id", "text")
    NearDupStream.processBatch(b1, 1L, "doc_id", "text", out,
      3, 128, 64, 0.5, 42L)
    val kept = NearDupStream.survivorsView(spark, out)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("index compaction merges batch dirs without changing dedup " +
      "behavior") {
    val out = tmp()
    def run(b: Long, docs: Seq[(Long, String)]): Unit =
      NearDupStream.processBatch(docs.toDF("doc_id", "text"), b,
        "doc_id", "text", out, 3, 128, 64, 0.5, 42L)
    run(0L, Seq((1L, docA)))
    run(1L, Seq((2L, docC)))
    run(2L, Seq((3L, "yet another completely fresh subject here now")))
    // merge batches 0..1 (strictly below the latest committed batch 2)
    val mergedAway = NearDupStream.compactIndex(spark, out, upToBatch = 1L)
    assert(mergedAway === 1)
    val dirs = new java.io.File(out).list()
      .filter(_.startsWith("batch_id=")).sorted
    assert(dirs.toSeq === Seq("batch_id=000000000001.c",
      "batch_id=000000000002"))
    // dedup against the compacted store still works: near-dups of docs
    // from BOTH merged batches are caught
    run(3L, Seq((4L, docB), (5L, docC), (6L, "only novel content words")))
    val kept = NearDupStream.survivorsView(spark, out)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 6L))
    // idempotent no-op when there is nothing left to merge below
    assert(NearDupStream.compactIndex(spark, out, 1L) === 0)
  }

  test("stream agrees with the batch operator on the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val half = corpus.count() / 2
    val (out, ckp) = (tmp(), tmp())
    val mem = MemoryStream[(Long, String)]
    val q = NearDupStream.start(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", out, ckp, tau = 0.5)
    val rows = corpus.as[(Long, String)].collect().sortBy(_._1)
    mem.addData(rows.filter(_._1 < half).toSeq: _*)
    q.processAllAvailable()
    mem.addData(rows.filter(_._1 >= half).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = NearDupStream.survivorsView(spark, out)
      .select($"doc_id").as[Long].collect().toSet
    // batch-equivalent emulation of the stream's exact semantics:
    // within a batch drop the larger id of every pair; across batches
    // drop ids pairing with any SURVIVING indexed doc
    val pairs = graft.operators.Dedup.minhashDupPairs(
      corpus, "doc_id", "text", tau = 0.5)
      .select($"i", $"j").as[(Long, Long)].collect()
    val b0 = rows.map(_._1).filter(_ < half).toSet
    val b1 = rows.map(_._1).filter(_ >= half).toSet
    val drop0 = pairs.collect {
      case (i, j) if b0(i) && b0(j) => j
    }.toSet
    val survive0 = b0 -- drop0
    val dropCross = pairs.collect {
      case (i, j) if survive0(i) && b1(j) => j
    }.toSet
    val dropWithin1 = pairs.collect {
      case (i, j) if b1(i) && b1(j) => j
    }.toSet
    val expected = survive0 ++ (b1 -- dropCross -- dropWithin1)
    assert(streamed === expected)
  }
}
