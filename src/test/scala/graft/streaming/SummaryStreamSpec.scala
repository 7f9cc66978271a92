package graft.streaming

import graft.SparkSuite
import graft.plans.SummaryRewrite
import org.apache.spark.sql.functions._

class SummaryStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mkRows(from: Int, n: Int) =
    (from until from + n).map(i =>
      (if (i % 2 == 0) "A" else "B", i.toLong, (i % 7 + 1).toDouble))
      .toDF("flag", "k", "qty")

  test("stream-maintained rollup serves exact aggregates after drain, " +
      "and a crash-replayed batch does not double-count") {
    val baseDir = tmp("graft_ss_base") + "/fact.parquet"
    val sumDir = tmp("graft_ss_sum") + "/rollup"
    mkRows(0, 100).write.mode("append").parquet(baseDir)
    SummaryStream.registerStreaming(spark, baseDir, sumDir,
      Seq("flag"), Seq("qty"))

    // drive batches through the real batch path (they ARE the stream
    // semantics): batch 0 = initial files, batch 1 = an append
    SummaryStream.processBatch(mkRows(0, 100), 0L, sumDir,
      Seq("flag"), Seq("qty"))
    mkRows(100, 50).write.mode("append").parquet(baseDir)
    SummaryStream.processBatch(mkRows(100, 50), 1L, sumDir,
      Seq("flag"), Seq("qty"))
    // crash between write and checkpoint commit ⇒ the same batch
    // replays; chunk=1 must be overwritten, not appended to
    SummaryStream.processBatch(mkRows(100, 50), 1L, sumDir,
      Seq("flag"), Seq("qty"))

    val q = spark.read.parquet(baseDir).groupBy($"flag")
      .agg(count(lit(1)).as("n"), sum($"qty").as("s"),
        max($"qty").as("mx"))
      .orderBy($"flag")
    // serves from the rollup...
    val scans = q.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten
    assert(scans.exists(_.contains("rollup")), s"scanned $scans")
    // ...and exactly matches the direct computation
    val got = q.collect().map(_.toSeq)
    SummaryRewrite.clear()
    val want = spark.read.parquet(baseDir).groupBy($"flag")
      .agg(count(lit(1)).as("n"), sum($"qty").as("s"),
        max($"qty").as("mx"))
      .orderBy($"flag").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("the real file-source stream drains existing files into the " +
      "rollup and compaction folds chunks without changing answers") {
    val baseDir = tmp("graft_ss2_base") + "/fact.parquet"
    val sumDir = tmp("graft_ss2_sum") + "/rollup"
    val ckpt = tmp("graft_ss2_ckpt")
    mkRows(0, 60).write.mode("append").parquet(baseDir)
    mkRows(60, 40).write.mode("append").parquet(baseDir)
    SummaryStream.registerStreaming(spark, baseDir, sumDir,
      Seq("flag"), Seq("qty"))
    val q = SummaryStream.start(spark, baseDir, sumDir,
      Seq("flag"), Seq("qty"), ckpt, maxFilesPerTrigger = 2)
    try q.processAllAvailable() finally q.stop()

    def served = spark.read.parquet(baseDir)
      .agg(count(lit(1)).as("n"), sum($"qty").as("s")).collect().head
    val afterDrain = served
    assert(afterDrain.getLong(0) == 100L)
    // multiple chunks exist now; compaction folds them to one build
    val chunksBefore = spark.read.parquet(sumDir)
      .select($"chunk").distinct().count()
    assert(chunksBefore >= 2, s"expected >=2 chunks, got $chunksBefore")
    SummaryStream.compact(spark, baseDir, sumDir, Seq("flag"), Seq("qty"))
    val afterCompact = served
    assert(afterCompact.getLong(0) == 100L)
    assert(afterCompact.getDouble(1) == afterDrain.getDouble(1))
    val chunksAfter = spark.read.parquet(sumDir)
      .select($"chunk").distinct().count()
    assert(chunksAfter == 1L)
    SummaryRewrite.clear()
  }
}
