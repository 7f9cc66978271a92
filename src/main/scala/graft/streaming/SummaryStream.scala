package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.plans.SummaryRewrite

/** Incrementally maintained materialized rollup — the streaming face
  * of [[graft.plans.SummaryRewrite]]: base-table appends arrive as a
  * file-source stream, and each micro-batch's PARTIAL rollup
  * (cnt / s_m / mn_m / mx_m per dim group) is appended to the rollup
  * table as extra rows under its own `chunk=<batchId>` partition.
  *
  * No merge step exists, by design: the serve-side rewrite
  * re-aggregates rollup rows with the same combiners (SUM of sums,
  * MIN of mins), so a group split across the base build (chunk=-1)
  * and any number of delta chunks reads back exactly. This is the
  * classic partial-aggregate MV-maintenance trick: maintenance cost
  * per batch is one map-side aggregation of the batch, never a
  * read-modify-write of the rollup.
  *
  * Idempotency (the D10 lesson, as in [[VectorIngestStream]]): each
  * batch writes with DYNAMIC partition overwrite scoped to its own
  * `chunk=N` — a replay after a crash between write and checkpoint
  * commit rewrites the same partition instead of double-counting.
  *
  * `compact` folds accumulated deltas back to a single chunk=-1 build
  * (a full refresh — the rollup is dim-cardinality-sized, so this is
  * cheap and safe to run any time the stream is stopped or between
  * batches: the registered entry keeps serving while it runs, and
  * `register(refresh = true)` swaps in the rebuilt rollup).
  */
object SummaryStream {

  /** Register `summaryDir` as an ENTIRELY stream-maintained rollup:
    * writes an empty (schema-only) chunk=-1 build and registers it, so
    * a subsequently [[start]]ed stream with a FRESH checkpoint folds in
    * every existing base file as ordinary batches — no initial
    * snapshot exists to double-count (a file source has no
    * skip-existing option, so mixing a full `buildSummary` with a
    * fresh checkpoint would count the initial files twice). Serve-side
    * reads reflect exactly the batches committed so far: bounded
    * staleness, the standard streaming-MV contract.
    */
  def registerStreaming(spark: SparkSession, basePath: String,
      summaryDir: String, dims: Seq[String],
      measures: Seq[String]): Unit = {
    SummaryRewrite.partialRollup(
        spark.read.parquet(basePath).limit(0), dims, measures)
      .withColumn("chunk", lit(-1L))
      .coalesce(1)
      .write.mode("overwrite").partitionBy("chunk").parquet(summaryDir)
    spark.catalog.refreshByPath(summaryDir)
    SummaryRewrite.register(spark, basePath, summaryDir, dims, measures)
  }

  /** Start maintaining `summaryDir` from base files appearing under
    * `basePath`. Pair with [[registerStreaming]] + a fresh checkpoint
    * (all files are folded in as batches), or with an existing
    * checkpoint that has already seen the files the current rollup
    * build covers.
    */
  def start(spark: SparkSession, basePath: String, summaryDir: String,
      dims: Seq[String], measures: Seq[String], checkpointDir: String,
      maxFilesPerTrigger: Int = 8): StreamingQuery = {
    val schema = spark.read.parquet(basePath).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(basePath)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, summaryDir, dims, measures)
        ()
      }
      .start()
  }

  /** One micro-batch: partial rollup of the batch rows, written to the
    * batch's own chunk partition (dynamic overwrite ⇒ replay rewrites,
    * never double-counts). Package-visible so the spec drives batch
    * semantics directly.
    */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      summaryDir: String, dims: Seq[String],
      measures: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val prev =
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      SummaryRewrite.partialRollup(batch, dims, measures)
        .withColumn("chunk", lit(batchId))
        .coalesce(1)
        .write.mode("overwrite").partitionBy("chunk").parquet(summaryDir)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    // new delta files must be visible to the next serve-side plan
    spark.catalog.refreshByPath(summaryDir)
  }

  /** Fold all delta chunks back into a single chunk=-1 build by
    * re-deriving the rollup from the base as it is now, and re-point
    * the registry at the fresh build.
    */
  def compact(spark: SparkSession, basePath: String, summaryDir: String,
      dims: Seq[String], measures: Seq[String]): Unit =
    SummaryRewrite.register(spark, basePath, summaryDir, dims, measures,
      refresh = true)
}
