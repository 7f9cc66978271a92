package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.ProductQuantizer

/** Q2 — the reference's PQ compression triggers
  * (`pq/setup.rs:41-78`: insert/update triggers quantizing new rows
  * via `_lantern_internal.quantize_vector`), re-expressed as a
  * Structured Streaming job: new parquet files arriving in the source
  * directory are quantized against the fitted codebook (broadcast
  * argmin — the same UDF as the batch path) and appended to the output
  * directory. The checkpoint makes it exactly-once per file, so this
  * is also the catch-up path after downtime, with no triggers to
  * install on the source table.
  */
object PqStream {

  /** Drain currently-available new rows: quantize `vecCol` of every
    * unseen source file and append (pk, codes) to `outDir`.
    */
  def quantizeAvailable(spark: SparkSession, sourceDir: String,
      pkCol: String, vecCol: String, codebook: DataFrame,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 8): Unit = {
    val schema = spark.read.option("recursiveFileLookup", "true")
      .parquet(sourceDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("recursiveFileLookup", "true")
      .parquet(sourceDir)
    val q: StreamingQuery = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ProductQuantizer
          .quantizeColumn(batch, vecCol, vecCol + "_pq", codebook)
          .select(pkCol, vecCol + "_pq")
          .write.mode("append").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
