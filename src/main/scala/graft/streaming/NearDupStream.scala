package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming NEAR-duplicate removal — the MinHash-LSH face of
  * [[DedupStream]] (which is exact-only): documents arrive as a stream,
  * each micro-batch is deduplicated (a) against every earlier surviving
  * document and (b) within itself, and only near-dup-free survivors are
  * emitted.
  *
  * State design: the accumulated corpus lives in the STORAGE layer as a
  * parquet signature-set index (`id`, hashed shingles, MinHash
  * signature — [[Dedup.signatureSets]]'s schema), NOT in executor state
  * stores. Executor state for near-dup matching would have to hold
  * every band key seen forever (unbounded, and lost on checkpoint
  * wipes); the storage index is restart-safe, compactable with plain
  * parquet tooling, shared across jobs, and exactly what the batch
  * [[Dedup.crossCorpusDupPairs]] path joins against — streaming and
  * batch dedup stay one code path. Each batch's join touches the index
  * through 8-byte band keys, the same shape that scales the batch
  * operator.
  *
  * Idempotency: every write is a batch_id-scoped overwrite (both the
  * survivor output and the index append), so a batch replayed after a
  * crash between write and checkpoint commit rewrites the same
  * directories instead of double-appending — the D10 lesson from the
  * embedding daemon.
  */
object NearDupStream {

  /** Start the dedup stream.
    *
    * @param docs      streaming DataFrame with `idCol` and `textCol`
    * @param indexDir  parquet signature index root (created on demand)
    * @param outDir    survivor output root (batch_id=N subdirs)
    * @param checkpointDir streaming checkpoint location
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String, checkpointDir: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 64,
      tau: Double = 0.5, seed: Long = 42L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, outDir,
          n, numHashes, bands, tau, seed)
        ()
      }
      .start()

  /** One micro-batch: cross-index dedup, within-batch dedup, survivor +
    * index writes. Package-visible so the spec can drive it directly
    * (batch semantics == stream semantics by construction).
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, indexDir: String, outDir: String,
      n: Int, numHashes: Int, bands: Int, tau: Double,
      seed: Long): Unit = {
    val spark = batch.sparkSession
    val si = Dedup.signatureSets(batch, idCol, textCol, n, numHashes, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val setsDir = s"$indexDir/sets"
      // exclude this batch's own directory when re-running after a
      // crash: its rows would otherwise flag the batch against itself
      val priorDirs = listBatchDirs(setsDir).filter(
        _ < f"batch_id=$batchId%012d")
      val crossDups =
        if (priorDirs.isEmpty) si.select(col("id")).limit(0)
        else {
          val se = spark.read.parquet(
            priorDirs.map(d => s"$setsDir/$d"): _*)
          Dedup.dupPairsFromSets(si, se, "new_id", "old_id",
            numHashes, bands, tau, selfJoin = false)
            .select(col("new_id").as("id")).distinct()
        }
      // within-batch: keep the smaller id of every near-dup pair
      val withinDups = Dedup.dupPairsFromSets(si, si, "i", "j",
        numHashes, bands, tau, selfJoin = true)
        .select(col("j").as("id")).distinct()
      val dupIds = crossDups.union(withinDups).distinct()
      val survivors = batch.join(
        dupIds.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      survivors.write.mode("overwrite")
        .parquet(f"$outDir/batch_id=$batchId%012d")
      si.join(dupIds.withColumnRenamed("id", "id"), Seq("id"), "left_anti")
        .write.mode("overwrite")
        .parquet(f"$setsDir/batch_id=$batchId%012d")
    } finally si.unpersist()
  }

  private def listBatchDirs(setsDir: String): Seq[String] = {
    val p = Paths.get(setsDir)
    if (!Files.isDirectory(p)) return Seq.empty
    val s = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("batch_id=")).toSeq.sorted
    } finally s.close()
  }

  /** All surviving documents so far (union of batch outputs). */
  def survivorsView(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
}
