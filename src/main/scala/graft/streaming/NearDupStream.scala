package graft.streaming

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
    // shared = false: the shingle memo would pin one cached relation
    // per micro-batch forever (every batch is a distinct plan); this
    // stream owns its caching explicitly instead
    val si = Dedup.signatureSets(batch, idCol, textCol, n, numHashes,
      seed, shared = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val setsDir = s"$indexDir/sets"
    // exclude this batch's own directory when re-running after a
    // crash: its rows would otherwise flag the batch against itself
    val priorDirs = listBatchDirs(spark, setsDir).filter(
      _ < f"batch_id=$batchId%012d")
    val crossDups =
      if (priorDirs.isEmpty) si.select(col("id")).limit(0)
      else {
        val se = spark.read.parquet(
          priorDirs.map(d => s"$setsDir/$d"): _*)
        Dedup.dupPairsFromSets(si, se, "new_id", "old_id",
          numHashes, bands, tau, selfJoin = false,
          maxBandDocFreq = Some(Dedup.DefaultMaxBandDocFreq))
          .select(col("new_id").as("id")).distinct()
      }
    // within-batch: keep the smaller id of every near-dup pair
    val withinDups = Dedup.dupPairsFromSets(si, si, "i", "j",
      numHashes, bands, tau, selfJoin = true,
      maxBandDocFreq = Some(Dedup.DefaultMaxBandDocFreq))
      .select(col("j").as("id")).distinct()
    // persisted: consumed by BOTH writes below — without this the
    // cross-index band join (the batch's dominant cost) runs twice
    val dupIds = crossDups.union(withinDups).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val survivors = batch.join(
        dupIds.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      survivors.write.mode("overwrite")
        .parquet(f"$outDir/batch_id=$batchId%012d")
      si.join(dupIds, Seq("id"), "left_anti")
        .write.mode("overwrite")
        .parquet(f"$setsDir/batch_id=$batchId%012d")
    } finally {
      dupIds.unpersist()
      si.unpersist()
    }
  }

  /** List batch_id=N subdirectories through the Hadoop FileSystem of
    * the index path — java.nio would silently see nothing on
    * hdfs:///s3a:// roots, disabling cross-batch dedup.
    */
  private def listBatchDirs(spark: SparkSession,
      setsDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(setsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .sorted
  }

  /** All surviving documents so far (union of batch outputs). */
  def survivorsView(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)

  /** Replay a fixed sequence of batches through the EXACT streaming
    * per-batch path (same `processBatch`, same index layout) and return
    * the survivors with their batch id — the batch face of the stream,
    * used by backfills, tests, and the correctness gate. Stream and
    * replay can never disagree: they are one code path.
    */
  def replayBatches(batches: Seq[DataFrame], idCol: String,
      textCol: String, indexDir: String, outDir: String, n: Int = 3,
      numHashes: Int = 128, bands: Int = 64, tau: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    require(batches.nonEmpty, "need at least one batch")
    batches.zipWithIndex.foreach { case (b, i) =>
      processBatch(b, i.toLong, idCol, textCol, indexDir, outDir,
        n, numHashes, bands, tau, seed)
    }
    // the batch_id=N survivor dirs are hive-partitioned: discovery
    // returns batch_id as a partition column
    batches.head.sparkSession.read.parquet(outDir)
  }

  /** Compact the signature index: merge every batch directory with
    * id <= `upToBatch` into the single directory of the HIGHEST merged
    * id, removing the rest — the small-files cure for a long-running
    * stream (one dir per micro-batch otherwise).
    *
    * Safety contract: only call with `upToBatch` strictly BELOW the
    * latest checkpoint-committed batch. foreachBatch replays only the
    * last uncommitted batch, so no future replay can carry an id <=
    * upToBatch — which is what keeps the replay self-exclusion rule
    * (`dir < own`) correct after merging: the merged dir keeps the
    * highest merged id, so it stays strictly below any replayable id.
    * Returns the number of directories merged away (0 = nothing to do).
    */
  def compactIndex(spark: SparkSession, indexDir: String,
      upToBatch: Long): Int = {
    val setsDir = s"$indexDir/sets"
    val dirs = listBatchDirs(spark, setsDir)
      .filter(_ <= f"batch_id=$upToBatch%012d")
    if (dirs.length < 2) return 0
    // the compacted dir gets a NEW name ("<last>.c") that sorts right
    // after its highest source and before the next batch id, so it is
    // never renamed over a live source dir. Crash-safety argument: at
    // every step the visible index contains AT LEAST all merged rows —
    // before the rename the sources are untouched; after it, target +
    // any not-yet-deleted sources merely duplicate rows, which the
    // candidate distinct() absorbs. Nothing is ever lost.
    val target = dirs.last + ".c"
    val merged = spark.read.parquet(dirs.map(d => s"$setsDir/$d"): _*)
    val fs = new org.apache.hadoop.fs.Path(setsDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/.compact_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val targetPath = new org.apache.hadoop.fs.Path(s"$setsDir/$target")
    // a leftover target from a crashed attempt still has its sources
    // on disk (they are deleted only after a successful rename below),
    // so replacing it cannot lose rows
    if (fs.exists(targetPath)) fs.delete(targetPath, true)
    require(fs.rename(tmp, targetPath),
      s"compaction rename failed: $tmp -> $targetPath (index unchanged)")
    dirs.foreach(d => fs.delete(
      new org.apache.hadoop.fs.Path(s"$setsDir/$d"), true))
    dirs.length - 1
  }
}
