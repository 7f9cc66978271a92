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
  * State design: the accumulated corpus lives in the STORAGE layer as
  * ONE parquet artifact per batch (`outDir/batch_id=N`) holding the
  * surviving documents WITH their signature columns (`_graft_hs`,
  * `_graft_sig` — [[Dedup.signatureSets]]'s hashed shingles + MinHash
  * signature), NOT in executor state stores. Executor state for
  * near-dup matching would have to hold every band key seen forever
  * (unbounded, and lost on checkpoint wipes); the storage artifact is
  * restart-safe, compactable with plain parquet tooling, and shared
  * across jobs. The survivor store IS the signature index: the
  * cross-batch reader selects only (id, _graft_hs, _graft_sig), so
  * parquet column pruning never touches the document payload, while
  * consumers of the survivors drop the two signature columns. One
  * durable write per batch instead of the former survivor+index pair —
  * half the job commits and fsync barriers on the micro-batch path
  * (the r12 bench's dominant write cost).
  *
  * Idempotency: every write is a batch_id-scoped overwrite, so a batch
  * replayed after a crash between write and checkpoint commit rewrites
  * the same directory instead of double-appending — the D10 lesson
  * from the embedding daemon.
  */
object NearDupStream {

  /** Survivor-store columns carrying the signature index; everything
    * else in a batch directory is the surviving document row itself.
    */
  val SignatureCols: Seq[String] = Seq("_graft_hs", "_graft_sig")

  /** Start the dedup stream.
    *
    * @param docs      streaming DataFrame with `idCol` and `textCol`
    * @param outDir    survivor+signature store root (batch_id=N
    *                  subdirs, created on demand)
    * @param checkpointDir streaming checkpoint location
    */
  def start(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, checkpointDir: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 64,
      tau: Double = 0.5, seed: Long = 42L): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, outDir,
          n, numHashes, bands, tau, seed)
        ()
      }
      .start()

  /** One micro-batch: cross-store dedup, within-batch dedup, ONE
    * co-written survivor+signature artifact. Package-visible so the
    * spec can drive it directly (batch semantics == stream semantics
    * by construction).
    */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, outDir: String,
      n: Int, numHashes: Int, bands: Int, tau: Double,
      seed: Long): Unit = {
    val spark = batch.sparkSession
    // shared = false: the shingle memo would pin one cached relation
    // per micro-batch forever (every batch is a distinct plan); this
    // stream owns its caching explicitly instead
    val si = Dedup.signatureSets(batch, idCol, textCol, n, numHashes,
      seed, shared = false)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exclude this batch's own directory when re-running after a
    // crash: its rows would otherwise flag the batch against itself
    val priorDirs = listBatchDirs(spark, outDir).filter(
      _ < f"batch_id=$batchId%012d")
    // only the 3 signature columns are selected, so the parquet
    // scan prunes the document payload out of the read entirely
    val priorSets =
      if (priorDirs.isEmpty)
        si.select(col("id"), col("hs"), col("sig")).limit(0)
      else spark.read.parquet(priorDirs.map(d => s"$outDir/$d"): _*)
        .where(col("_graft_sig").isNotNull)
        .select(col(idCol).as("id"), col("_graft_hs").as("hs"),
          col("_graft_sig").as("sig"))
    // within-batch pairs (keep the smaller id) and new-vs-resident
    // pairs in one fused band pass — see Dedup.streamDupIds for the
    // pair-for-pair equivalence argument to the former two
    // dupPairsFromSets calls
    val dupIds = Dedup.streamDupIds(si, priorSets, numHashes, bands,
      tau, Some(Dedup.DefaultMaxBandDocFreq))
    try {
      val survivors = batch.join(
        dupIds.withColumnRenamed("id", idCol), Seq(idCol), "left_anti")
      // co-write the survivor row and its signature columns as ONE
      // artifact (left join: a blank/shingle-less doc survives with
      // NULL signatures — it can never near-dup-match anything, and
      // the cross-batch reader filters it out)
      survivors.join(
          si.select(col("id").as(idCol), col("hs").as("_graft_hs"),
            col("sig").as("_graft_sig")),
          Seq(idCol), "left")
        .write.mode("overwrite")
        .parquet(f"$outDir/batch_id=$batchId%012d")
    } finally {
      si.unpersist()
    }
  }

  /** List batch_id=N subdirectories through the Hadoop FileSystem of
    * the store path — java.nio would silently see nothing on
    * hdfs:///s3a:// roots, disabling cross-batch dedup.
    */
  private def listBatchDirs(spark: SparkSession,
      outDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .sorted
  }

  /** All surviving documents so far (union of batch outputs), with the
    * internal signature columns dropped.
    */
  def survivorsView(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
      .drop(SignatureCols: _*)

  /** Replay a fixed sequence of batches through the EXACT streaming
    * per-batch path (same `processBatch`, same store layout) and return
    * the survivors with their batch id — the batch face of the stream,
    * used by backfills, tests, and the correctness gate. Stream and
    * replay can never disagree: they are one code path.
    */
  def replayBatches(batches: Seq[DataFrame], idCol: String,
      textCol: String, outDir: String, n: Int = 3,
      numHashes: Int = 128, bands: Int = 64, tau: Double = 0.5,
      seed: Long = 42L): DataFrame = {
    require(batches.nonEmpty, "need at least one batch")
    batches.zipWithIndex.foreach { case (b, i) =>
      processBatch(b, i.toLong, idCol, textCol, outDir,
        n, numHashes, bands, tau, seed)
    }
    // the batch_id=N survivor dirs are hive-partitioned: discovery
    // returns batch_id as a partition column
    batches.head.sparkSession.read.parquet(outDir)
      .drop(SignatureCols: _*)
  }

  /** Compact the survivor+signature store: merge every batch directory
    * with id <= `upToBatch` into the single directory of the HIGHEST
    * merged id, removing the rest — the small-files cure for a
    * long-running stream (one dir per micro-batch otherwise).
    *
    * Safety contract: only call with `upToBatch` strictly BELOW the
    * latest checkpoint-committed batch. foreachBatch replays only the
    * last uncommitted batch, so no future replay can carry an id <=
    * upToBatch — which is what keeps the replay self-exclusion rule
    * (`dir < own`) correct after merging: the merged dir keeps the
    * highest merged id, so it stays strictly below any replayable id.
    * Crash between the rename and the source deletes leaves duplicate
    * SURVIVOR rows visible (target + stragglers); re-running
    * compactIndex with the same `upToBatch` deletes the leftover
    * target, rebuilds it from the still-present sources and finishes
    * the deletes — converging back to exactly-once rows. Returns the
    * number of directories merged away (0 = nothing to do).
    */
  def compactIndex(spark: SparkSession, outDir: String,
      upToBatch: Long): Int = {
    val dirs = listBatchDirs(spark, outDir)
      .filter(_ <= f"batch_id=$upToBatch%012d")
    if (dirs.length < 2) return 0
    // the compacted dir gets a NEW name ("<last>.c") that sorts right
    // after its highest source and before the next batch id, so it is
    // never renamed over a live source dir. Crash-safety argument: at
    // every step the visible store contains AT LEAST all merged rows —
    // before the rename the sources are untouched; after it, target +
    // any not-yet-deleted sources merely duplicate rows, which the
    // candidate distinct() absorbs and a compaction re-run removes.
    val target = dirs.last + ".c"
    val merged = spark.read.parquet(dirs.map(d => s"$outDir/$d"): _*)
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$outDir/.compact_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val targetPath = new org.apache.hadoop.fs.Path(s"$outDir/$target")
    // a leftover target from a crashed attempt still has its sources
    // on disk (they are deleted only after a successful rename below),
    // so replacing it cannot lose rows
    if (fs.exists(targetPath)) fs.delete(targetPath, true)
    require(fs.rename(tmp, targetPath),
      s"compaction rename failed: $tmp -> $targetPath (store unchanged)")
    dirs.foreach(d => fs.delete(
      new org.apache.hadoop.fs.Path(s"$outDir/$d"), true))
    dirs.length - 1
  }
}
