package graft.streaming

import java.time.Instant


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.embed.{EmbeddingPipeline, EmbeddingRuntime}

/** Continuous embedding jobs — the reference daemon re-expressed in
  * Structured Streaming (SURVEY §2.9 D1-D10, §2.8 F11-F14, §3.3).
  *
  * Mapping:
  *  - jobs table + LISTEN/NOTIFY (D1-D3) → a JobStore of JSON states +
  *    the source directory ITSELF as the stream (new parquet files are
  *    the CDC events; no triggers needed);
  *  - 10 s batching collector (D4) → ProcessingTime/AvailableNow
  *    triggers with maxFilesPerTrigger;
  *  - init backfill + catch-up (D5, P3) → the first run consumes all
  *    existing files; the checkpoint makes later runs process only new
  *    arrivals — downtime catch-up is free;
  *  - row locking across daemons (D6) → unnecessary: the checkpoint
  *    gives exactly-once file processing under a single owner;
  *  - retry/backoff (D7) → Spark task retries + failed-state restart;
  *  - cancellation (D8) → cooperative check per micro-batch, surfacing
  *    the reference's "Job cancelled" error;
  *  - usage metering (D10) → one usage row per batch with columns
  *    (job_id, rows, tokens), laid out in `batch_id=N` partition
  *    directories (batch_id returns as a partition column on read);
  *    the same layout holds for the embedding output. Batch-scoped
  *    overwrite makes checkpoint replays idempotent.
  *
  * Status state machine is the reference's CASE over init timestamps
  * (`lantern_extras/src/daemon.rs:197-234`):
  * failed > canceled > enabled > in_progress > queued.
  */
object EmbeddingJobs {

  case class JobSpec(id: Long, sourceDir: String, pkCol: String,
      srcCol: String, outCol: String, model: String, runtime: String,
      workDir: String) {
    def outputDir: String = s"$workDir/out"
    def usageDir: String = s"$workDir/usage"
    def checkpointDir: String = s"$workDir/checkpoint"
  }

  case class JobState(spec: JobSpec, createdAt: String,
      initStartedAt: Option[String] = None,
      initFinishedAt: Option[String] = None,
      canceledAt: Option[String] = None,
      failedAt: Option[String] = None,
      error: Option[String] = None,
      progress: Int = 0)

  /** F12's CASE over timestamps. */
  def status(st: JobState): String =
    if (st.failedAt.isDefined) "failed"
    else if (st.canceledAt.isDefined) "canceled"
    else if (st.initFinishedAt.isDefined) "enabled"
    else if (st.initStartedAt.isDefined) "in_progress"
    else "queued"

  /** Driver-side job metadata store: one JSON file per job, atomically
    * replaced (D1's jobs table; content is tiny control-plane state).
    */
  final class JobStore(dir: String)
      extends JsonJobStore[JobState](dir, "job_") {

    override protected def idOf(st: JobState): Long = st.spec.id

    override protected def ser(st: JobState): String = {
      def esc(v: String) = graft.util.Json.escape(v)
      def opt(o: Option[String]) =
        o.map(v => "\"" + esc(v) + "\"").getOrElse("null")
      val s = st.spec
      s"""{"id":${s.id},"sourceDir":"${esc(s.sourceDir)}","pkCol":"${esc(s.pkCol)}",
         |"srcCol":"${esc(s.srcCol)}","outCol":"${esc(s.outCol)}","model":"${esc(s.model)}",
         |"runtime":"${esc(s.runtime)}","workDir":"${esc(s.workDir)}",
         |"createdAt":"${esc(st.createdAt)}",
         |"initStartedAt":${opt(st.initStartedAt)},
         |"initFinishedAt":${opt(st.initFinishedAt)},
         |"canceledAt":${opt(st.canceledAt)},
         |"failedAt":${opt(st.failedAt)},
         |"error":${opt(st.error)},
         |"progress":${st.progress}}""".stripMargin.replace("\n", "")
    }

    override protected def deser(json: String): JobState = {
      def field(k: String) = JsonJobStore.field(json, k)
      def req(k: String) = field(k).get
      JobState(
        JobSpec(req("id").toLong, req("sourceDir"), req("pkCol"),
          req("srcCol"), req("outCol"), req("model"), req("runtime"),
          req("workDir")),
        req("createdAt"), field("initStartedAt"),
        field("initFinishedAt"), field("canceledAt"),
        field("failedAt"), field("error"),
        req("progress").toInt)
    }

    /** F11: add_embedding_job. */
    def add(sourceDir: String, pkCol: String, srcCol: String,
        outCol: String, model: String, runtime: String = "hash",
        workBase: String = null): JobState = synchronized {
      val id = nextId()
      val work = Option(workBase).getOrElse(s"$dir/work_$id")
      val st = JobState(
        JobSpec(id, sourceDir, pkCol, srcCol, outCol, model, runtime, work),
        Instant.now().toString)
      write(st); st
    }

    /** F14: cancel / resume. */
    def cancel(id: Long): JobState =
      update(id)(_.copy(canceledAt = Some(Instant.now().toString)))
    def resume(id: Long): JobState =
      update(id)(_.copy(canceledAt = None, failedAt = None, error = None))
  }

  /** Run one drain of the job's stream (AvailableNow = D5 init backfill
    * AND steady-state catch-up: the checkpoint decides what is new).
    * Returns the terminal status.
    */
  def run(spark: SparkSession, store: JobStore, id: Long,
      maxFilesPerTrigger: Int = 8): String = {
    val st0 = store.get(id)
    if (st0.canceledAt.isDefined) {
      // keep canceledAt the terminal marker (failed outranks canceled
      // in the status CASE, so writing failedAt would misreport a
      // user cancel as a failure)
      store.update(id)(_.copy(error = Some("Job cancelled")))
      return "canceled"
    }
    val spec = st0.spec
    store.update(id)(_.copy(
      initStartedAt = Some(Instant.now().toString)))
    val runtime = EmbeddingRuntime.forName(spec.runtime)
    try {
      val schema = spark.read
        .option("recursiveFileLookup", "true")
        .parquet(spec.sourceDir).schema
      val stream = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .option("recursiveFileLookup", "true")
        .parquet(spec.sourceDir)
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (store.get(id).canceledAt.isDefined)
            throw new RuntimeException("Job cancelled") // D8
          val embedded = EmbeddingPipeline.embedColumn(batch,
            spec.srcCol, spec.outCol, spec.model, runtime)
            .where(col(spec.outCol).isNotNull)
            .select(col(spec.pkCol), col(spec.outCol),
              col(spec.outCol + "_tokens").as("tokens"))
            .persist()
          try {
            val usage = embedded.agg(
              count(lit(1)).as("rows"), sum(col("tokens")).as("tokens"))
              .select(lit(spec.id).as("job_id"), col("rows"), col("tokens"))
              .collect().head
            // batchId-scoped overwrite (batch ids are unique across
            // restarts of one checkpoint): a replay after a crash
            // between these writes and the checkpoint commit rewrites
            // the same directories instead of appending duplicates, so
            // output stays exactly-once and D10 metering never
            // double-counts. batch_id returns as a partition column.
            embedded.drop("tokens")
              .write.mode("overwrite")
              .parquet(s"${spec.outputDir}/batch_id=$batchId")
            spark.createDataFrame(java.util.List.of(usage), usage.schema)
              .write.mode("overwrite")
              .parquet(s"${spec.usageDir}/batch_id=$batchId")
          } finally embedded.unpersist()
          ()
        }
        .option("checkpointLocation", spec.checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // progress: processed distinct pks over source rows (D5's %)
      val total = spark.read.option("recursiveFileLookup", "true")
        .parquet(spec.sourceDir).count()
      val done =
        // AnalysisException = no output yet (zero-row source); any
        // other failure must propagate to the failed-state path rather
        // than silently reporting 0 progress
        try spark.read.parquet(spec.outputDir)
          .select(col(spec.pkCol)).distinct().count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      val pct = if (total == 0) 100 else ((done * 100) / total).toInt
      store.update(id)(_.copy(
        initFinishedAt = Some(Instant.now().toString),
        progress = math.min(pct, 100)))
      "enabled"
    } catch {
      case e: Throwable =>
        val canceled = e.getMessage != null &&
          e.getMessage.contains("Job cancelled")
        store.update(id)(s => s.copy(
          failedAt =
            if (canceled) s.failedAt
            else Some(Instant.now().toString),
          error = Some(Option(e.getMessage).getOrElse(e.toString)
            .linesIterator.nextOption().getOrElse(e.getClass.getName))))
        if (canceled) "canceled" else "failed"
    }
  }

  /** The "current table" view: source rows with their latest embedding
    * (P3's missing-rows are the NULL-embedding rows).
    */
  def currentTable(spark: SparkSession, spec: JobSpec): DataFrame = {
    val source = spark.read.option("recursiveFileLookup", "true")
      .parquet(spec.sourceDir)
    val out =
      // AnalysisException = job has produced no output yet; genuine
      // read failures (corrupt/mixed layouts) must surface, not turn
      // into silently all-NULL embeddings
      try spark.read.parquet(spec.outputDir)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          return source.withColumn(spec.outCol,
            lit(null).cast("array<float>"))
      }
    // keep the latest batch's embedding per pk (idempotent re-runs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(spec.pkCol))
      .orderBy(col("batch_id").desc)
    val latest = out
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(spec.pkCol), col(spec.outCol))
    source.join(latest, Seq(spec.pkCol), "left")
  }

  /** F12: get_embedding_job_status. */
  def jobStatus(store: JobStore, id: Long): (String, Int, Option[String]) = {
    val st = store.get(id)
    (status(st), st.progress, st.error)
  }
}
