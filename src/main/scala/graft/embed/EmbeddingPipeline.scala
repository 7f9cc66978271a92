package graft.embed

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.LongAccumulator

import graft.functions.TextFunctions

/** Bulk embedding pipeline — the reference's headline capability
  * ("add an embedding column to a table", `embeddings/mod.rs:449-549`),
  * re-expressed as one Spark job:
  *
  *   read → filter (P1/P2) → mapPartitions(grouped(batch) → runtime) →
  *   merge back by pk (J1/S8)
  *
  * The reference's 3-stage channel pipeline (producer/embedder/exporter,
  * `mod.rs:502-543`) dissolves into Spark's scan → compute → commit: the
  * partition is the batch, backpressure is the scheduler, and the COPY
  * temp + UPDATE join becomes a broadcast-free pk join. Model state is
  * per-executor (runtimes are cheap or lazily initialized singletons).
  */
object EmbeddingPipeline {

  /** Lazily add `outCol` (ARRAY<FLOAT>) and `outCol_tokens` (BIGINT) by
    * embedding `srcCol` with the given model/runtime. Rows failing the
    * usable-text filter get a null embedding and 0 tokens (they are
    * skipped, mirroring P2/P7). Distributed: no driver materialization.
    */
  def embedColumn(df: DataFrame, srcCol: String, outCol: String,
      model: String, runtime: EmbeddingRuntime,
      batchSize: Int = -1,
      tokenAcc: Option[LongAccumulator] = None): DataFrame = {
    val batch = if (batchSize > 0) batchSize
      else ModelRegistry.defaultBatchSize(model)
    val schema = StructType(df.schema.fields ++ Seq(
      StructField(outCol, ArrayType(FloatType), nullable = true),
      StructField(outCol + "_tokens", LongType, nullable = false)))
    val srcIdx = df.schema.fieldIndex(srcCol)
    val enc = Encoders.row(schema)
    df.mapPartitions { iter =>
      iter.grouped(batch).flatMap { rows =>
        val (usable, skipped) = rows.zipWithIndex.partition { case (r, _) =>
          val t = r.getString(srcIdx)
          t != null && t.nonEmpty && t != "Error: Summary failed (llm)" &&
            t.trim.nonEmpty
        }
        val texts = usable.map(_._1.getString(srcIdx))
        val result =
          if (texts.isEmpty) EmbeddingResult(Seq.empty, 0L)
          else runtime.process(model, texts)
        tokenAcc.foreach(_.add(result.processedTokens))
        val embedded = usable.zip(result.embeddings).map {
          case ((r, i), e) =>
            val tokens = Tokenizer.countTokens(r.getString(srcIdx)).toLong
            i -> Row.fromSeq(r.toSeq :+ e :+ tokens)
        }
        val skippedRows = skipped.map { case (r, i) =>
          i -> Row.fromSeq(r.toSeq :+ null :+ 0L)
        }
        (embedded ++ skippedRows).sortBy(_._1).map(_._2)
      }
    }(enc)
  }

  /** Incremental re-embed: rows whose (id, text) match `prior` — the
    * previous run's [[embedColumn]] output — REUSE the prior vector;
    * only new or text-changed rows reach the runtime. Embedding is the
    * expensive stage of any corpus refresh (a model call per row vs a
    * join), and a weekly crawl typically changes a few percent of
    * documents — so production re-embeds incrementally or pays the
    * full-model bill weekly for identical outputs. The result is
    * BIT-IDENTICAL to a full re-embed for a deterministic runtime:
    * same text → same vector, so reuse is indistinguishable from
    * recompute, and the correctness face hash-checks exactly that.
    * Reference analog: the daemon's CDC stream embeds only changed
    * rows (`daemon/embedding_jobs.rs`); this is the batch spelling.
    *
    * Scale shape: one equi-join on the id (text equality decided next
    * to the join, no second pass), the runtime touches only the
    * changed slice, and neither side collects.
    */
  def embedColumnIncremental(df: DataFrame, idCol: String,
      srcCol: String, outCol: String, model: String,
      runtime: EmbeddingRuntime, prior: DataFrame, batchSize: Int = -1,
      tokenAcc: Option[LongAccumulator] = None): DataFrame = {
    val pr = prior.select(col(idCol).as("_pid"),
      col(srcCol).as("_ptext"), col(outCol).as("_pemb"),
      col(outCol + "_tokens").as("_ptok"))
    val joined = df.join(pr, col(idCol) === col("_pid"), "left")
    val keep = df.columns.map(col)
    val reuse = joined
      .where(col("_pid").isNotNull && (col(srcCol) <=> col("_ptext")))
      .select(keep :+ col("_pemb").as(outCol) :+
        col("_ptok").as(outCol + "_tokens"): _*)
    val fresh = joined
      .where(col("_pid").isNull || !(col(srcCol) <=> col("_ptext")))
      .select(keep: _*)
    embedColumn(fresh, srcCol, outCol, model, runtime, batchSize,
      tokenAcc).unionByName(reuse)
  }

  /** Eager end-to-end run mirroring `create_embeddings_from_db`:
    * returns the updated table plus (rows, tokens) usage — A5's
    * accounting (`daemon/embedding_jobs.rs:475-492`).
    */
  case class Usage(processedRows: Long, processedTokens: Long)

  def createEmbeddings(spark: SparkSession, df: DataFrame, pkCol: String,
      srcCol: String, outCol: String, model: String,
      runtime: EmbeddingRuntime, filter: Option[String] = None,
      limit: Option[Int] = None, batchSize: Int = -1)
      : (DataFrame, Usage) = {
    val acc = spark.sparkContext.longAccumulator(s"tokens_$outCol")
    val base = filter.fold(df)(f => df.where(expr(f)))
    val limited = limit.fold(base)(base.limit)
    // persisted: without it the count action AND the caller's first
    // action on `out` would BOTH run the embedding pass — double API
    // calls/billing on HTTP runtimes and a doubled token accumulator
    val embedded = embedColumn(limited, srcCol, outCol, model, runtime,
      batchSize, Some(acc))
      .where(col(outCol).isNotNull)
      .select(col(pkCol), col(outCol), col(outCol + "_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // merge back (J1): left join preserves unembedded rows with nulls
    val out = df.join(embedded, Seq(pkCol), "left")
    val rows = embedded.count() // one action; also materializes acc
    (out, Usage(rows, acc.value))
  }

  /** F1-analog SQL surface: register `text_embedding(model, text)` (and
    * the clip_text alias) for the runtimes that can run locally.
    */
  def register(spark: SparkSession): Unit = {
    val f = (model: String, text: String) =>
      ModelRegistry.get(model) match {
        case Some(mi) if mi.runtime == "hash" =>
          HashEmbeddingRuntime.embedOne(text, mi.dim)
        case Some(mi) =>
          throw new UnsupportedOperationException(
            s"runtime ${mi.runtime} needs external services; " +
              "use a hash/* model locally")
        case None =>
          throw new IllegalArgumentException(s"unknown model: $model")
      }
    spark.udf.register("text_embedding", f)
    spark.udf.register("clip_text",
      (text: String) => f("hash/bow-64", text))
  }
}
