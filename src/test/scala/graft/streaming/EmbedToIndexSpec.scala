package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.{IvfIndex, Knn}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end composition of the reference's daemon workflow on this
  * engine's primitives: documents arrive as a stream → embedded per
  * micro-batch (deterministic hash model) → vectors ingested into the
  * durable IVF index → immediately searchable. This is CDC → embed →
  * index → search in one running pipeline, the complete
  * `add_embedding_job` + external-index story without an online ANN
  * server.
  */
class EmbedToIndexSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("embed2idx").toString

  test("streamed documents become searchable vectors: embed per batch " +
      "-> ingest into the index -> search finds the new docs") {
    implicit val sqlCtx = spark.sqlContext
    def embed(df: org.apache.spark.sql.DataFrame) =
      graft.embed.EmbeddingPipeline.embedColumn(
        df, "text", "embedding", "hash/bow-64",
        graft.embed.HashEmbeddingRuntime)
        .select($"doc_id", $"text", $"embedding")

    // resident corpus: 200 seed docs, indexed once
    val seed = (0 until 200)
      .map(i => (i.toLong, s"seed document number $i about topic ${i % 7}"))
      .toDF("doc_id", "text")
    val idx = tmp() + "/idx"
    IvfIndex.build(embed(seed), "doc_id", "embedding", nCells = 8,
      maxIter = 5, indexDir = Some(idx))

    // the stream: embed each arriving batch, then ingest the vectors
    val mem = MemoryStream[(Long, String)]
    val centroids = spark.read.parquet(s"$idx/_centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).map(_._2)
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", tmp())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          id: Long) =>
        VectorIngestStream.processBatch(embed(batch), id, centroids,
          "doc_id", "embedding", idx)
        ()
      }
      .start()
    val fresh = (1000 until 1050)
      .map(i => (i.toLong, s"fresh arrival number $i quite different"))
    mem.addData(fresh.take(25)); q.processAllAvailable()
    mem.addData(fresh.drop(25)); q.processAllAvailable()
    q.stop()

    // search with a fresh doc's own text: it must find itself at
    // rank 1 (identical text -> identical hash embedding -> dist 0)
    val model = VectorIngestStream.openModel(spark, idx, "doc_id",
      "embedding")
    assert(model.assigned.count() === 250)
    val queryDocs = Seq((1042L, "fresh arrival number 1042 quite different"))
      .toDF("doc_id", "text")
    val hits = IvfIndex.search(model, embed(queryDocs), k = 3,
      nprobe = 8)
    val top = hits.where($"rank" === 1)
      .select($"nid", $"dist").as[(Long, Double)].head()
    assert(top._1 === 1042L && top._2 === 0.0,
      s"fresh doc not found at rank 1: $top")
  }
}
