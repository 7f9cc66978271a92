package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.embed.{EmbeddingPipeline, HashEmbeddingRuntime}
import graft.functions.{VectorFunctions => V}
import graft.operators.{Dedup, Knn}

/** Embedding-pipeline coverage (SURVEY §2.8 F1-F8, §3.1-3.2, A5 usage
  * metering, and the §2.12 search path) using the deterministic hash
  * runtime (no network in this environment; ONNX/API runtimes share the
  * identical pipeline code and are fake-transport-tested).
  */
object EmbedQueries {
  private implicit class ColName(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }

  private def embeddedDocs(s: SparkSession, dir: String): DataFrame =
    EmbeddingPipeline.embedColumn(
      Tables(s, dir, "documents").select($"doc_id", $"lang", $"text"),
      "text", "emb", "hash/bow-64", HashEmbeddingRuntime)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §3.2 headline: add an embedding column to a table (rows-only
    // check: bespoke hash model has no SQL equivalent). Exploded to
    // (doc_id, pos, val) for the gate comparator.
    "q_embed_docs" -> ((s, dir) =>
      embeddedDocs(s, dir)
        .select($"doc_id", posexplode($"emb"))
        .toDF("doc_id", "pos", "val")
        .orderBy($"doc_id", $"pos")),

    // A5: usage accounting — embeds, then aggregates the per-row token
    // counts the runtime reports. Oracle-checkable because the stand-in
    // tokenizer is the same regex the text-stats operator exposes.
    "q_embed_usage" -> ((s, dir) =>
      embeddedDocs(s, dir)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"), sum($"emb_tokens").as("tokens"))
        .orderBy($"lang")),

    // Semantic recall check: every n-gram-Jaccard near-dup pair is
    // embedding-close (cos_dist <= 0.1; measured max over true pairs
    // is 0.075 at sf0.1, so the filter keeps ALL of them and the
    // oracle is the plain Jaccard pair set). Distances are computed
    // only for the candidate pairs — no O(n²) join.
    "q_embed_dup_recovery" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val emb = docs.select($"doc_id",
        graft.functions.TextFunctions.hash_embedding($"text", 64)
          .as("emb"))
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, tau = 0.5)
      pairs
        .join(emb.select($"doc_id".as("i"), $"emb".as("ea")), "i")
        .join(emb.select($"doc_id".as("j"), $"emb".as("eb")), "j")
        .where(graft.functions.VectorFunctions
          .cos_dist($"ea", $"eb") <= 0.1)
        .select($"i", $"j")
        .orderBy($"i", $"j")
    }),

    // §2.12 search path: embed a query text, brute-force top-k over the
    // embedded corpus (rows-only: distances depend on the hash model).
    "q_embed_search" -> ((s, dir) => {
      val corpus = embeddedDocs(s, dir).select($"doc_id", $"emb")
      val qvec = HashEmbeddingRuntime.embedOne(
        "the fast key order sort table scan", 64)
      val queries = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(0L, qvec)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("emb",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)))))
      Knn.topK(corpus, queries, "doc_id", "emb", k = 10, "cos")
        .select($"nid", $"rank", round($"dist", 4).as("dist"))
        .orderBy($"rank")
    }),

    // F1 SQL surface: text_embedding(model, text) as a SQL function.
    "q_text_embedding_sql" -> ((s, dir) => {
      EmbeddingPipeline.register(s)
      Tables(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""SELECT doc_id,
              | round(vector_norm(text_embedding('hash/bow-64', text)), 4) AS nrm
              |FROM documents ORDER BY doc_id""".stripMargin)
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_embed_usage" ->
      """SELECT lang, count(*) AS n,
        | CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))) AS BIGINT) AS tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_embed_dup_recovery" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT DISTINCT doc_id, g FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ws)-1),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
        |  FROM w WHERE len(ws) >= 3)),
        |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i, j
        |FROM pairs JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j
        |WHERE CAST(c AS DOUBLE) / (ca.n + cb.n - c) >= 0.5
        |ORDER BY i, j""".stripMargin,
    // unit-normalized embeddings: norm is exactly 1 (float-rounded)
    "q_text_embedding_sql" ->
      "SELECT doc_id, 1.0 AS nrm FROM documents ORDER BY doc_id"
  )
}
