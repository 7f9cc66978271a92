package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextSearch
import OracleFrag.dkCos

/** Retrieval over the corpus: lexical BM25 ranking and hybrid
  * (BM25 + embedding-cosine) reciprocal-rank fusion — the text-search
  * half production retrieval pairs with the reference's vector search.
  */
object SearchQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Fixed bag-of-words query; all three words occur corpus-wide. The
    * per-word BM25 contributions are combined in THIS order on both
    * engines (conditional aggregates), keeping the double sum
    * partition-order-free.
    */
  private val QueryWords = Seq("table", "scan", "fast")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Okapi BM25 top-20 for the fixed query.
    "q_bm25_search" -> ((s, dir) =>
      TextSearch.bm25TopK(docs(s, dir), "doc_id", "text", QueryWords, 20)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("rnk"))),

    // Hybrid retrieval: BM25 and cosine top-50 lists fused by RRF
    // (c=60), fused top-20. Query vector = embedding of vec_id 0.
    "q_hybrid_rrf" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val qv = emb.where(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      TextSearch.hybridRrf(docs(s, dir), "doc_id", "text", QueryWords,
          emb, "vec_id", "embedding", qv)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("rrf").desc, col("doc_id"))
    }),

    // The query a RAG user actually runs: BM25 fused with vector
    // candidates served by the IVF INDEX (probed cells only — the
    // scan carries a cell_id PartitionFilter) instead of a full corpus
    // scan. Full probe ≡ exact cosine top-50, so the q_hybrid_rrf
    // oracle restates this face verbatim; at scale nprobe < nCells
    // trades recall for reading ~nprobe/nCells of the corpus.
    "q_hybrid_rrf_ivf" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = graft.operators.IvfIndex.build(
        emb, "vec_id", "embedding", nCells = 16, maxIter = 5)
      val ranked = graft.operators.IvfIndex.search(
        model, emb.where(col("vec_id") === 0), k = 50, nprobe = 16,
        metric = "cos")
        .select(col("nid").as("id"), col("rank").as("cos_rank"))
      TextSearch.hybridRrfRanked(docs(s, dir), "doc_id", "text",
          QueryWords, ranked)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("rrf").desc, col("doc_id"))
    })
  )

  /** BM25 pipeline CTEs, shared by both oracles. Every numeric literal
    * is CAST(... AS DOUBLE): DuckDB otherwise folds bare decimal
    * literals in exact DECIMAL arithmetic (1.2 + 1.0 = DECIMAL 2.2;
    * tf * 2.2 = exact 6.6 → cast once at the end), which is 1 ulp off
    * Spark's double-by-double fold for most tf values. The casts force
    * the identical per-op double sequence (k1 + 1.0, tf * k1p1, ...)
    * the Scala side computes.
    */
  private val words = QueryWords.map(w => s"'$w'").mkString(", ")
  private val condSum = QueryWords
    .map(w => s"coalesce(max(CASE WHEN word = '$w' THEN s END), 0.0)")
    .mkString(" + ")
  private val bm25Cte =
    s"""w AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS word
       |  FROM documents),
       |dl AS (SELECT id, count(*) AS len FROM w GROUP BY id),
       |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |  avg(len) AS avglen FROM dl),
       |tf AS (SELECT id, word, count(*) AS tf FROM w
       |  WHERE word IN ($words) GROUP BY id, word),
       |dfw AS (SELECT word, count(*) AS df_w FROM tf GROUP BY word),
       |sc AS (SELECT tf.id, tf.word,
       |  ln((n_docs - df_w + CAST(0.5 AS DOUBLE))
       |      / (df_w + CAST(0.5 AS DOUBLE)) + CAST(1.0 AS DOUBLE))
       |    * (tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
       |    / (tf + CAST(1.2 AS DOUBLE)
       |        * ((CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE))
       |          + CAST(0.75 AS DOUBLE) * len / avglen)) AS s
       |  FROM tf JOIN dfw USING (word) JOIN dl USING (id)
       |  CROSS JOIN stats),
       |agg AS (SELECT id, $condSum AS bm25 FROM sc GROUP BY id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_bm25_search" ->
      s"""WITH $bm25Cte,
         |t AS (SELECT id, bm25 FROM agg ORDER BY bm25 DESC, id LIMIT 20)
         |SELECT id AS doc_id,
         |  row_number() OVER (ORDER BY bm25 DESC, id) AS rnk,
         |  floor(bm25 * 10000 + 0.5) / 10000 AS bm25
         |FROM t ORDER BY rnk""".stripMargin,
    "q_hybrid_rrf" -> hybridRrfSql,
    // q_hybrid_rrf_ivf probes every cell (full probe ≡ exact cosine
    // top-50), so the exact-scan oracle restates it verbatim — the IVF
    // layer changes what the scan READS, never what the query returns.
    "q_hybrid_rrf_ivf" -> hybridRrfSql
  )

  private lazy val hybridRrfSql: String =
      s"""WITH $bm25Cte,
         |bt AS (SELECT id, bm25 FROM agg ORDER BY bm25 DESC, id LIMIT 50),
         |br AS (SELECT id,
         |  row_number() OVER (ORDER BY bm25 DESC, id) AS bm25_rank FROM bt),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cdist AS (SELECT vec_id AS id,
         |  ${dkCos("embedding", "qv")} AS cd FROM embeddings CROSS JOIN q),
         |ct AS (SELECT id, cd FROM cdist ORDER BY cd ASC, id LIMIT 50),
         |cr AS (SELECT id,
         |  row_number() OVER (ORDER BY cd ASC, id) AS cos_rank FROM ct),
         |f AS (SELECT coalesce(br.id, cr.id) AS id,
         |  coalesce(1.0 / (60 + br.bm25_rank), 0.0)
         |    + coalesce(1.0 / (60 + cr.cos_rank), 0.0) AS rrf,
         |  br.bm25_rank, cr.cos_rank
         |  FROM br FULL OUTER JOIN cr ON br.id = cr.id),
         |g AS (SELECT * FROM f ORDER BY rrf DESC, id LIMIT 20)
         |SELECT id AS doc_id, floor(rrf * 1000000 + 0.5) / 1000000 AS rrf,
         |  bm25_rank, cos_rank
         |FROM g ORDER BY rrf DESC, doc_id""".stripMargin
}
