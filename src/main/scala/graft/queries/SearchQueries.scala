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

    // Learned-sparse postings (SparseSearch): hashed term ids (FNV-1a
    // mod 2^16) with integer impacts floor(100·ln(1+tf)+0.5) — the
    // serving format of SPLADE-style retrieval, every value an exact
    // BIGINT. The doc_id < 300 slice bounds the oracle's per-token
    // byte-fold cost at every SF.
    "q_sparse_postings" -> ((s, dir) =>
      graft.operators.SparseSearch.postings(
          docs(s, dir).where(col("doc_id") < 300), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("idx"))),

    // Sparse retrieval top-20: posting-list read (only query-term
    // rows), score = Σ impact·idf-impact, integer end to end.
    "q_sparse_search" -> ((s, dir) =>
      graft.operators.SparseSearch.topK(
          docs(s, dir).where(col("doc_id") < 300), "doc_id", "text",
          QueryWords, 20)
        .withColumnRenamed("id", "doc_id")),

    // The same query served from the DURABLE sparse inverted file:
    // bucket-partitioned postings + df sidecar; identical scoring
    // contract to q_sparse_search (shared oracle), but the scan reads
    // only the query terms' bucket partitions (PartitionFilters,
    // pinned in SparseIndexSpec).
    "q_sparse_indexed" -> ((s, dir) => {
      val sdocs = docs(s, dir).where(col("doc_id") < 300)
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/" +
        s"graft_sparseidx_${java.lang.ProcessHandle.current().pid()}_" +
        Integer.toHexString(dir.hashCode)
      val m = graft.operators.SparseIndex.build(sdocs, "doc_id",
        "text", idxDir)
      graft.operators.SparseIndex.search(m, QueryWords, 20)
        .withColumnRenamed("id", "doc_id")
    }),

    // Incremental sparse maintenance: build the inverted file over the
    // even half, APPEND the odd half under the frozen hash vocabulary
    // (arrivals land inside existing bucket= partitions; df sidecar
    // and n_docs refreshed from the batch alone — no posting rescan),
    // then search ⇒ identical scoring to the full-corpus build, so
    // the shared sparse oracle restates it. A fresh per-invocation
    // dir keeps repeated runs idempotent (append twice would
    // duplicate postings).
    "q_sparse_append" -> ((s, dir) => {
      val sdocs = docs(s, dir).where(col("doc_id") < 300)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_sparse_append").toString + "/idx"
      // 16 buckets for the 300-doc slice: bucket count sizes file
      // fan-out to the corpus (the full-corpus default is 64); the
      // scoring is bucket-count-invariant, so the oracle is unchanged
      val base = graft.operators.SparseIndex.build(
        sdocs.where(col("doc_id") % 2 === 0), "doc_id", "text", idxDir,
        nBuckets = 16)
      val m = graft.operators.SparseIndex.append(base,
        sdocs.where(col("doc_id") % 2 =!= 0), "doc_id", "text")
      graft.operators.SparseIndex.search(m, QueryWords, 20)
        .withColumnRenamed("id", "doc_id")
    }),

    // Takedown maintenance on the posting file: tombstone-delete every
    // 10th document (O(ids) sidecar, docs invisible immediately), then
    // COMPACT — which purges the postings AND recomputes df/n_docs
    // from the survivors (the Lucene delete-then-merge contract: idf
    // heals at the merge). Search afterwards must equal a fresh build
    // over the corpus minus the deleted docs, which is exactly what
    // the oracle restates.
    "q_sparse_delete" -> ((s, dir) => {
      val sdocs = docs(s, dir).where(col("doc_id") < 300)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_sparse_del").toString + "/idx"
      graft.operators.SparseIndex.build(sdocs, "doc_id", "text",
        idxDir, nBuckets = 16)
      graft.operators.SparseIndex.delete(s, idxDir,
        sdocs.where(col("doc_id") % 10 === 0).select(col("doc_id")))
      graft.operators.SparseIndex.compact(s, idxDir)
      val m = graft.operators.SparseIndex.load(s, idxDir)
      graft.operators.SparseIndex.search(m, QueryWords, 20)
        .withColumnRenamed("id", "doc_id")
    }),

    // Sparse file-debt maintenance: two appends leave one file per
    // touched bucket per batch; compact folds each bucket back to a
    // single file POSTINGS-LOCAL (no corpus re-tokenization, df
    // sidecar/meta copied through) behind the crash-safe two-rename
    // swap. Search after compact is a pure data move away from the
    // append search, so the shared full-corpus sparse oracle restates
    // it — the same lifecycle shape as q_ivf_compact_knn.
    "q_sparse_compact" -> ((s, dir) => {
      val sdocs = docs(s, dir).where(col("doc_id") < 300)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_sparse_cmpf").toString + "/idx"
      val base = graft.operators.SparseIndex.build(
        sdocs.where(col("doc_id") % 3 === 0), "doc_id", "text", idxDir,
        nBuckets = 16)
      val m1 = graft.operators.SparseIndex.append(base,
        sdocs.where(col("doc_id") % 3 === 1), "doc_id", "text")
      graft.operators.SparseIndex.append(m1,
        sdocs.where(col("doc_id") % 3 === 2), "doc_id", "text")
      graft.operators.SparseIndex.compact(s, idxDir)
      val m = graft.operators.SparseIndex.load(s, idxDir)
      graft.operators.SparseIndex.search(m, QueryWords, 20)
        .withColumnRenamed("id", "doc_id")
    }),

    // Pairwise sparse dot products via the SparseDot merge expression
    // over (sorted indices, values) columns — the similarity primitive
    // for sparse dedup/clustering; doc 0's vector against the slice.
    "q_sparse_dot" -> ((s, dir) => {
      val sv = graft.operators.SparseSearch.sparseVectors(
        docs(s, dir).where(col("doc_id") < 300), "doc_id", "text")
      val q = sv.where(col("id") === 0)
        .select(col("indices").as("qi"), col("values").as("qv"))
      sv.crossJoin(broadcast(q))
        .select(col("id").as("doc_id"),
          graft.functions.TextFunctions.sparse_dot(
            col("indices"), col("values"), col("qi"), col("qv"))
            .as("dot"))
        .where(col("dot") > 0 && col("doc_id") =!= 0)
        .orderBy(col("doc_id"))
    }),

    // THREE-way hybrid: BM25 + dense cosine + learned-sparse impact
    // branches fused by RRF — each branch reads only its own index
    // shape. Same doc_id < 300 slice as the sparse faces (bounds the
    // oracle's token byte-fold); every branch and the fusion restated.
    "q_hybrid_rrf_sparse" -> ((s, dir) => {
      val sdocs = docs(s, dir).where(col("doc_id") < 300)
      val semb = Tables(s, dir, "embeddings").where(col("vec_id") < 300)
      val qv = Tables(s, dir, "embeddings").where(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      TextSearch.hybridRrf3(sdocs, "doc_id", "text", QueryWords,
          semb, "vec_id", "embedding", qv)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("rrf").desc, col("doc_id"))
    }),

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
  private def bm25CteFor(where: String) =
    s"""w AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS word
       |  FROM documents$where),
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

  private lazy val bm25Cte = bm25CteFor("")

  /** FNV-1a over a token column as a DuckDB byte-fold: hex-decode the
    * UTF-8 bytes, fold xor-then-multiply with the 64-bit wraparound
    * emulated in HUGEINT (the technique the simhash oracle
    * established). Bit-identical to [[graft.functions.TextHash.fnv1a]].
    */
  private def fnvOf(tok: String): String = {
    val wrap = "((((CAST(xor(a, b) AS HUGEINT) * 1099511628211) % " +
      "18446744073709551616) + 18446744073709551616) % 18446744073709551616)"
    val step = s"CASE WHEN $wrap >= 9223372036854775808 " +
      s"THEN $wrap - 18446744073709551616 ELSE $wrap END"
    s"""list_reduce(list_prepend(CAST(-3750763034362895579 AS BIGINT),
       |    list_transform(range(1, octet_length(encode($tok))+1), i ->
       |      CAST(16*(instr('0123456789ABCDEF',
       |          substr(hex(encode($tok)), 2*i-1, 1))-1)
       |        + (instr('0123456789ABCDEF',
       |          substr(hex(encode($tok)), 2*i, 1))-1) AS BIGINT))),
       |  (a, b) -> CAST($step AS BIGINT))""".stripMargin
  }

  /** Shared sparse-postings restatement: tokenize, hash, mod 2^16,
    * group to (id, idx, tf), quantize impacts — mirrors
    * SparseSearch.postings over the same doc_id < 300 slice.
    */
  private lazy val sparseCte: String =
    s"""stoks AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents WHERE doc_id < 300 AND text IS NOT NULL),
       |snz AS (SELECT id, tok FROM stoks WHERE tok <> ''),
       |sfnv AS (SELECT id, ${fnvOf("tok")} AS h FROM snz),
       |stid AS (SELECT id,
       |  CAST(((h % 65536) + 65536) % 65536 AS INT) AS idx FROM sfnv),
       |spost AS (SELECT id, idx,
       |  CAST(floor(CAST(100.0 AS DOUBLE) * ln(CAST(1.0 AS DOUBLE)
       |    + count(*)) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS w
       |  FROM stid GROUP BY id, idx)""".stripMargin

  /** Sparse top-20 restatement — shared by q_sparse_search (direct)
    * and q_sparse_indexed (artifact-served): the inverted file changes
    * what the scan READS, never what the query returns.
    */
  private lazy val sparseSearchSql: String =
    s"""WITH $sparseCte,
       |qw AS (SELECT DISTINCT CAST(((${fnvOf("qtok")} % 65536)
       |    + 65536) % 65536 AS INT) AS idx
       |  FROM (SELECT unnest(['table', 'scan', 'fast']) AS qtok) _q),
       |n AS (SELECT CAST(count(DISTINCT id) AS DOUBLE) AS n_docs
       |      FROM spost),
       |dft AS (SELECT idx, count(DISTINCT id) AS df FROM spost
       |  WHERE idx IN (SELECT idx FROM qw) GROUP BY idx),
       |idf AS (SELECT idx,
       |  CAST(floor(CAST(100.0 AS DOUBLE) * ln(n_docs / df)
       |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS idfq
       |  FROM dft CROSS JOIN n),
       |sc AS (SELECT p.id, sum(p.w * idf.idfq) AS score
       |  FROM spost p JOIN idf ON idf.idx = p.idx GROUP BY p.id)
       |SELECT id AS doc_id, CAST(score AS BIGINT) AS score FROM sc
       |WHERE score > 0 ORDER BY score DESC, id LIMIT 20""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_sparse_postings" ->
      s"""WITH $sparseCte
         |SELECT id AS doc_id, idx, w FROM spost
         |ORDER BY doc_id, idx""".stripMargin,
    // artifact-served face: same scoring contract, same oracle
    "q_sparse_indexed" -> sparseSearchSql,
    "q_sparse_search" -> sparseSearchSql,
    // append face: build(half) + append(half) must equal the
    // full-corpus scoring — df/n_docs sidecar math included
    "q_sparse_append" -> sparseSearchSql,
    "q_sparse_compact" -> sparseSearchSql,
    // delete face: after the purge the artifact must score exactly as
    // a fresh build over the corpus minus the deleted docs — restated
    // by narrowing the shared CTE's corpus predicate
    "q_sparse_delete" -> sparseSearchSql.replace(
      "WHERE doc_id < 300 AND text IS NOT NULL",
      "WHERE doc_id < 300 AND doc_id % 10 <> 0 AND text IS NOT NULL"),
    "q_sparse_dot" ->
      s"""WITH $sparseCte,
         |q0 AS (SELECT idx, w FROM spost WHERE id = 0),
         |dots AS (SELECT p.id, sum(p.w * q0.w) AS dot
         |  FROM spost p JOIN q0 ON q0.idx = p.idx
         |  WHERE p.id <> 0 GROUP BY p.id)
         |SELECT id AS doc_id, CAST(dot AS BIGINT) AS dot FROM dots
         |WHERE dot > 0 ORDER BY doc_id""".stripMargin,
    "q_bm25_search" ->
      s"""WITH $bm25Cte,
         |t AS (SELECT id, bm25 FROM agg ORDER BY bm25 DESC, id LIMIT 20)
         |SELECT id AS doc_id,
         |  row_number() OVER (ORDER BY bm25 DESC, id) AS rnk,
         |  floor(bm25 * 10000 + 0.5) / 10000 AS bm25
         |FROM t ORDER BY rnk""".stripMargin,
    "q_hybrid_rrf_sparse" ->
      s"""WITH ${bm25CteFor(" WHERE doc_id < 300")},
         |$sparseCte,
         |bt AS (SELECT id, bm25 FROM agg ORDER BY bm25 DESC, id LIMIT 50),
         |br AS (SELECT id,
         |  row_number() OVER (ORDER BY bm25 DESC, id) AS bm25_rank FROM bt),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cdist AS (SELECT vec_id AS id,
         |  ${dkCos("embedding", "qv")} AS cd FROM embeddings CROSS JOIN q
         |  WHERE vec_id < 300),
         |ct AS (SELECT id, cd FROM cdist ORDER BY cd ASC, id LIMIT 50),
         |cr AS (SELECT id,
         |  row_number() OVER (ORDER BY cd ASC, id) AS cos_rank FROM ct),
         |qw AS (SELECT DISTINCT CAST(((${fnvOf("qtok")} % 65536)
         |    + 65536) % 65536 AS INT) AS idx
         |  FROM (SELECT unnest(['table', 'scan', 'fast']) AS qtok) _q),
         |n AS (SELECT CAST(count(DISTINCT id) AS DOUBLE) AS n_docs
         |      FROM spost),
         |dft AS (SELECT idx, count(DISTINCT id) AS df FROM spost
         |  WHERE idx IN (SELECT idx FROM qw) GROUP BY idx),
         |idf AS (SELECT idx,
         |  CAST(floor(CAST(100.0 AS DOUBLE) * ln(n_docs / df)
         |    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS idfq
         |  FROM dft CROSS JOIN n),
         |ssc AS (SELECT p.id, sum(p.w * idf.idfq) AS score
         |  FROM spost p JOIN idf ON idf.idx = p.idx GROUP BY p.id),
         |st AS (SELECT id, score FROM ssc WHERE score > 0
         |  ORDER BY score DESC, id LIMIT 50),
         |sr AS (SELECT id,
         |  row_number() OVER (ORDER BY score DESC, id) AS sparse_rank
         |  FROM st),
         |f AS (SELECT coalesce(br.id, cr.id, sr.id) AS id,
         |  coalesce(1.0 / (60 + br.bm25_rank), 0.0)
         |    + coalesce(1.0 / (60 + cr.cos_rank), 0.0)
         |    + coalesce(1.0 / (60 + sr.sparse_rank), 0.0) AS rrf,
         |  br.bm25_rank, cr.cos_rank, sr.sparse_rank
         |  FROM br FULL OUTER JOIN cr ON br.id = cr.id
         |  FULL OUTER JOIN sr ON coalesce(br.id, cr.id) = sr.id),
         |g AS (SELECT * FROM f ORDER BY rrf DESC, id LIMIT 20)
         |SELECT id AS doc_id, floor(rrf * 1000000 + 0.5) / 1000000 AS rrf,
         |  bm25_rank, cos_rank, sparse_rank
         |FROM g ORDER BY rrf DESC, doc_id""".stripMargin,
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
