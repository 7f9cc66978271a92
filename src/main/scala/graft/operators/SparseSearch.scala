package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Learned-sparse ("SPLADE-style") retrieval over impact-quantized
  * postings — the lexical-learned counterpart of the dense ANN family.
  * Modern sparse retrievers serve a document as a small set of
  * (term-id, integer impact) pairs; scoring a query is a sum of
  * impacts over matching term ids. The ENGINE below is exactly that
  * serving shape; the impact model here is saturated log-tf (a
  * deterministic stand-in for model-produced impacts — swap
  * [[postings]]' weight expression for a model column and nothing else
  * changes). Complements BM25 (TextSearch): same posting-list scale
  * shape, but the document representation is a reusable sparse VECTOR
  * (hashed vocabulary, integer impacts) rather than per-query term
  * statistics.
  *
  * Scale shapes: postings are one exploded scan + a groupBy with
  * map-side combine (never a cross join); a query touches only its
  * own terms' posting rows (early `isin` filter — the posting-list
  * read pattern); the per-document score is one shuffle keyed by doc;
  * top-k is TakeOrderedAndProject. Integer impacts ("centinats",
  * floor(100·ln(1+tf)+0.5)) make every score an exact BIGINT — the
  * convention real impact indexes use, and what lets an independent
  * engine restate ranking hash-exactly.
  */
object SparseSearch {

  /** Default hashed-vocabulary size (2^16): small enough that a
    * per-term dictionary broadcasts, large enough that collisions are
    * rare on test corpora. Production corpora raise it; the engine is
    * size-agnostic.
    */
  val DefaultVocab = 1 << 16

  /** Impact-quantized hashed postings: one row per (document,
    * term-id) with integer impact w = floor(100·ln(1+tf)+0.5).
    * Term id = FNV-1a(token) mod vocab (non-negative); whitespace
    * tokenization, empty tokens dropped. Collisions merge their tf
    * BEFORE the log — the standard hashed-vocabulary semantics.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      vocab: Int = DefaultVocab): DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .where(col("tok") =!= "")
    toks
      .groupBy(col("id"),
        pmod(TextFunctions.fnv_hash(col("tok")), lit(vocab.toLong))
          .cast("int").as("idx"))
      .agg(count(lit(1)).as("tf"))
      .select(col("id"), col("idx"),
        floor(lit(100.0) * log(lit(1.0) + col("tf")) + lit(0.5))
          .cast("long").as("w"))
  }

  /** Postings folded to one sparse vector per document:
    * (id, indices ASC, parallel values) — the column representation
    * [[graft.functions.SparseDot]] consumes.
    */
  def sparseVectors(docs: DataFrame, idCol: String, textCol: String,
      vocab: Int = DefaultVocab): DataFrame =
    postings(docs, idCol, textCol, vocab)
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("idx"), col("w"))))
        .as("pairs"))
      .select(col("id"),
        col("pairs.idx").as("indices"),
        col("pairs.w").as("values"))

  /** Top-k documents for a bag-of-words query: score(d) =
    * Σ_t w(d, t) · idfq(t) over the query's distinct term ids, with
    * idfq = floor(100·ln(N/df)+0.5) (N = docs with ≥1 posting, df =
    * docs containing the term id; terms in every document score 0 and
    * terms in none contribute nothing). Ties break on ascending id.
    * Only query-term posting rows are read — the posting-list pattern
    * that keeps a 100 TB corpus query from scanning non-matching
    * terms at all.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queryWords: Seq[String], k: Int,
      vocab: Int = DefaultVocab): DataFrame = {
    require(queryWords.nonEmpty, "queryWords must be non-empty")
    val post = postings(docs, idCol, textCol, vocab)
    // driver-side term ids: same fnv + mod as the posting scan
    val qIdx = queryWords.distinct
      .map(wd => {
        val h = graft.functions.TextHash.fnv1a(
          org.apache.spark.unsafe.types.UTF8String.fromString(wd))
        (((h % vocab) + vocab) % vocab).toInt
      })
      .distinct
    val nDocs = post.select(col("id")).distinct().count()
    val dfT = post.where(col("idx").isin(qIdx.map(Int.box): _*))
      .groupBy(col("idx")).agg(countDistinct(col("id")).as("df"))
      .select(col("idx"),
        floor(lit(100.0) * log(lit(nDocs.toDouble) / col("df")) +
          lit(0.5)).cast("long").as("idfq"))
    post.where(col("idx").isin(qIdx.map(Int.box): _*))
      .join(broadcast(dfT), "idx")
      .groupBy(col("id"))
      .agg(sum(col("w") * col("idfq")).as("score"))
      .where(col("score") > 0)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }
}
