package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus term statistics over a document stream — the
  * streaming face of [[graft.operators.TextSearch]]'s BM25 corpus model
  * ((word, df, cf) + (N, avgdl)). A batch pipeline recomputes these from
  * scratch per corpus snapshot; a continuously-ingesting one maintains
  * them as running aggregates and rescoring picks up the newest state.
  *
  * Scale shape: one streaming aggregation keyed by word. State is one
  * row per DISTINCT word — bounded by vocabulary (Heaps' law: sublinear
  * in corpus size), not by stream length, so this holds on an unbounded
  * crawl where per-document state would not. Per-document word counts
  * are computed with array expressions BEFORE the aggregation (streaming
  * allows a single stateful agg), so each micro-batch shuffles one row
  * per (doc, distinct word), partial-aggregated map-side.
  */
object TermStatsStream {

  /** (word, df, cf): df = running count of documents containing the
    * word, cf = running total occurrences. Works identically on batch
    * and streaming inputs; on streams use Update/Complete output.
    */
  def termStats(docs: DataFrame, textCol: String): DataFrame = {
    val ws = split(trim(col(textCol)), " ")
    val perDoc = docs
      .where(length(trim(col(textCol))) > 0)
      .select(explode(transform(array_distinct(ws),
        w => struct(w.as("word"),
          size(filter(ws, x => x === w)).as("cnt")))).as("wc"))
      .select(col("wc.word"), col("wc.cnt"))
    perDoc.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("cnt")).as("cf"))
  }

  /** (n_docs, total_tokens, avgdl): the corpus-size side of the BM25
    * model, one running row. avgdl derives from the two counters, so
    * the stateful part is two longs.
    */
  def corpusSummary(docs: DataFrame, textCol: String): DataFrame = {
    val ws = split(trim(col(textCol)), " ")
    docs.where(length(trim(col(textCol))) > 0)
      .select(size(ws).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
      .select(col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") /
          col("n_docs").cast("double")).as("avgdl"))
  }
}
