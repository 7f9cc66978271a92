package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, PipelineOps => PO, TextAnalysis => TA}

/** Training-data pipeline composition queries: rule-based quality
  * gating, sequence packing, domain mixing, PII redaction, and the
  * diameter-robust connected-components variant.
  */
object PipelineQueries {

  private def viaSql(s: SparkSession, dir: String, table: String,
      sql: String): DataFrame = {
    Tables(s, dir, table).createOrReplaceTempView(table)
    s.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gopher-style rule gate: token count / word shape / stopword /
    // symbol thresholds → keep flag. Scan + codegen'd expressions only.
    "q_gopher_quality" -> ((s, dir) =>
      viaSql(s, dir, "documents", PO.gopherQualitySql(TA.SparkDialect))),

    // Tokenize-and-pack bookkeeping: per-source running token offsets
    // → fixed-length sequence ids. One window shuffle per shard key.
    "q_seq_pack" -> ((s, dir) =>
      viaSql(s, dir, "documents", PO.seqPackSql(TA.SparkDialect))),

    // Deterministic domain mixture: per-source keep rates via a
    // multiplicative-hash uniform — idempotent sampling at any scale.
    "q_domain_mix" -> ((s, dir) =>
      viaSql(s, dir, "documents", PO.domainMixSql(TA.SparkDialect))),

    // PII scrub: digit-run masking + email-shaped token counts.
    "q_pii_redact" -> ((s, dir) =>
      viaSql(s, dir, "customer", PO.piiRedactSql(TA.SparkDialect))),

    // Sliding-window chunking (RAG primitive): shuffle-free scan +
    // explode; chunk text and token spans per document.
    "q_chunk_docs" -> ((s, dir) =>
      viaSql(s, dir, "documents", PO.chunkSql(TA.SparkDialect))),

    // Adaptive quality gate: keep the top half per source by composite
    // quality, thresholded by rank (exact integer decision).
    "q_adaptive_gate" -> ((s, dir) =>
      viaSql(s, dir, "documents", PO.adaptiveGateSql(TA.SparkDialect))),

    // CC-Net-style bigram-LM scoring: fit on the doc_id%10<3 slice,
    // score every doc by mean NLL (integer 1e-4-nat aggregation).
    "q_lm_perplexity" -> ((s, dir) =>
      viaSql(s, dir, "documents", PO.lmPerplexitySql(TA.SparkDialect))),

    // Duplicate clusters via alternating large-star/small-star — the
    // O(log² n)-round path for high-diameter dup graphs. Same pair
    // graph and same oracle as q_dedup_components (both converge to
    // component-min labels; only the round structure differs).
    "q_dedup_components_lss" -> ((s, dir) => {
      import s.implicits._
      Dedup.connectedComponentsAlternating(
        Dedup.jaccardPairs(Tables(s, dir, "documents"), "doc_id", "text",
          n = 3, tau = 0.5))
        .withColumnRenamed("id", "doc_id")
        .orderBy($"doc_id")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_gopher_quality" -> PO.gopherQualitySql(TA.DuckDialect),
    "q_seq_pack" -> PO.seqPackSql(TA.DuckDialect),
    "q_domain_mix" -> PO.domainMixSql(TA.DuckDialect),
    "q_pii_redact" -> PO.piiRedactSql(TA.DuckDialect),
    "q_chunk_docs" -> PO.chunkSql(TA.DuckDialect),
    "q_adaptive_gate" -> PO.adaptiveGateSql(TA.DuckDialect),
    "q_lm_perplexity" -> PO.lmPerplexitySql(TA.DuckDialect),
    "q_dedup_components_lss" -> DocumentQueries.componentsOracleSql
  )
}
