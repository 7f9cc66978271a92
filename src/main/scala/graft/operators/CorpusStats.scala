package graft.operators

import graft.operators.TextAnalysis.{Dialect, SparkDialect}

/** Corpus-level repetition and vocabulary statistics for training-data
  * QA — the Gopher/C4-style repetition signals (duplicate-word fraction,
  * top word/bigram share) plus whole-corpus vocabulary stats.
  *
  * Like [[TextAnalysis]], each statistic is ONE SQL template rendered for
  * Spark SQL and DuckDB, so the correctness oracle runs the identical
  * computation. On Spark every template compiles to scans + partial
  * aggregations (map-side combine on (doc_id, word) then doc_id), so the
  * shuffle carries one row per distinct word, not per token — the shape
  * that survives a 100 TB corpus.
  */
object CorpusStats {

  /** (doc_id, w) — one row per token. The LATERAL VIEW / unnest split is
    * the one structural (not just lexical) dialect difference.
    */
  private[operators] def explodeWords(d: Dialect, table: String): String =
    if (d == SparkDialect)
      s"SELECT doc_id, w FROM $table " +
        "LATERAL VIEW explode(split(trim(text), ' ')) _t AS w " +
        "WHERE length(trim(text)) > 0"
    else
      s"SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w " +
        s"FROM $table WHERE length(trim(text)) > 0"

  /** (doc_id, g) — one row per word bigram, space-joined. Docs with a
    * single word produce no rows (guarded: Spark's sequence(1, 0) would
    * step DOWNWARD, not return empty).
    */
  private def explodeBigrams(d: Dialect, table: String): String =
    if (d == SparkDialect)
      "SELECT doc_id, g FROM (SELECT doc_id, split(trim(text), ' ') AS ws " +
        s"FROM $table WHERE length(trim(text)) > 0) _s " +
        "LATERAL VIEW explode(transform(sequence(1, size(ws) - 1), " +
        "i -> element_at(ws, i) || ' ' || element_at(ws, i + 1))) _t AS g " +
        "WHERE size(ws) >= 2"
    else
      "SELECT doc_id, unnest(list_transform(range(1, len(ws)), " +
        "i -> ws[i] || ' ' || ws[i + 1])) AS g " +
        "FROM (SELECT doc_id, string_split(trim(text), ' ') AS ws " +
        s"FROM $table WHERE length(trim(text)) > 0) _s WHERE len(ws) >= 2"

  /** floor(x*1e4+0.5)/1e4 — the portable round (see TextAnalysis). */
  private def r4(x: String): String =
    s"floor(($x) * 10000 + 0.5) / 10000"

  /** Per-document repetition signals (Gopher-style): token count,
    * distinct words, duplicate-word fraction, top word share, top
    * bigram share. All ratios as CAST-to-DOUBLE divisions (DuckDB's
    * bare `1.0` is DECIMAL and would diverge).
    */
  def repetitionSql(d: Dialect, table: String = "documents"): String =
    s"""WITH wx AS (${explodeWords(d, table)}),
       |wc AS (SELECT doc_id, w, count(*) AS c FROM wx GROUP BY doc_id, w),
       |ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tokens,
       |  count(*) AS uniq_words, max(c) AS top_c
       |  FROM wc GROUP BY doc_id),
       |bx AS (${explodeBigrams(d, table)}),
       |bc AS (SELECT doc_id, g, count(*) AS c FROM bx GROUP BY doc_id, g),
       |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS bigrams,
       |  max(c) AS top_bc FROM bc GROUP BY doc_id)
       |SELECT ws.doc_id AS doc_id, tokens, uniq_words,
       |  ${r4("1 - CAST(uniq_words AS DOUBLE) / CAST(tokens AS DOUBLE)")} AS dup_word_frac,
       |  ${r4("CAST(top_c AS DOUBLE) / CAST(tokens AS DOUBLE)")} AS top_word_share,
       |  ${r4("CAST(top_bc AS DOUBLE) / CAST(bigrams AS DOUBLE)")} AS top_bigram_share
       |FROM ws JOIN bs ON ws.doc_id = bs.doc_id
       |ORDER BY ws.doc_id""".stripMargin

  /** Whole-corpus vocabulary stats in one row: vocabulary size, total
    * tokens, hapax legomena count, top word's share of all tokens.
    */
  def vocabSql(d: Dialect, table: String = "documents"): String =
    s"""WITH wx AS (${explodeWords(d, table)}),
       |wc AS (SELECT w, count(*) AS c FROM wx GROUP BY w)
       |SELECT count(*) AS vocab,
       |  CAST(sum(c) AS BIGINT) AS tokens,
       |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       |  ${r4("CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)")} AS top_share
       |FROM wc""".stripMargin

  /** Corpus top-k words by frequency, total order (count DESC, word) so
    * LIMIT is deterministic. On Spark: partial agg + TakeOrderedAndProject.
    */
  def topWordsSql(d: Dialect, table: String = "documents",
      k: Int = 20): String =
    s"""WITH wx AS (${explodeWords(d, table)})
       |SELECT w, count(*) AS c FROM wx GROUP BY w
       |ORDER BY c DESC, w LIMIT $k""".stripMargin
}
