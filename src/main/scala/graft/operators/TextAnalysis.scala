package graft.operators

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting.
  *
  * These are deliberately expressed as SQL templates rendered for two
  * dialects (Spark SQL and DuckDB) from ONE source, so the correctness
  * oracle runs the semantically identical computation — no UDFs, pure
  * engine-native functions (array lambdas + regex extraction), which in
  * Spark means whole-stage-codegen'd expressions over the parquet scan.
  */
object TextAnalysis {

  /** Engine dialect: function-name substitutions only. */
  case class Dialect(size: String, split: String, filter: String,
      varchar: String)
  val SparkDialect: Dialect = Dialect("size", "split", "filter", "STRING")
  val DuckDialect: Dialect =
    Dialect("len", "string_split", "list_filter", "VARCHAR")

  /** Small per-language stopword sets for the language-ID heuristic. */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ich", "mit",
      "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "est", "que", "pour",
      "dans"),
    "es" -> Seq("el", "los", "las", "una", "es", "por", "con", "para", "del",
      "como"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni", "ta", "men", "zhe", "na",
      "hao"))

  /** Count of words from `words` in the space-split lowered text. */
  private[operators] def stopCount(d: Dialect, words: Seq[String]): String = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    s"${d.size}(${d.filter}(${d.split}(lower(text), ' '), " +
      s"w -> w IN ($inList)))"
  }

  /** Per-document stats: char/token counts, BPE-ish token count,
    * punctuation count, English stopword count.
    * Portable regexes: no backslash classes (escaping rules differ
    * between the two parsers), single-space tokenization matches the
    * corpus format.
    */
  def statsSql(d: Dialect, table: String = "documents"): String =
    s"""SELECT doc_id, n_chars, length(text) AS text_len,
       | CASE WHEN length(trim(text)) = 0 THEN 0
       |      ELSE ${d.size}(${d.split}(trim(text), ' ')) END AS ws_tokens,
       | ${d.size}(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)) AS bpe_tokens,
       | ${d.size}(regexp_extract_all(text, '[.,!?;:]', 0)) AS punct,
       | ${stopCount(d, Stopwords.head._2)} AS en_stop
       |FROM $table ORDER BY doc_id""".stripMargin

  /** Composite quality score in [0,1]: token count, stopword density,
    * punctuation density, mean word length — the reference-style
    * length/punct/stopword ratios, fixed evaluation order for
    * cross-engine bit equality.
    */
  def qualitySql(d: Dialect, table: String = "documents"): String =
    s"""SELECT doc_id, quality
       |FROM ${qualityScored(d, table, "doc_id")}
       |ORDER BY doc_id""".stripMargin

  /** A subquery `(SELECT <carry cols>, quality FROM table) _q` scoring
    * every row with the composite quality metric — shared by
    * [[qualitySql]] and the adaptive per-source gate so both run the
    * byte-identical scoring expression in both engines.
    *
    * floor(x*1e4 + 0.5)/1e4 instead of round(x, 4): both engines then
    * use identical pure-double operations (their round() impls differ
    * in the last decimal for ~1 in 500 values).
    */
  private[operators] def qualityScored(d: Dialect, table: String,
      carryCols: String): String =
    s"""(SELECT $carryCols, floor((
       |  0.25 * least(CAST(ws AS DOUBLE) / 100, 1.0) +
       |  0.25 * (CASE WHEN ws = 0 THEN 0.0
       |          ELSE least(CAST(stop AS DOUBLE) * 5 / ws, 1.0) END) +
       |  0.25 * (1 - least(CAST(punct AS DOUBLE) * 10 / greatest(length(text), 1), 1.0)) +
       |  0.25 * least(CAST(length(replace(text, ' ', '')) AS DOUBLE) / greatest(ws, 1) / 8, 1.0)
       |) * 10000 + 0.5) / 10000 AS quality
       |FROM (
       |  SELECT $carryCols, text,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE ${d.size}(${d.split}(trim(text), ' ')) END AS ws,
       |    ${stopCount(d, Stopwords.head._2)} AS stop,
       |    ${d.size}(regexp_extract_all(text, '[.,!?;:]', 0)) AS punct
       |  FROM $table) _qi) _q""".stripMargin

  /** Stopword-voting language ID with a deterministic tie-break order
    * (en > de > fr > es > zh). Emits the per-language scores too.
    */
  def langidSql(d: Dialect, table: String = "documents"): String = {
    val scoreCols = Stopwords.map { case (lang, words) =>
      s"${stopCount(d, words)} AS s_$lang"
    }.mkString(",\n    ")
    val langs = Stopwords.map(_._1)
    val caseChain = langs.init.zipWithIndex.map { case (lang, idx) =>
      val rest = langs.drop(idx + 1)
      val conds = rest.map(o => s"s_$lang >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }.mkString("\n  ")
    s"""SELECT doc_id, lang,
       |  CASE $caseChain ELSE '${langs.last}' END AS pred,
       |  s_en, s_de, s_fr, s_es, s_zh
       |FROM (
       |  SELECT doc_id, lang,
       |    $scoreCols
       |  FROM $table) ORDER BY doc_id""".stripMargin
  }

  /** md5 fingerprint of whitespace-normalized lowered text. */
  def fingerprintSql(d: Dialect, table: String = "documents"): String =
    s"SELECT doc_id, md5(lower(trim(text))) AS fp FROM $table ORDER BY doc_id"
}
