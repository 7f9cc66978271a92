package graft.embed

/** BPE-ish regex tokenizer: alpha runs, digit runs, and single symbols.
  * This is the engine's stand-in for HuggingFace/tiktoken tokenization
  * (`ort_runtime.rs:328-343`, `openai_runtime.rs:48-70`); token counts
  * feed usage metering (A5) and must be deterministic and cheap. The
  * pattern intentionally matches the SQL-expressible one used by the
  * text-stats operators so usage numbers are oracle-checkable.
  */
object Tokenizer {
  private val pattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]".r

  def tokenize(text: String): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else pattern.findAllIn(text).toSeq

  def countTokens(text: String): Int = tokenize(text).size

  /** OpenAI-style truncation at a token budget
    * (`openai_runtime.rs:48-70`: cl100k truncate at 8190).
    */
  def truncate(text: String, maxTokens: Int): String = {
    val toks = tokenize(text)
    if (toks.size <= maxTokens) text
    else {
      // rebuild from the first maxTokens matches, preserving positions
      val it = pattern.findAllIn(text)
      var count = 0
      var end = 0
      while (it.hasNext && count < maxTokens) {
        it.next(); end = it.end; count += 1
      }
      text.substring(0, end)
    }
  }

  /** Greedy packing of inputs into groups whose total token count stays
    * under `budget` (`group_vectors_by_token_count`,
    * `openai_runtime.rs:179-209`). An input alone over budget forms its
    * own group (it is truncated upstream).
    */
  def groupByTokenBudget(inputs: Seq[String], budget: Int,
      count: String => Int = countTokens): Seq[Seq[String]] = {
    val groups = Seq.newBuilder[Seq[String]]
    var cur = Seq.newBuilder[String]
    var curTokens = 0L
    var curEmpty = true
    inputs.foreach { in =>
      val t = count(in)
      if (!curEmpty && curTokens + t > budget) {
        groups += cur.result(); cur = Seq.newBuilder[String]
        curTokens = 0; curEmpty = true
      }
      cur += in; curTokens += t; curEmpty = false
    }
    if (!curEmpty) groups += cur.result()
    groups.result()
  }
}
