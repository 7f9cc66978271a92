package graft.embed

/** Pluggable HTTP transport so the API runtimes are testable without
  * egress (this container has none) and swappable for a real client in
  * production. `post` returns the response body or throws.
  */
trait HttpTransport extends Serializable {
  def post(url: String, headers: Map[String, String], body: String): String
}

object HttpTransport {
  /** Default transport for a zero-egress environment. */
  val none: HttpTransport = new HttpTransport {
    override def post(url: String, headers: Map[String, String],
        body: String): String =
      throw new java.io.IOException(s"no network egress (POST $url)")
  }

  /** Retry wrapper: 5 attempts, linear 4 s backoff
    * (`embeddings/core/utils.rs:81-125`). Sleep injectable for tests.
    */
  def withRetry(t: HttpTransport, attempts: Int = 5, backoffMs: Long = 4000,
      sleep: Long => Unit = Thread.sleep): HttpTransport =
    new HttpTransport {
      override def post(url: String, headers: Map[String, String],
          body: String): String = {
        var last: Throwable = null
        var i = 0
        while (i < attempts) {
          try return t.post(url, headers, body)
          catch {
            case e: Throwable =>
              last = e
              i += 1
              if (i < attempts) sleep(backoffMs)
          }
        }
        throw last
      }
    }
}

/** Minimal JSON helpers for the API payloads (no external deps). */
private[embed] object MiniJson {
  def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def strArray(xs: Seq[String]): String =
    xs.map(x => "\"" + escape(x) + "\"").mkString("[", ",", "]")

  /** Extract all float arrays appearing under "embedding"-style keys:
    * parses `[[...],[...]]` blocks after the given key. Tolerant,
    * sufficient for the two API response shapes.
    */
  def floatArraysAfterKey(body: String, key: String): Seq[Array[Float]] = {
    val out = Seq.newBuilder[Array[Float]]
    var idx = body.indexOf("\"" + key + "\"")
    while (idx >= 0) {
      val open = body.indexOf('[', idx)
      if (open >= 0) {
        // find matching close bracket for possibly nested arrays
        var depth = 0
        var i = open
        var end = -1
        while (end < 0 && i < body.length) {
          body.charAt(i) match {
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        if (end > open) {
          val block = body.substring(open, end + 1)
          if (block.startsWith("[[")) {
            block.drop(1).dropRight(1).split("(?<=\\])\\s*,\\s*(?=\\[)")
              .foreach { arr =>
                out += arr.stripPrefix("[").stripSuffix("]").split(",")
                  .filter(_.trim.nonEmpty).map(_.trim.toFloat)
              }
          } else {
            out += block.stripPrefix("[").stripSuffix("]").split(",")
              .filter(_.trim.nonEmpty).map(_.trim.toFloat)
          }
        }
      }
      idx = body.indexOf("\"" + key + "\"", idx + 1)
    }
    out.result()
  }
}

/** OpenAI embeddings API runtime (F2, `lantern_extras/src/embeddings.rs:
  * 39-106`; `openai_runtime.rs`): inputs truncated at 8190 tokens, then
  * greedily packed into requests whose total stays under the same budget
  * (`openai_runtime.rs:48-70,179-247`).
  */
class OpenAiEmbeddingRuntime(transport: HttpTransport,
    baseUrl: String = "https://api.openai.com",
    apiKey: String = "", maxTokens: Int = 8190)
  extends EmbeddingRuntime {
  override def name: String = "openai"
  override def dimOf(model: String): Int = ModelRegistry(model).dim

  private val http = HttpTransport.withRetry(transport)

  // Real cl100k BPE when a ranks file is configured
  // (-Dgraft.tiktoken.path); regex stand-in otherwise. The reference
  // tokenizes OpenAI inputs with cl100k_base (`openai_runtime.rs:48-70`).
  // Each input is tokenized ONCE: truncateWithCount returns the cut
  // text plus its token count, and packing/usage reuse that count
  // (bytePairMerge dominates the hot path — no re-encoding).
  private def bpe: Option[BpeTokenizer] = BpeTokenizer.configured()
  private def prepare(s: String): (String, Int) = bpe match {
    case Some(t) => t.truncateWithCount(s, maxTokens)
    case None =>
      val cut = Tokenizer.truncate(s, maxTokens)
      (cut, Tokenizer.countTokens(cut))
  }

  override def process(model: String, inputs: Seq[String])
      : EmbeddingResult = {
    val apiModel = model.stripPrefix("openai/")
    val prepared = inputs.map(prepare)
    // greedy packing under the token budget on the precomputed counts
    val groups = Seq.newBuilder[Seq[(String, Int)]]
    var cur = Seq.newBuilder[(String, Int)]
    var curTokens = 0L
    var curEmpty = true
    prepared.foreach { case (in, t) =>
      if (!curEmpty && curTokens + t > maxTokens) {
        groups += cur.result(); cur = Seq.newBuilder[(String, Int)]
        curTokens = 0; curEmpty = true
      }
      cur += ((in, t)); curTokens += t; curEmpty = false
    }
    if (!curEmpty) groups += cur.result()
    var tokens = 0L
    val embs = Seq.newBuilder[Array[Float]]
    groups.result().foreach { groupWithCounts =>
      val group = groupWithCounts.map(_._1)
      tokens += groupWithCounts.map(_._2.toLong).sum
      val body = s"""{"model":"${MiniJson.escape(apiModel)}","input":${MiniJson.strArray(group)}}"""
      val resp = http.post(s"$baseUrl/v1/embeddings",
        Map("Authorization" -> s"Bearer $apiKey",
          "Content-Type" -> "application/json"), body)
      embs ++= MiniJson.floatArraysAfterKey(resp, "embedding")
    }
    val result = embs.result()
    require(result.size == inputs.size,
      s"API returned ${result.size} embeddings for ${inputs.size} inputs")
    EmbeddingResult(result, tokens)
  }
}

/** Cohere embeddings API runtime (F3, `embeddings.rs:108-132`): fixed
  * 96-input request chunks (`cohere_runtime.rs:139,170-189`).
  */
class CohereEmbeddingRuntime(transport: HttpTransport,
    baseUrl: String = "https://api.cohere.ai",
    apiKey: String = "", inputType: String = "search_query",
    chunkSize: Int = 96)
  extends EmbeddingRuntime {
  override def name: String = "cohere"
  override def dimOf(model: String): Int = ModelRegistry(model).dim

  private val http = HttpTransport.withRetry(transport)

  override def process(model: String, inputs: Seq[String])
      : EmbeddingResult = {
    val apiModel = model.stripPrefix("cohere/")
    var tokens = 0L
    val embs = Seq.newBuilder[Array[Float]]
    inputs.grouped(chunkSize).foreach { group =>
      tokens += group.map(Tokenizer.countTokens(_).toLong).sum
      val body = s"""{"model":"${MiniJson.escape(apiModel)}","input_type":"$inputType","texts":${MiniJson.strArray(group)}}"""
      val resp = http.post(s"$baseUrl/v1/embed",
        Map("Authorization" -> s"Bearer $apiKey",
          "Content-Type" -> "application/json"), body)
      embs ++= MiniJson.floatArraysAfterKey(resp, "embeddings")
    }
    val result = embs.result()
    require(result.size == inputs.size,
      s"API returned ${result.size} embeddings for ${inputs.size} inputs")
    EmbeddingResult(result, tokens)
  }
}
