package graft.embed

/** Batch result mirroring the reference's
  * `EmbeddingResult { embeddings, processed_tokens }`
  * (`lantern_cli/src/embeddings/core/runtime.rs:1-4`).
  */
case class EmbeddingResult(embeddings: Seq[Array[Float]],
    processedTokens: Long)

/** Runtime contract mirroring `EmbeddingRuntime` dispatch
  * (`embeddings/core/mod.rs:22-85`): a named model embeds a batch of
  * texts. Implementations must be Serializable (shipped to executors)
  * and keep any heavy state (sessions, HTTP clients) in lazily
  * initialized per-JVM singletons, matching the reference's
  * `MODEL_INFO_MAP` session cache (`ort_runtime.rs:689-709`).
  */
trait EmbeddingRuntime extends Serializable {
  def name: String
  def process(model: String, inputs: Seq[String]): EmbeddingResult
  def dimOf(model: String): Int
}

object EmbeddingRuntime {
  /** F8: `get_available_runtimes()` → ort, openai, cohere
    * (`lantern_extras/src/embeddings.rs:167-172`), plus the
    * deterministic test runtime.
    */
  val availableRuntimes: Seq[String] = Seq("ort", "openai", "cohere", "hash")

  def forName(name: String, transport: HttpTransport = HttpTransport.none)
      : EmbeddingRuntime = name match {
    case "hash" => HashEmbeddingRuntime
    case "ort" => OnnxEmbeddingRuntime
    case "openai" => new OpenAiEmbeddingRuntime(transport)
    case "cohere" => new CohereEmbeddingRuntime(transport)
    case other =>
      throw new IllegalArgumentException(s"unknown runtime: $other")
  }
}
