package graft.embed

/** Pooling strategy per model, mirroring the reference's selection table
  * (`ort_runtime.rs:281-301`).
  */
sealed trait PoolingStrategy
object PoolingStrategy {
  case object Cls extends PoolingStrategy
  case object MeanWithMask extends PoolingStrategy
  case object SpladeReluLogMax extends PoolingStrategy
}

case class ModelInfo(name: String, runtime: String, dim: Int,
    defaultBatchSize: Int, pooling: PoolingStrategy,
    visual: Boolean = false)

/** Model catalog = the reference's `MODEL_INFO_MAP`
  * (`ort_runtime.rs:281-301`), OpenAI models (`openai_runtime.rs:74-90`)
  * and Cohere models (`cohere_runtime.rs:77-109`); default batch sizes
  * from `embeddings/mod.rs:417-447` (see BASELINE.md).
  */
object ModelRegistry {
  import PoolingStrategy._

  val models: Seq[ModelInfo] = Seq(
    ModelInfo("clip/ViT-B-32-textual", "ort", 512, 2000, Cls),
    ModelInfo("clip/ViT-B-32-visual", "ort", 512, 50, Cls, visual = true),
    ModelInfo("BAAI/bge-small-en", "ort", 384, 300, Cls),
    ModelInfo("BAAI/bge-base-en", "ort", 768, 100, Cls),
    ModelInfo("BAAI/bge-large-en", "ort", 1024, 60, Cls),
    ModelInfo("jinaai/jina-embeddings-v2-small-en", "ort", 512, 500,
      MeanWithMask),
    ModelInfo("jinaai/jina-embeddings-v2-base-en", "ort", 768, 80,
      MeanWithMask),
    ModelInfo("intfloat/e5-base-v2", "ort", 768, 300, MeanWithMask),
    ModelInfo("intfloat/e5-large-v2", "ort", 1024, 100, MeanWithMask),
    ModelInfo("thenlper/gte-base", "ort", 768, 1000, MeanWithMask),
    ModelInfo("thenlper/gte-large", "ort", 1024, 800, MeanWithMask),
    ModelInfo("microsoft/all-MiniLM-L12-v2", "ort", 384, 1000,
      MeanWithMask),
    ModelInfo("microsoft/all-mpnet-base-v2", "ort", 768, 400,
      MeanWithMask),
    ModelInfo("multi-qa-mpnet-base-dot-v1", "ort", 768, 300, MeanWithMask),
    ModelInfo("naver/splade-v3", "ort", 30522, 150, SpladeReluLogMax),
    ModelInfo("openai/text-embedding-ada-002", "openai", 1536, 500, Cls),
    ModelInfo("openai/text-embedding-3-small", "openai", 1536, 500, Cls),
    ModelInfo("openai/text-embedding-3-large", "openai", 3072, 500, Cls),
    ModelInfo("cohere/embed-english-v3.0", "cohere", 1024, 5000, Cls),
    ModelInfo("cohere/embed-multilingual-v3.0", "cohere", 1024, 5000, Cls),
    ModelInfo("cohere/embed-english-light-v3.0", "cohere", 384, 5000, Cls),
    // deterministic no-network test model (FIXTURES.md §2)
    ModelInfo("hash/bow-64", "hash", 64, 1000, MeanWithMask),
    ModelInfo("hash/bow-128", "hash", 128, 1000, MeanWithMask))

  private val byName = models.map(m => m.name -> m).toMap

  def apply(model: String): ModelInfo = byName.getOrElse(model,
    throw new IllegalArgumentException(s"unknown model: $model"))
  def get(model: String): Option[ModelInfo] = byName.get(model)

  /** Default micro-batch size per model (`embeddings/mod.rs:417-447`);
    * 100 for unknown models, as in the reference.
    */
  def defaultBatchSize(model: String): Int =
    byName.get(model).map(_.defaultBatchSize).getOrElse(100)

  /** F7: `get_available_models(runtime)`. */
  def availableModels(runtime: Option[String] = None): Seq[ModelInfo] =
    runtime.fold(models)(r => models.filter(_.runtime == r))
}
