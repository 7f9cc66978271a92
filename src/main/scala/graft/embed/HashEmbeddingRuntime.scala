package graft.embed

import graft.functions.TextHash

/** Deterministic no-network embedding model: normalized bag-of-words of
  * per-token pseudo-random unit directions (FIXTURES.md §2's
  * "hash-based pseudo-embedding"). Texts sharing tokens get high cosine
  * similarity, so semantic-shape tests (near-dup recovery, kNN) behave
  * like a real model while remaining bit-reproducible everywhere.
  * Failed/empty inputs yield the reference's failed sentinel
  * `[-1.0 x dim]` (`ort_runtime.rs:956-997`) so downstream jobs do not
  * reprocess them.
  */
object HashEmbeddingRuntime extends EmbeddingRuntime {
  override def name: String = "hash"

  override def dimOf(model: String): Int = ModelRegistry(model).dim

  def embedOne(text: String, dim: Int): Array[Float] = {
    val toks = Tokenizer.tokenize(text)
    if (toks.isEmpty) return Array.fill(dim)(-1.0f)
    val acc = new Array[Double](dim)
    toks.foreach { tok =>
      val base = TextHash.fnv1a(
        org.apache.spark.unsafe.types.UTF8String.fromString(tok))
      var j = 0
      while (j < dim) {
        // uniform in [-1, 1) from the j-th decorrelated hash
        val h = TextHash.hashWithSeed(base, j.toLong)
        acc(j) += (h.toDouble / Long.MaxValue.toDouble)
        j += 1
      }
    }
    val norm = math.sqrt(acc.map(x => x * x).sum)
    if (norm == 0.0) Array.fill(dim)(-1.0f)
    else acc.map(x => (x / norm).toFloat)
  }

  override def process(model: String, inputs: Seq[String])
      : EmbeddingResult = {
    val dim = dimOf(model)
    var tokens = 0L
    val embs = inputs.map { in =>
      tokens += Tokenizer.countTokens(if (in == null) "" else in)
      embedOne(if (in == null) "" else in, dim)
    }
    EmbeddingResult(embs, tokens)
  }
}

/** ONNX runtime surface (F1/F4-F6). The container has no onnxruntime
  * native library and no network egress, so session construction is a
  * clearly marked stub; the surrounding machinery — model registry,
  * pooling math (Pooling), memory-capped batch sizing
  * (maxBatchForMemory, the `ort_runtime.rs:362-442` formula), and the
  * pipeline plumbing — is real and unit-tested.
  */
object OnnxEmbeddingRuntime extends EmbeddingRuntime {
  override def name: String = "ort"
  override def dimOf(model: String): Int = ModelRegistry(model).dim

  /** Per-input transformer memory estimate: with L layers, N attention
    * heads of dimension Dh and sequence length S,
    * `((4·L·N²·Dh²) + L·N·S·(S+2·Dh)) · 8 bytes · 1.2 overhead`
    * (`ort_runtime.rs:370-399` get_required_memory; model term is
    * batch-independent).
    */
  def requiredMemoryBytes(seqLen: Long, heads: Long, headDim: Long,
      layers: Long = 12L): Long = {
    require(seqLen > 0 && heads > 0 && headDim > 0 && layers > 0,
      "seqLen/heads/headDim/layers must be positive")
    val model = 4.0 * layers * heads * heads * headDim * headDim
    val activations =
      layers.toDouble * heads * seqLen * (seqLen + 2.0 * headDim)
    ((model + activations) * 8.0 * 1.2).toLong
  }

  /** Max batch = `max(1, available / per-input-memory)`
    * (`ort_runtime.rs:401-442` chunk_session_input).
    */
  def maxBatchForMemory(availableBytes: Long, seqLen: Long, heads: Long,
      headDim: Long, layers: Long = 12L): Long =
    math.max(1L,
      availableBytes / requiredMemoryBytes(seqLen, heads, headDim, layers))

  override def process(model: String, inputs: Seq[String])
      : EmbeddingResult =
    throw new UnsupportedOperationException(
      "ONNX session unavailable in this environment (no onnxruntime " +
        "native lib, zero egress). Use runtime 'hash' for deterministic " +
        "local embedding; pooling math is in graft.embed.Pooling.")
}
