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

/** ONNX runtime surface (F1/F4-F6), implemented to the session seam
  * ([[OnnxSession]]): model-file resolution under
  * `-Dgraft.onnx.modelDir`, per-JVM session cache (the reference's
  * MODEL_INFO_MAP, `ort_runtime.rs:689-709`), tokenize → pad/truncate
  * → memory-capped batched run → pooling (`ort_runtime.rs:444-539`).
  * With the onnxruntime jar and a `.onnx` file present the reflective
  * session drives real inference (a deploy config change); in this
  * zero-egress sandbox the deterministic `.graftonnx` file session
  * exercises the identical code path, golden-vector-tested with the
  * reference's cosine-distance tolerance scheme
  * (`text_embedding_test.rs:71-131`).
  */
object OnnxEmbeddingRuntime extends EmbeddingRuntime {
  override def name: String = "ort"

  /** BERT-style special ids for the stand-in tokenizer framing. */
  private val ClsId = 101L
  private val SepId = 102L
  private val MaxSeqLen = 512

  def modelDir: String =
    System.getProperty("graft.onnx.modelDir",
      sys.env.getOrElse("GRAFT_ONNX_MODEL_DIR", "/tmp/graft-models"))

  // per-JVM session + tokenizer caches (lazily initialized on executors)
  @transient private lazy val sessions =
    new java.util.concurrent.ConcurrentHashMap[String, OnnxSession]()
  @transient private lazy val tokenizers =
    new java.util.concurrent.ConcurrentHashMap[String,
      Option[WordPieceTokenizer]]()

  private def sessionFor(model: String): OnnxSession =
    sessions.computeIfAbsent(model, m => OnnxSession.open(modelDir, m))

  /** The model's real HF tokenizer when its tokenizer.json ships next
    * to the model file (`ort_runtime.rs:328-343`); the regex stand-in
    * otherwise.
    */
  private def tokenizerFor(model: String): Option[WordPieceTokenizer] =
    tokenizers.computeIfAbsent(model, m => {
      val p = java.nio.file.Paths.get(
        s"$modelDir/${m.replace('/', '_')}.tokenizer.json")
      if (java.nio.file.Files.exists(p))
        Some(WordPieceTokenizer.fromFile(p.toString))
      else None
    })

  /** Registry dim when known, else the model file's declared hidden
    * dim (test models are not in the published registry).
    */
  override def dimOf(model: String): Int =
    ModelRegistry.get(model).map(_.dim)
      .getOrElse(sessionFor(model).hiddenDim)

  /** Token ids: the model's real WordPiece tokenizer when its
    * tokenizer.json is present, else CLS + hashed word ids + SEP from
    * the regex stand-in — identical shape either way, truncated to the
    * model max (`ort_runtime.rs:328-343`).
    */
  private[embed] def encode(model: String, text: String): Array[Long] =
    tokenizerFor(model) match {
      case Some(wp) => wp.encode(text, MaxSeqLen)
      case None =>
        val toks = Tokenizer.tokenize(if (text == null) "" else text)
          .take(MaxSeqLen - 2)
        val ids = new Array[Long](toks.length + 2)
        ids(0) = ClsId
        var i = 0
        while (i < toks.length) {
          val h = graft.functions.TextHash.fnv1a(
            org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)))
          ids(i + 1) = 999L + Math.floorMod(h, 29000L) // vocab-range ids
          i += 1
        }
        ids(ids.length - 1) = SepId
        ids
    }

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
      : EmbeddingResult = {
    val session = sessionFor(model)
    val pooling = ModelRegistry.get(model).map(_.pooling)
      .getOrElse(PoolingStrategy.MeanWithMask)
    val encoded = inputs.map(encode(model, _))
    var tokens = 0L
    encoded.foreach(ids => tokens += ids.length)
    // memory-capped micro-batches (ort_runtime.rs:401-442): registry
    // default capped by what the per-input activation estimate says
    // fits in a quarter of the current free heap
    val maxSeq = encoded.foldLeft(1)((m, e) => math.max(m, e.length))
    val memCap = maxBatchForMemory(
      Runtime.getRuntime.freeMemory() / 4, maxSeq, heads = 12,
      headDim = 64)
    val batchSize = math.max(1L,
      math.min(ModelRegistry.defaultBatchSize(model).toLong, memCap))
      .toInt
    val out = Seq.newBuilder[Array[Float]]
    encoded.grouped(batchSize).foreach { group =>
      // pad the batch to its longest sequence; mask marks real tokens
      val width = group.foldLeft(1)((m, e) => math.max(m, e.length))
      val ids = Array.ofDim[Long](group.length, width)
      val mask = Array.ofDim[Long](group.length, width)
      group.zipWithIndex.foreach { case (e, b) =>
        System.arraycopy(e, 0, ids(b), 0, e.length)
        java.util.Arrays.fill(mask(b), 0, e.length, 1L)
      }
      val hidden = session.run(ids, mask)
      val maskInt = mask.map(_.map(_.toInt))
      val pooled = pooling match {
        case PoolingStrategy.Cls => Pooling.cls(hidden)
        case PoolingStrategy.MeanWithMask =>
          Pooling.meanWithMask(hidden, maskInt)
        case PoolingStrategy.SpladeReluLogMax =>
          Pooling.spladeReluLogMax(hidden, maskInt)
      }
      out ++= pooled
    }
    EmbeddingResult(out.result(), tokens)
  }
}
