package graft.embed

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** The ONNX session seam: what a loaded transformer model does —
  * `(input_ids, attention_mask) → hidden states (batch, seq, hidden)`,
  * the exact run contract of the reference's ort session
  * (`ort_runtime.rs:444-539` tokenize→run→pool).
  *
  * Two implementations:
  *  - [[OrtReflectiveSession]] drives a real `ai.onnxruntime` session
  *    via reflection, so production use needs only the onnxruntime jar
  *    on the classpath and a local `.onnx` model file — a deploy-time
  *    config change, zero code change (this sandbox has neither, so
  *    that path stays cold here);
  *  - [[GraftFileSession]] loads a tiny deterministic `.graftonnx`
  *    model file and computes position-dependent pseudo hidden states,
  *    so the ENTIRE pipeline (model file on disk → session → batching
  *    → padding → pooling) runs and is golden-vector-tested without
  *    egress.
  */
trait OnnxSession extends java.io.Closeable {
  /** Hidden dimension, or -1 when only the model registry knows it. */
  def hiddenDim: Int
  def run(inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]]
  override def close(): Unit = ()
}

object OnnxSession {

  /** Resolve a session for `model` under `modelDir`: a real `.onnx`
    * file (requires the onnxruntime jar), else a `.graftonnx`
    * deterministic model file. File name is the model name with '/'
    * flattened, mirroring the reference's data-path layout
    * (`ort_runtime.rs:318-343` model file resolution).
    */
  def open(modelDir: String, model: String): OnnxSession = {
    val base = s"$modelDir/${model.replace('/', '_')}"
    val onnx = Paths.get(s"$base.onnx")
    val graft = Paths.get(s"$base.graftonnx")
    if (Files.exists(onnx)) new OrtReflectiveSession(onnx.toString)
    else if (Files.exists(graft)) GraftFileSession.load(graft.toString)
    else throw new IllegalStateException(
      s"no model file for '$model' under $modelDir (looked for " +
        s"$base.onnx and $base.graftonnx); set -Dgraft.onnx.modelDir " +
        "or use runtime 'hash'")
  }
}

/** Real ONNX Runtime session, loaded reflectively so the library jar is
  * an optional runtime dependency (`ort_runtime.rs:318-360` session
  * build: input_ids + attention_mask → last_hidden_state).
  */
final class OrtReflectiveSession(modelPath: String) extends OnnxSession {
  private val envCls =
    try Class.forName("ai.onnxruntime.OrtEnvironment")
    catch {
      case _: ClassNotFoundException => throw new IllegalStateException(
        s"found $modelPath but ai.onnxruntime is not on the classpath; " +
          "add the onnxruntime jar to use real ONNX inference")
    }
  private val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
  private val env = envCls.getMethod("getEnvironment").invoke(null)
  private val session = envCls
    .getMethod("createSession", classOf[String])
    .invoke(env, modelPath)

  override def hiddenDim: Int = -1 // the model registry knows

  override def run(inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]] = {
    val create = tensorCls.getMethod("createTensor",
      envCls, classOf[Object])
    val ids = create.invoke(null, env, inputIds)
    val mask = create.invoke(null, env, attentionMask)
    try {
      val feeds = new java.util.HashMap[String, Object]()
      feeds.put("input_ids", ids)
      feeds.put("attention_mask", mask)
      val result = session.getClass
        .getMethod("run", classOf[java.util.Map[String, Object]])
        .invoke(session, feeds)
      try {
        val first = result.getClass.getMethod("get", classOf[Int])
          .invoke(result, Integer.valueOf(0))
        first.getClass.getMethod("getValue").invoke(first)
          .asInstanceOf[Array[Array[Array[Float]]]]
      } finally result.asInstanceOf[AutoCloseable].close()
    } finally {
      ids.asInstanceOf[AutoCloseable].close()
      mask.asInstanceOf[AutoCloseable].close()
    }
  }

  override def close(): Unit =
    session.asInstanceOf[AutoCloseable].close()
}

/** Deterministic model-file-backed session. File format (LE):
  * magic "GRFT0NNX" | hidden:i32 | seed:i64. Hidden state for a token
  * id at position t is a decorrelated splitmix64 stream mapped to
  * [-1, 1) — position-dependent, so CLS vs mean-mask vs SPLADE pooling
  * produce genuinely different, testable outputs.
  */
final class GraftFileSession(val hiddenDim: Int, seed: Long)
    extends OnnxSession {
  override def run(inputIds: Array[Array[Long]],
      attentionMask: Array[Array[Long]]): Array[Array[Array[Float]]] =
    inputIds.indices.toArray.map { b =>
      inputIds(b).indices.toArray.map { t =>
        val id = inputIds(b)(t)
        val out = new Array[Float](hiddenDim)
        if (attentionMask(b)(t) == 1L) {
          var h = 0
          while (h < hiddenDim) {
            val v = graft.functions.TextHash.hashWithSeed(
              id * 0x9e3779b97f4a7c15L + t, seed + h)
            out(h) = (v.toDouble / Long.MaxValue.toDouble).toFloat
            h += 1
          }
        }
        out
      }
    }
}

object GraftFileSession {
  private val Magic = "GRFT0NNX".getBytes("US-ASCII")

  def write(path: String, hidden: Int, seed: Long): Unit = {
    val buf = ByteBuffer.allocate(Magic.length + 4 + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic).putInt(hidden).putLong(seed)
    Files.write(Paths.get(path), buf.array())
  }

  def load(path: String): GraftFileSession = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](Magic.length)
    buf.get(magic)
    require(java.util.Arrays.equals(magic, Magic),
      s"$path is not a .graftonnx model file")
    new GraftFileSession(buf.getInt(), buf.getLong())
  }
}
