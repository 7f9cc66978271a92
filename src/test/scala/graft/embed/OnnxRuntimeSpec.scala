package graft.embed

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Golden-vector tests for the ONNX runtime seam, mirroring the
  * reference's scheme (`text_embedding_test.rs:71-131`): fixed input,
  * batch repetition, expected processed_tokens, and a cosine-distance
  * tolerance against checked-in expected vectors. Here the session is
  * the deterministic `.graftonnx` file model, which drives the same
  * resolution → tokenize → pad → batch → run → pool path a real
  * `.onnx` + onnxruntime jar would.
  */
class OnnxRuntimeSpec extends SparkSuite {

  private val modelName = "graft-test/tiny-8"
  private lazy val modelDir = {
    val dir = Files.createTempDirectory("onnx-models").toString
    GraftFileSession.write(s"$dir/graft-test_tiny-8.graftonnx", 8, 7L)
    System.setProperty("graft.onnx.modelDir", dir)
    dir
  }

  private def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
    }
    1.0 - dot / math.sqrt(na * nb)
  }

  // generated once from the deterministic model (seed 7, hidden 8);
  // regressions in tokenization, padding, session math, or pooling
  // all surface here
  private val goldenMyText = Array(-0.12223706f, -0.31911644f,
    0.3165723f, 0.016943663f, -0.20795947f, -0.17037754f, 0.104970604f,
    -0.048732493f)
  private val goldenOther = Array(-0.010812876f, -0.262561f,
    0.30585483f, -0.061929144f, -0.35035148f, -0.134761f, -0.02717807f,
    -0.29586446f)

  test("golden vectors with batch repetition and token accounting") {
    modelDir
    val batch = Seq.fill(4)("My text input") :+ "Another different document!"
    val out = OnnxEmbeddingRuntime.process(modelName, batch)
    // CLS + 3 tokens + SEP = 5 per repeat; 4+2=6 for the last input
    assert(out.processedTokens === 4 * 5 + 6)
    out.embeddings.take(4).foreach(e =>
      assert(cosDist(e, goldenMyText) < 1e-6))
    assert(cosDist(out.embeddings.last, goldenOther) < 1e-6)
    assert(out.embeddings.head.length === 8)
    assert(OnnxEmbeddingRuntime.dimOf(modelName) === 8)
  }

  test("padding is inert: mixed-length batch equals singleton runs") {
    modelDir
    val texts = Seq("short", "a much longer input with many more words " +
      "to force batch padding", "mid size text")
    val together = OnnxEmbeddingRuntime.process(modelName, texts).embeddings
    val separate = texts.map(t =>
      OnnxEmbeddingRuntime.process(modelName, Seq(t)).embeddings.head)
    together.zip(separate).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq) // bit-identical, not just close
    }
  }

  test("runs distributed through the embedding pipeline") {
    modelDir
    import spark.implicits._
    val docs = (0 until 50).map(i => (i.toLong, s"document number $i"))
      .toDF("id", "text")
    val out = EmbeddingPipeline.embedColumn(docs, "text", "emb",
      modelName, OnnxEmbeddingRuntime)
    assert(out.count() === 50)
    assert(out.select(size($"emb")).distinct().as[Int].collect().toSeq
      === Seq(8))
  }

  test("missing model file names the expected locations") {
    modelDir
    val e = intercept[IllegalStateException] {
      OnnxEmbeddingRuntime.process("graft-test/absent", Seq("x"))
    }
    assert(e.getMessage.contains("graft-test_absent.onnx"))
    assert(e.getMessage.contains(".graftonnx"))
  }

  test("model file format rejects foreign files") {
    val p = Files.createTempFile("bogus", ".graftonnx")
    Files.write(p, "not a model".getBytes)
    val e = intercept[IllegalArgumentException] {
      GraftFileSession.load(p.toString)
    }
    assert(e.getMessage.contains("not a .graftonnx"))
  }

  // A GENUINE .onnx model is checked in (src/test/resources/
  // graft-test_idmask-1.onnx, 373 bytes, hand-assembled protobuf per
  // the public onnx.proto schema: opset 11, Unsqueeze+Cast+Mul so
  // last_hidden_state[b][t][0] = input_ids[b][t] * attention_mask
  // [b][t]). This drives OnnxSession.open's REAL-model branch: when
  // the ai.onnxruntime jar is on the classpath the session must run
  // it and reproduce the id*mask arithmetic; in this zero-egress
  // sandbox (no jar) the seam must still RESOLVE the .onnx — proving
  // resolution prefers a real model over a .graftonnx — and fail with
  // the documented add-the-jar message, not a silent fallback.
  test("genuine .onnx drives the reflective ORT path (or gates on the jar)") {
    val dir = Files.createTempDirectory("onnx-real").toString
    val res = getClass.getResourceAsStream("/graft-test_idmask-1.onnx")
    assert(res != null, "checked-in ONNX model resource missing")
    Files.copy(res, java.nio.file.Paths.get(s"$dir/graft-test_idmask-1.onnx"))
    // a decoy .graftonnx alongside: the real model must win resolution
    GraftFileSession.write(s"$dir/graft-test_idmask-1.graftonnx", 8, 7L)
    val ortPresent =
      try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
      catch { case _: ClassNotFoundException => false }
    if (ortPresent) {
      val sess = OnnxSession.open(dir, "graft-test/idmask-1")
      try {
        val ids = Array(Array(3L, 5L, 9L), Array(2L, 4L, 0L))
        val mask = Array(Array(1L, 1L, 0L), Array(1L, 0L, 0L))
        val out = sess.run(ids, mask)
        for (b <- 0 until 2; t <- 0 until 3) {
          assert(out(b)(t).length === 1)
          assert(out(b)(t)(0) === (ids(b)(t) * mask(b)(t)).toFloat)
        }
      } finally sess.close()
    } else {
      val e = intercept[IllegalStateException] {
        OnnxSession.open(dir, "graft-test/idmask-1")
      }
      assert(e.getMessage.contains("onnxruntime is not on the classpath"),
        s"expected the documented jar gate, got: ${e.getMessage}")
      info("onnxruntime jar absent (zero-egress sandbox): asserted " +
        ".onnx resolution precedence + the documented jar gate; with " +
        "the jar on the classpath this test runs the real session")
    }
  }
}
