package graft.embed

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** WordPiece parity with the HF tokenizer.json contract the reference
  * depends on (`ort_runtime.rs:328-343`): greedy longest-match-first,
  * `##` continuation pieces, whole-word UNK fallback, BERT
  * normalization/pre-tokenization, CLS/SEP framing + truncation.
  */
class WordPieceTokenizerSpec extends AnyFunSuite {

  // a miniature but structurally faithful tokenizer.json
  private val tokenizerJson =
    """{
      |  "version": "1.0",
      |  "normalizer": {"type": "BertNormalizer", "lowercase": true},
      |  "pre_tokenizer": {"type": "BertPreTokenizer"},
      |  "model": {
      |    "type": "WordPiece",
      |    "unk_token": "[UNK]",
      |    "continuing_subword_prefix": "##",
      |    "max_input_chars_per_word": 100,
      |    "vocab": {
      |      "[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3,
      |      "un": 5, "##aff": 6, "##able": 7, "##ably": 8,
      |      "affable": 9, "the": 10, "quick": 11, "fox": 12,
      |      "!": 13, ",": 14, "run": 15, "##ning": 16, "12": 17,
      |      "##3": 18
      |    }
      |  }
      |}""".stripMargin

  private lazy val tok = {
    val p = Files.createTempFile("tok", ".json")
    Files.writeString(p, tokenizerJson)
    WordPieceTokenizer.fromFile(p.toString)
  }

  test("greedy longest-match with ## continuations") {
    // "unaffable" → un + ##aff + ##able (the canonical WordPiece example)
    assert(tok.encodeWords("unaffable") === Seq(5L, 6L, 7L))
    // longest match wins at word start: "affable" is whole-word in vocab
    assert(tok.encodeWords("affable") === Seq(9L))
    assert(tok.encodeWords("running") === Seq(15L, 16L))
  }

  test("whole word falls back to UNK when any piece is missing") {
    assert(tok.encodeWords("unknownword") === Seq(1L))
    // HF semantics: the WHOLE word is UNK even if a prefix matched
    assert(tok.encodeWords("unx") === Seq(1L))
  }

  test("normalization and pre-tokenization: lowercase, punct split") {
    assert(tok.encodeWords("The QUICK fox!") ===
      Seq(10L, 11L, 12L, 13L))
    assert(tok.preTokenize("quick,fox") === Seq("quick", ",", "fox"))
    assert(tok.encodeWords("123") === Seq(17L, 18L))
  }

  test("missing/null normalizer means a cased model (no lowercasing)") {
    val cased = tokenizerJson.replace(
      """"normalizer": {"type": "BertNormalizer", "lowercase": true},""",
      """"normalizer": null,""")
    val p = Files.createTempFile("tok-cased", ".json")
    Files.writeString(p, cased)
    val ct = WordPieceTokenizer.fromFile(p.toString)
    // vocab has only lowercase entries: cased input must NOT match
    assert(ct.encodeWords("The QUICK fox") === Seq(1L, 1L, 12L))
    assert(ct.encodeWords("the quick fox") === Seq(10L, 11L, 12L))
  }

  test("encode frames with CLS/SEP and truncates at maxLen") {
    assert(tok.encode("the quick fox", 512).toSeq ===
      Seq(2L, 10L, 11L, 12L, 3L))
    assert(tok.encode("the quick fox", 4).toSeq === Seq(2L, 10L, 11L, 3L))
    assert(tok.countTokens("the quick fox!") === 4)
  }

  test("ort runtime picks up a model's tokenizer.json when present") {
    val dir = Files.createTempDirectory("wp-models").toString
    GraftFileSession.write(s"$dir/wp-test_m8.graftonnx", 8, 3L)
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/wp-test_m8.tokenizer.json"),
      tokenizerJson)
    val old = System.getProperty("graft.onnx.modelDir")
    System.setProperty("graft.onnx.modelDir", dir)
    try {
      // real-vocab ids 2,10,11,12,3 → 5 processed tokens, not the
      // regex stand-in's count
      val out = OnnxEmbeddingRuntime.process("wp-test/m8",
        Seq("the quick fox"))
      assert(out.processedTokens === 5)
      assert(out.embeddings.head.length === 8)
      assert(OnnxEmbeddingRuntime.encode("wp-test/m8", "the quick fox")
        .toSeq === Seq(2L, 10L, 11L, 12L, 3L))
    } finally {
      if (old != null) System.setProperty("graft.onnx.modelDir", old)
      else System.clearProperty("graft.onnx.modelDir")
    }
  }
}
