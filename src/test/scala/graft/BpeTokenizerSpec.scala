package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

import graft.embed.{BpeTokenizer, Tokenizer}

/** Byte-level BPE over a hand-built mini ranks file in the public
  * tiktoken format: ranks 0-255 are the single bytes, then a few
  * merges whose greedy lowest-rank-first order is derived by hand in
  * each case. The algorithm (not the vocab) is what production swaps
  * in via -Dgraft.tiktoken.path with a real cl100k_base file.
  */
class BpeTokenizerSpec extends AnyFunSuite {

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  // 256 single bytes at rank=byte value, then merged tokens.
  private val merges = Seq(
    "he" -> 256, "the" -> 258, " t" -> 259, "er" -> 260,
    "in" -> 261, " the" -> 262, "re" -> 263)

  private lazy val tok: BpeTokenizer = {
    val lines = (0 until 256).map { b =>
      Base64.getEncoder.encodeToString(Array(b.toByte)) + " " + b
    } ++ merges.map { case (s, r) => s"${b64(s)} $r" }
    val f = Files.createTempFile("mini", ".tiktoken")
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    BpeTokenizer.fromRanksFile(f.toString)
  }

  private def r(s: String): Int = s.getBytes(StandardCharsets.UTF_8)(0) & 0xff

  test("single merge chain: 'the' -> [the]") {
    // pairs: th(none), he(256) -> t|he; then t+he = the(258) -> [258]
    assert(tok.encodeOrdinary("the") == Seq(258))
  }

  test("greedy lowest-rank order: 'there' -> [the, re]") {
    // he(256) first, then the(258), then re(263)
    assert(tok.encodeOrdinary("there") == Seq(258, 263))
  }

  test("pre-tokenizer keeps leading space with word: ' the' -> [' the']") {
    // piece " the": pairs " t"(259), th(none), he(256) -> he merges
    // first, then " t"+"he"? " the"(262) needs spans [" t","he"]:
    // after he: ' ','t',"he"; pairs: " t"(259), t+he=the(258) ->
    // the(258) merges; then " "+"the" = " the"(262)
    assert(tok.encodeOrdinary(" the") == Seq(262))
  }

  test("unmergeable bytes fall back to singles") {
    assert(tok.encodeOrdinary("xz") == Seq(r("x"), r("z")))
  }

  test("decode inverts encode, including multi-byte UTF-8") {
    val s = "héllo the winter\nrain"
    assert(tok.decode(tok.encodeOrdinary(s)) == s)
  }

  test("special tokens map to fixed ids and split the text") {
    val ids = tok.encode("xz<|endoftext|>the")
    assert(ids == Seq(r("x"), r("z"), 100257, 258))
    assert(tok.decode(ids) == "xz<|endoftext|>the")
  }

  test("countTokens matches encodeOrdinary length") {
    val s = "in the winter there"
    assert(tok.countTokens(s) == tok.encodeOrdinary(s).size)
  }

  test("truncate slices the encoded stream (reference behavior)") {
    // "the the" -> ids [the, " the"] (2 tokens)
    assert(tok.truncate("the the", 1) == "the")
    assert(tok.truncate("the the", 2) == "the the")
    assert(tok.truncate("the the", 0) == "")
    assert(tok.countTokens(tok.truncate("there there there", 3)) <= 3)
    // a single giant piece is cut MID-piece, not dropped to ""
    assert(tok.truncate("xxxxx", 2) == "xx")
    // a cut landing inside a multi-byte char backs off to a clean
    // code-point boundary: each emoji is 4 single-byte tokens
    assert(tok.truncate("🙂🙂", 5) == "🙂")
    val (t, n) = tok.truncateWithCount("🙂🙂", 5)
    assert(t == "🙂" && n == 4)
  }

  test("cl100k pre-tokenizer: contractions, digits in <=3 runs, spaces") {
    val pieces = BpeTokenizer.Cl100kPattern.findAllIn("don't pay 12345")
      .toSeq
    assert(pieces == Seq("don", "'t", " pay", " ", "123", "45"))
    // (?U): unicode whitespace (NBSP) is \s, so it splits punctuation
    // runs instead of joining them (ASCII-only \s would tile
    // "! !" as one punctuation piece)
    assert(BpeTokenizer.Cl100kPattern.findAllIn("!\u00A0!").toSeq ==
      Seq("!", "\u00A0", "!"))
  }

  test("all-256-byte invariant is enforced") {
    val missing = (0 until 255).map { b =>
      Base64.getEncoder.encodeToString(Array(b.toByte)) + " " + b
    }
    val f = Files.createTempFile("bad", ".tiktoken")
    Files.write(f,
      missing.mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    intercept[IllegalArgumentException] {
      BpeTokenizer.fromRanksFile(f.toString)
    }
  }

  test("groupByTokenBudget packs with a custom counter") {
    val groups = Tokenizer.groupByTokenBudget(
      Seq("the", "the", "xz"), budget = 2, tok.countTokens _)
    // the(1) + the(1) = 2 fits; xz(2) starts a new group
    assert(groups == Seq(Seq("the", "the"), Seq("xz")))
  }

  test("configured() resolves via system property and memoizes") {
    val f = Files.createTempFile("cfg", ".tiktoken")
    val lines = (0 until 256).map { b =>
      Base64.getEncoder.encodeToString(Array(b.toByte)) + " " + b
    }
    Files.write(f, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    val old = sys.props.get("graft.tiktoken.path")
    try {
      sys.props("graft.tiktoken.path") = f.toString
      val t1 = BpeTokenizer.configured()
      assert(t1.isDefined)
      assert(BpeTokenizer.configured().get eq t1.get)
    } finally {
      old match {
        case Some(v) => sys.props("graft.tiktoken.path") = v
        case None => sys.props.remove("graft.tiktoken.path")
      }
    }
  }
}
