package graft.embed

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import scala.collection.immutable.ArraySeq
import scala.util.matching.Regex

/** Byte-level BPE tokenizer over tiktoken-format rank files — the
  * reference's OpenAI path tokenizes with cl100k_base
  * (`openai_runtime.rs:48-70` truncates at the cl100k token budget);
  * this is the real merge algorithm, so with a ranks file present the
  * token counts that drive usage metering (A5) and batch packing are
  * the model's own, not a regex approximation.
  *
  * The rank file format is public (`<base64(token bytes)> <rank>` per
  * line) and the greedy lowest-rank-pair merge is the published BPE
  * procedure: split text with the encoding's pre-tokenizer regex, then
  * for each piece repeatedly merge the adjacent byte-span pair with the
  * smallest rank until no adjacent pair is in the vocabulary. All 256
  * single bytes are ranked, so every input encodes (no UNK).
  */
final class BpeTokenizer(
    ranks: Map[ArraySeq[Byte], Int],
    pattern: Regex,
    specials: Map[String, Int]) extends Serializable {

  require(
    (0 until 256).forall(b => ranks.contains(ArraySeq(b.toByte))),
    "BPE ranks must contain all 256 single-byte tokens")

  @transient private lazy val idToBytes: Map[Int, ArraySeq[Byte]] =
    ranks.map(_.swap) ++ specials.map { case (s, id) =>
      id -> ArraySeq.unsafeWrapArray(s.getBytes(StandardCharsets.UTF_8))
    }

  /** Greedy BPE over one pre-token's bytes: start from single bytes,
    * repeatedly merge the adjacent pair whose concatenation has the
    * lowest rank. `parts(i)` holds span-start offsets; merging drops a
    * boundary. O(m²) worst case on an m-byte piece — pieces are short
    * (the pre-tokenizer splits on whitespace/category changes).
    */
  private def bytePairMerge(piece: Array[Byte]): Seq[Int] = {
    val whole = ranks.get(ArraySeq.unsafeWrapArray(piece))
    if (whole.isDefined) return Seq(whole.get)
    // boundaries: start offsets of current spans, plus end sentinel
    var bounds = Array.range(0, piece.length + 1)
    def rankOf(i: Int): Int = {
      // rank of merging span i with span i+1 (Int.MaxValue = no merge)
      if (i + 2 >= bounds.length) Int.MaxValue
      else ranks.getOrElse(
        ArraySeq.unsafeWrapArray(
          java.util.Arrays.copyOfRange(piece, bounds(i), bounds(i + 2))),
        Int.MaxValue)
    }
    var done = false
    while (!done && bounds.length > 2) {
      var best = Int.MaxValue
      var bestI = -1
      var i = 0
      while (i < bounds.length - 2) {
        val r = rankOf(i)
        if (r < best) { best = r; bestI = i }
        i += 1
      }
      if (bestI < 0) done = true
      else {
        val nb = new Array[Int](bounds.length - 1)
        System.arraycopy(bounds, 0, nb, 0, bestI + 1)
        System.arraycopy(bounds, bestI + 2, nb, bestI + 1,
          bounds.length - bestI - 2)
        bounds = nb
      }
    }
    (0 until bounds.length - 1).map { i =>
      ranks(ArraySeq.unsafeWrapArray(
        java.util.Arrays.copyOfRange(piece, bounds(i), bounds(i + 1))))
    }
  }

  /** Encode ignoring special tokens (tiktoken's encode_ordinary). */
  def encodeOrdinary(text: String): Seq[Int] =
    if (text == null || text.isEmpty) Seq.empty
    else pattern.findAllIn(text).toSeq.flatMap { piece =>
      bytePairMerge(piece.getBytes(StandardCharsets.UTF_8))
    }

  /** Encode with special-token recognition: occurrences of registered
    * special strings map to their fixed ids; the text between them is
    * BPE-encoded normally.
    */
  def encode(text: String): Seq[Int] = {
    if (text == null || text.isEmpty) return Seq.empty
    if (specials.isEmpty) return encodeOrdinary(text)
    val out = Seq.newBuilder[Int]
    var pos = 0
    while (pos < text.length) {
      // earliest next special occurrence at/after pos
      val next = specials.iterator
        .map { case (s, id) => (text.indexOf(s, pos), s, id) }
        .filter(_._1 >= 0)
        .minByOption(t => (t._1, -t._2.length))
      next match {
        case Some((at, s, id)) =>
          if (at > pos) out ++= encodeOrdinary(text.substring(pos, at))
          out += id
          pos = at + s.length
        case None =>
          out ++= encodeOrdinary(text.substring(pos))
          pos = text.length
      }
    }
    out.result()
  }

  /** Inverse of encode — bytes concatenate exactly (byte-level BPE is
    * lossless), decoded as UTF-8.
    */
  def decode(ids: Seq[Int]): String = {
    val buf = new java.io.ByteArrayOutputStream()
    ids.foreach { id =>
      val bs = idToBytes.getOrElse(id,
        throw new IllegalArgumentException(s"unknown token id $id"))
      buf.write(bs.toArray)
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  def countTokens(text: String): Int = encodeOrdinary(text).size

  /** Truncate to a token budget by slicing the encoded token stream —
    * exactly the reference's OpenAI behavior (encode, keep the first
    * 8190 tokens, decode). Byte-level BPE concatenation is lossless, so
    * the decoded prefix is always valid text; a single giant pre-token
    * (base64 blob, unbroken letter run) is cut mid-piece instead of
    * truncating to the empty string.
    */
  def truncate(text: String, maxTokens: Int): String = {
    val (t, _) = truncateWithCount(text, maxTokens)
    t
  }

  /** One-encode truncate + count: returns the (possibly cut) text and
    * its token count, so callers metering usage and packing batches
    * need not re-tokenize. If the token cut lands inside a multi-byte
    * UTF-8 sequence (single-byte tokens of an emoji, say), the cut
    * backs off token-by-token to the nearest clean code-point boundary
    * — the result is always a true character prefix of the input.
    */
  def truncateWithCount(text: String, maxTokens: Int): (String, Int) = {
    if (text == null || text.isEmpty) return (text, 0)
    val ids = encodeOrdinary(text)
    if (ids.size <= maxTokens) return (text, ids.size)
    var k = maxTokens
    while (k > 0) {
      val buf = new java.io.ByteArrayOutputStream()
      ids.take(k).foreach(id => buf.write(idToBytes(id).toArray))
      val bytes = buf.toByteArray
      if (endsOnCodePointBoundary(bytes))
        return (new String(bytes, StandardCharsets.UTF_8), k)
      k -= 1
    }
    ("", 0)
  }

  // true when the byte array does not end mid-way through a multi-byte
  // UTF-8 sequence
  private def endsOnCodePointBoundary(bytes: Array[Byte]): Boolean = {
    if (bytes.isEmpty) return true
    val last = bytes(bytes.length - 1) & 0xff
    if (last < 0x80) return true // ASCII tail
    // walk back to the sequence's start byte (<= 3 continuation bytes)
    var i = bytes.length - 1
    while (i >= 0 && (bytes(i) & 0xc0) == 0x80) i -= 1
    if (i < 0) return false // orphan continuation bytes
    val start = bytes(i) & 0xff
    val expected =
      if (start >= 0xf0) 4 else if (start >= 0xe0) 3
      else if (start >= 0xc0) 2 else return false
    bytes.length - i == expected
  }
}

object BpeTokenizer {

  /** cl100k_base pre-tokenizer regex (public, from the tiktoken
    * registry), in Java regex syntax. (?U) makes \s match Unicode
    * whitespace (U+00A0 etc.) like the reference tokenizer — Java's
    * default \s is ASCII-only.
    */
  val Cl100kPattern: Regex =
    ("""(?U)(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}""" +
      """| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+""").r

  /** cl100k_base special tokens (public registry constants). */
  val Cl100kSpecials: Map[String, Int] = Map(
    "<|endoftext|>" -> 100257,
    "<|fim_prefix|>" -> 100258,
    "<|fim_middle|>" -> 100259,
    "<|fim_suffix|>" -> 100260,
    "<|endofprompt|>" -> 100276)

  /** Load a tiktoken ranks file: one `base64(bytes) rank` pair per
    * line, blank lines ignored.
    */
  def fromRanksFile(path: String, pattern: Regex = Cl100kPattern,
      specials: Map[String, Int] = Cl100kSpecials): BpeTokenizer = {
    val ranks = Map.newBuilder[ArraySeq[Byte], Int]
    Files.readAllLines(Paths.get(path)).forEach { line =>
      val t = line.trim
      if (t.nonEmpty) {
        val sp = t.indexOf(' ')
        require(sp > 0, s"bad ranks line: $t")
        ranks += ArraySeq.unsafeWrapArray(
          Base64.getDecoder.decode(t.substring(0, sp))) ->
          t.substring(sp + 1).toInt
      }
    }
    new BpeTokenizer(ranks.result(), pattern, specials)
  }

  // Per-JVM memo: the ranks map is ~2M entries for cl100k; load once.
  @transient private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Option[BpeTokenizer]]()

  /** Resolve the tokenizer for a ranks file configured via
    * `-Dgraft.tiktoken.path` (production swap-in is a config change,
    * mirroring the ONNX seam). None when unconfigured/missing — callers
    * fall back to the regex stand-in.
    */
  def configured(): Option[BpeTokenizer] =
    sys.props.get("graft.tiktoken.path") match {
      case Some(p) =>
        memo.computeIfAbsent(p, path =>
          if (Files.isRegularFile(Paths.get(path)))
            Some(fromRanksFile(path))
          else None)
      case None => None
    }
}
