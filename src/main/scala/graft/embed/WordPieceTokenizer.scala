package graft.embed

import java.nio.file.{Files, Paths}

import graft.util.MiniJson

/** HuggingFace `tokenizer.json` WordPiece tokenizer — the reference
  * loads exactly this file per model (`ort_runtime.rs:328-343`
  * `Tokenizer::from_file`). Supports the BERT-family layout the ort
  * models ship: a WordPiece `model` (vocab, unk_token,
  * continuing_subword_prefix, max_input_chars_per_word), BERT
  * normalization (optional lowercasing), and whitespace+punctuation
  * pre-tokenization. Token ids produced here are the real model ids,
  * so usage metering and batch packing match what a production
  * deployment reports.
  */
final class WordPieceTokenizer(
    vocab: Map[String, Long],
    unkToken: String,
    subwordPrefix: String,
    maxInputCharsPerWord: Int,
    lowercase: Boolean) extends Serializable {

  private val unkId = vocab.getOrElse(unkToken,
    throw new IllegalArgumentException(s"vocab lacks unk token $unkToken"))
  val clsId: Long = vocab.getOrElse("[CLS]", -1L)
  val sepId: Long = vocab.getOrElse("[SEP]", -1L)

  /** BERT basic pre-tokenization: split on whitespace; punctuation
    * characters become standalone tokens.
    */
  private[embed] def preTokenize(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit =
      if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    val t = if (lowercase) text.toLowerCase(java.util.Locale.ROOT) else text
    t.foreach { c =>
      if (c.isWhitespace) flush()
      else if (!c.isLetterOrDigit) { flush(); out += c.toString }
      else cur.append(c)
    }
    flush()
    out.result()
  }

  /** Greedy longest-match-first WordPiece over one word: repeatedly
    * take the longest vocab entry (with the `##` continuation prefix
    * after the first piece); an unmatchable word maps to UNK whole.
    */
  private[embed] def wordPiece(word: String): Seq[Long] = {
    if (word.length > maxInputCharsPerWord) return Seq(unkId)
    val ids = Seq.newBuilder[Long]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var found = -1L
      while (end > start && found < 0) {
        val piece =
          (if (start > 0) subwordPrefix else "") + word.substring(start, end)
        vocab.get(piece) match {
          case Some(id) => found = id
          case None => end -= 1
        }
      }
      if (found < 0) return Seq(unkId) // whole word → UNK, as HF does
      ids += found
      start = end
    }
    ids.result()
  }

  def encodeWords(text: String): Seq[Long] =
    preTokenize(if (text == null) "" else text).flatMap(wordPiece)

  /** CLS + pieces + SEP, truncated to `maxLen` total. */
  def encode(text: String, maxLen: Int): Array[Long] = {
    val pieces = encodeWords(text).take(maxLen - 2)
    val ids = new Array[Long](pieces.length + 2)
    ids(0) = clsId
    var i = 0
    while (i < pieces.length) { ids(i + 1) = pieces(i); i += 1 }
    ids(ids.length - 1) = sepId
    ids
  }

  def countTokens(text: String): Int = encodeWords(text).size
}

object WordPieceTokenizer {

  /** Load a HuggingFace tokenizer.json. Only the WordPiece model type
    * is supported (the BERT-family ort models); anything else raises,
    * mirroring the reference's hard dependency on the file it ships.
    */
  def fromFile(path: String): WordPieceTokenizer = {
    val root = MiniJson.obj(MiniJson.parse(
      Files.readString(Paths.get(path))))
    val model = MiniJson.obj(root("model"))
    val tpe = model.get("type").map(MiniJson.str).getOrElse("WordPiece")
    require(tpe == "WordPiece",
      s"unsupported tokenizer model type '$tpe' in $path")
    val vocab = MiniJson.obj(model("vocab"))
      .map { case (k, v) => k -> MiniJson.long(v) }
    val unk = model.get("unk_token").map(MiniJson.str).getOrElse("[UNK]")
    val prefix = model.get("continuing_subword_prefix")
      .map(MiniJson.str).getOrElse("##")
    val maxChars = model.get("max_input_chars_per_word")
      .map(MiniJson.long(_).toInt).getOrElse(100)
    // a missing/null normalizer means NO normalization (cased model) —
    // only a normalizer object defaults its absent lowercase to true
    // (BertNormalizer's own default)
    val lowercase = root.get("normalizer") match {
      case Some(n: Map[_, _]) =>
        MiniJson.obj(n).get("lowercase") match {
          case Some(b: java.lang.Boolean) => b.booleanValue()
          case _ => true
        }
      case _ => false
    }
    new WordPieceTokenizer(vocab, unk, prefix, maxChars, lowercase)
  }
}
