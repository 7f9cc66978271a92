package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._

/** Column API for text hashing / fingerprinting (dedup suite). */
object TextFunctions {
  import VectorFunctions.{col => c, expr => e}

  def minhash_signature(tokens: Column, numHashes: Int = 128,
      seed: Long = 42L): Column =
    c(MinHashSignature(e(tokens), numHashes, seed))

  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))

  def rolling_fingerprint(text: Column, window: Int = 16): Column =
    c(RollingFingerprint(e(text), window))

  def cosine_lsh_bucket(vec: Column, numBits: Int = 16,
      seed: Long = 42L): Column =
    c(CosineLshBucket(e(vec), numBits, seed))

  /** Deterministic hash bag-of-words embedding as a projection
    * expression (bit-identical to HashEmbeddingRuntime.embedOne).
    */
  def hash_embedding(text: Column, dim: Int = 64): Column =
    c(HashEmbed(e(text), dim))

  /** Distinct word n-gram shingles of single-space-joined words.
    * Returns an empty array when there are fewer than n words.
    * Implemented as a Scala UDF: measured ~5x faster than the
    * equivalent transform/slice/concat_ws Catalyst HOF chain on the
    * dedup hot path (array HOFs re-copy per element).
    */
  def word_shingles(text: Column, n: Int): Column = {
    val shingleU = udf((t: String) => {
      if (t == null) Array.empty[String]
      else {
        val w = t.split(' ')
        if (w.length < n) Array.empty[String]
        else {
          val set = new scala.collection.mutable.LinkedHashSet[String]
          var i = 0
          while (i <= w.length - n) {
            set += w.slice(i, i + n).mkString(" "); i += 1
          }
          set.toArray
        }
      }
    })
    shingleU(text)
  }

  /** Distinct word-n-gram FNV-1a hashes (first-occurrence order), the
    * dedup chain's hot scan — a native expression over UTF-8 bytes (see
    * ShingleHashes). `coalesce` preserves the former UDF's null → empty
    * contract.
    */
  def shingle_hashes(text: Column, n: Int): Column =
    coalesce(c(ShingleHashes(e(text), n)),
      typedLit(Array.empty[Long]))

  /** Positional (non-deduped) word n-gram hashes — see [[GramHashes]]. */
  def gram_hashes(text: Column, n: Int): Column = c(GramHashes(e(text), n))

  /** Winnowing fingerprint selection over positional gram hashes — see
    * [[Winnow]]. Compose: `winnow(gram_hashes(text, k), w)`.
    */
  def winnow(hashes: Column, w: Int): Column = c(Winnow(e(hashes), w))

  /** FNV-1a of a string column — the sparse-retrieval term-id hash. */
  def fnv_hash(text: Column): Column = c(FnvHash(e(text)))

  /** Merge-pass dot product of two (sorted indices, integer values)
    * sparse vectors — see [[SparseDot]].
    */
  def sparse_dot(ia: Column, va: Column, ib: Column, vb: Column): Column =
    c(SparseDot(e(ia), e(va), e(ib), e(vb)))

  /** The reference's common embedding ignore filter, reusable:
    * `utils/mod.rs:37-39` — NOT NULL, non-empty, not the LLM error
    * sentinel.
    */
  def usable_text(c: Column): Column =
    c.isNotNull && c =!= "" && c =!= "Error: Summary failed (llm)"

  /** (name, builder) pairs — shared by [[register]] and
    * [[graft.GraftExtensions]], like VectorFunctions.builders.
    */
  private[graft] lazy val builders
      : Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> ((e: Seq[Expression]) => SimHash64(e.head)),
    // shingle_hashes(text[, n]) — n must be an INT literal (it shapes
    // the expression); a non-literal or wrong arity raises instead of
    // silently defaulting.
    "shingle_hashes" -> {
      (args: Seq[Expression]) => args match {
        case Seq(t) => ShingleHashes(t, 3)
        case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
          ShingleHashes(t, n)
        case other => throw new IllegalArgumentException(
          "shingle_hashes(text[, n]) requires 1-2 args with literal INT n, " +
            s"got ${other.size}")
      }
    },
    "rolling_fingerprint" -> ((e: Seq[Expression]) =>
      RollingFingerprint(e.head, 16)),
    "fnv_hash" -> ((e: Seq[Expression]) => FnvHash(e.head)),
    "sparse_dot" -> ((e: Seq[Expression]) =>
      SparseDot(e(0), e(1), e(2), e(3))),
    "hash_embedding" -> ((e: Seq[Expression]) => HashEmbed(e.head, 64)),
    "gram_hashes" -> {
      (args: Seq[Expression]) => args match {
        case Seq(t, org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _)) =>
          GramHashes(t, n)
        case other => throw new IllegalArgumentException(
          s"gram_hashes(text, n) requires literal INT n, got ${other.size} args")
      }
    },
    "winnow" -> {
      (args: Seq[Expression]) => args match {
        case Seq(h, org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _)) =>
          Winnow(h, w)
        case other => throw new IllegalArgumentException(
          s"winnow(hashes, w) requires literal INT w, got ${other.size} args")
      }
    })

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
