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

  /** Distinct word n-gram shingles of single-space-joined words.
    * Returns an empty array when there are fewer than n words.
    */
  def word_shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    when(size(words) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n))))))
  }

  /** The reference's common embedding ignore filter, reusable:
    * `utils/mod.rs:37-39` — NOT NULL, non-empty, not the LLM error
    * sentinel.
    */
  def usable_text(c: Column): Column =
    c.isNotNull && c =!= "" && c =!= "Error: Summary failed (llm)"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    one("simhash64", e => SimHash64(e.head))
    one("rolling_fingerprint", e => RollingFingerprint(e.head, 16))
  }
}
