package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding VOCABULARY INDUCTION — learning the merge table
  * from a corpus (Sennrich/Haddow/Birch 2016, the algorithm behind
  * every GPT/LLaMA-family tokenizer vocabulary). The repo's embedding
  * stack APPLIES a pretrained rank table (`embed/HttpRuntimes` cl100k);
  * this operator is the other half a training-data pipeline needs:
  * derive the ranks from YOUR corpus.
  *
  * Algorithm: collapse the corpus to a (word, count) table once; a
  * word is a symbol sequence (its characters, plus the `</w>`
  * end-of-word marker so learned units can't span word boundaries —
  * the paper's formulation). Each round counts adjacent symbol pairs
  * weighted by word count, picks the most frequent (ties broken by
  * the pair's lexicographic order, so the result is deterministic),
  * and rewrites every word with that pair's left-to-right
  * non-overlapping occurrences fused into one symbol.
  *
  * 100 TB posture: the corpus is touched EXACTLY ONCE (the word-count
  * groupBy — shuffle output is vocabulary-bounded, Zipf-small next to
  * the corpus). Every merge round then runs on the cached word table:
  * one explode+groupBy whose key space is the pair vocabulary, a
  * 1-row argmax to the driver (the only driver state: one pair per
  * round), and a map over words. Rounds are inherently sequential —
  * that is the algorithm, not a Spark limitation; per-round cost is
  * independent of corpus size. The word table is re-cached and its
  * lineage truncated every few rounds so plan depth stays bounded at
  * merge counts in the thousands.
  */
object BpeTrain {

  /** End-of-word marker; a literal from the paper. Kept out of the
    * letter alphabet by construction (words are `[a-z]+` tokens).
    */
  val EndMark = "</w>"

  /** Left-to-right non-overlapping fuse of (l, r) in `syms` — the
    * paper's merge step: scan once; at a match consume both symbols,
    * else consume one. ("a a a" under (a,a) → "aa a", not "a aa".)
    */
  private[operators] def fuse(syms: Seq[String], l: String, r: String)
      : Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `numMerges` merges from `textCol`. Words are the lowercased
    * `[a-z]+` runs of the text (digits/punctuation excluded so the
    * symbol alphabet is closed under the oracle's restatement).
    * Returns one row per learned merge:
    * (merge_rank, lhs, rhs, pair_count) — rank 1-based in learn
    * order, pair_count the count that won the round.
    */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
      minWordLen: Int = 1): DataFrame = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges must be in [1, 65536], got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._

    // the single corpus-sized pass: corpus → (word, count)
    val toSyms = udf((w: String) =>
      w.split("").toSeq.filter(_.nonEmpty) :+ EndMark)
    var words = docs
      .select(explode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("w"))
      .where(length($"w") >= minWordLen)
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .select(toSyms($"w").as("syms"), $"cnt")
      .persist()
    words.count()

    val fuseUdf = udf((syms: Seq[String], l: String, r: String) =>
      fuse(syms, l, r))
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    var prev = words
    while (round <= numMerges && !exhausted) {
      // pair stats: key space = the current pair vocabulary, shuffled
      // as (pair, partial count) — never word- or corpus-sized rows
      // adjacent pairs: slice element i (0-based) is syms[i], its
      // right neighbour syms[i + 1] ([] is 0-based in Spark SQL)
      val best = words
        .select(explode(expr(
          "transform(slice(syms, 1, size(syms) - 1)," +
            " (s, i) -> struct(s as l, syms[i + 1] as r))")).as("pr"),
          $"cnt")
        .groupBy($"pr.l", $"pr.r").agg(sum($"cnt").as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val Row(l: String, r: String, c: Long) = best(0)
        merges += ((round, l, r, c))
        words = words
          .select(fuseUdf($"syms", lit(l), lit(r)).as("syms"), $"cnt")
        // truncate lineage every few rounds: each round stacks a UDF
        // projection, and analysis cost would grow quadratically by
        // the hundreds of merges — but materializing EVERY round pays
        // a job per merge, so re-running <=3 vocabulary-bounded map
        // passes inside the next census is the cheaper side of the
        // trade
        if (round % 4 == 0 || round == numMerges) {
          val cp = words.localCheckpoint(eager = true)
          prev.unpersist()
          prev = cp
          words = cp
        }
        round += 1
      }
    }
    prev.unpersist()
    words.unpersist()
    merges.result()
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** Tokenize `textCol` with a learned merge table: per word, apply
    * the merges in rank order (the paper's inference rule — rank
    * order, not greedy-longest), then emit the symbol sequence.
    * Returns (id, pos, token). The merge table is collected (it is
    * numMerges rows, driver-bounded by construction) and broadcast
    * inside the UDF closure.
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val applyAll = udf((w: String) => {
      var syms: Seq[String] =
        w.split("").toSeq.filter(_.nonEmpty) :+ EndMark
      merges.foreach { case (l, r) =>
        if (syms.length > 1) syms = fuse(syms, l, r)
      }
      syms
    })
    docs
      .select(col(idCol).as("id"), posexplode(expr(
        s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as(
        Seq("wpos", "w")))
      .select($"id", $"wpos", posexplode(applyAll($"w")).as(
        Seq("spos", "token")))
      .select($"id",
        ($"wpos" * 1000 + $"spos").as("pos"), $"token")
  }
}
