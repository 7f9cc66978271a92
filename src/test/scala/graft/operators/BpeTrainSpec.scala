package graft.operators

import graft.SparkSuite

/** BPE vocabulary induction: merge learning against a single-node
  * reference implementation of the paper's algorithm, greedy fuse
  * semantics, tie determinism, and the exhaustion guard.
  */
class BpeTrainSpec extends SparkSuite {
  import spark.implicits._

  /** Reference single-node BPE (Sennrich 2016): word counts → repeat
    * (count pairs, argmax with (count desc, pair asc) tie-break,
    * fuse). Mirrors what learnMerges must distribute.
    */
  private def refMerges(corpus: Seq[String], m: Int)
      : Seq[(Int, String, String, Long)] = {
    val words = scala.collection.mutable.Map[Vector[String], Long]()
    for (t <- corpus; w <- "[a-z]+".r.findAllIn(t.toLowerCase))
      words(w.split("").toVector :+ BpeTrain.EndMark) =
        words.getOrElse(w.split("").toVector :+ BpeTrain.EndMark, 0L) + 1
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var cur = words.toMap
    for (r <- 1 to m if cur.exists(_._1.length > 1)) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- cur; i <- 0 until syms.length - 1)
        pairs((syms(i), syms(i + 1))) =
          pairs.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairs.nonEmpty) {
        val ((l, rr), c) = pairs.toSeq
          .minBy { case ((a, b), n) => (-n, a, b) }
        out += ((r, l, rr, c))
        cur = cur.toSeq.map { case (syms, n) =>
          (BpeTrain.fuse(syms, l, rr).toVector, n)
        }.groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }
      }
    }
    out.result()
  }

  test("fuse is left-to-right non-overlapping") {
    assert(BpeTrain.fuse(Seq("a", "a", "a"), "a", "a") ===
      Seq("aa", "a"))
    assert(BpeTrain.fuse(Seq("a", "a", "a", "a"), "a", "a") ===
      Seq("aa", "aa"))
    assert(BpeTrain.fuse(Seq("x", "a", "b", "y", "a", "b"), "a", "b") ===
      Seq("x", "ab", "y", "ab"))
    assert(BpeTrain.fuse(Seq("a"), "a", "a") === Seq("a"))
  }

  test("learned merges match the reference on a known corpus") {
    val corpus = Seq(
      "low low low low low", "lower lower", "newest newest newest",
      "newest newest newest", "widest widest widest",
      "The lowest newest widest low")
    for (m <- Seq(1, 5, 12)) {
      val expected = refMerges(corpus, m)
      val got = BpeTrain.learnMerges(corpus.toDF("text"), "text", m)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSeq
      assert(got === expected, s"m=$m")
    }
  }

  test("determinism under ties: equal-count pairs resolve lexically") {
    // "ab" and "cd" both appear exactly 3 times; (a,b) must win round
    // 1 over (c,d) by pair order, never by partition order
    val corpus = Seq("ab cd", "ab cd", "ab cd")
    val got = BpeTrain.learnMerges(corpus.toDF("text"), "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val ref = refMerges(corpus, 2).map(t => (t._2, t._3))
    assert(got === ref)
    assert(got.head === (("a", "b")))
  }

  test("exhaustion: more merges requested than exist stops cleanly") {
    val got = BpeTrain.learnMerges(Seq("ab ab").toDF("text"), "text", 50)
      .collect()
    // "ab</w>" fully fuses in 2 merges; afterwards every word is one
    // symbol and no pair remains
    assert(got.length === 2)
  }

  test("tokenize applies merges in rank order and round-trips words") {
    val corpus = Seq("banana bandana", "banana banana")
    val merges = BpeTrain.learnMerges(corpus.toDF("text"), "text", 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = BpeTrain.tokenize(
      Seq((1L, "banana bandana")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .orderBy("pos").collect().map(_.getString(2))
    // concatenating tokens restores the words (markers delimit)
    assert(toks.mkString.replace(BpeTrain.EndMark, " ").trim ===
      "banana bandana")
  }
}
