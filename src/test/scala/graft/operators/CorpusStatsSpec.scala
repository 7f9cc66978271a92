package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  // doc 10: "a b a b a" — 5 tokens, 2 distinct, top word "a" x3,
  //         bigrams: "a b" x2, "b a" x2 → top bigram share 2/4.
  // doc 11: all-distinct words.
  // doc 12/13: share an 8-word span (passage dup); doc 13 also shares
  //            it with eval doc 97*... none here (contamination below).
  private val data = Seq(
    (10L, "a b a b a"),
    (11L, "one two three four five six seven eight nine ten"),
    (12L, "p1 p2 p3 p4 p5 p6 p7 p8 tail1 tail2"),
    (13L, "head1 p1 p2 p3 p4 p5 p6 p7 p8 tail3")
  )
  private def docs = data.toDF("doc_id", "text")

  private def sql(q: String) = {
    docs.createOrReplaceTempView("documents")
    spark.sql(q)
  }

  test("repetitionSql computes token, dup-word, top-share signals") {
    val r = sql(CorpusStats.repetitionSql(TextAnalysis.SparkDialect))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4),
          x.getDouble(5))).toMap
    assert(r(10L) === ((5L, 2L, 0.6, 0.6, 0.5)))
    val (tok, uniq, dupFrac, topW, _) = r(11L)
    assert(tok === 10L && uniq === 10L && dupFrac === 0.0 && topW === 0.1)
  }

  test("vocabSql counts vocabulary, tokens, hapax over the corpus") {
    val row = sql(CorpusStats.vocabSql(TextAnalysis.SparkDialect)).head()
    // tokens: 5 + 10 + 10 + 10 = 35; vocab: 2 + 10 + 10(p1..p8,tail1,2)
    //  + 2 new (head1, tail3) = 24; hapax: everything except a,b,p1..p8
    assert(row.getLong(1) === 35L)
    assert(row.getLong(0) === 24L)
    assert(row.getLong(2) === 14L)
  }

  test("topWordsSql is count-desc, word-asc deterministic") {
    val top = sql(CorpusStats.topWordsSql(TextAnalysis.SparkDialect, k = 3))
      .as[(String, Long)].collect()
    assert(top(0) === (("a", 3L)))
    assert(top(1) === (("b", 2L)))
    assert(top(2)._2 === 2L) // p1 (2 occurrences, first alphabetically)
    assert(top(2)._1 === "p1")
  }

  test("dupSpanStats flags the shared 8-gram passage only") {
    val r = SpanDedup.dupSpanStats(docs, "doc_id", "text", n = 8)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // doc 10 has <8 words → absent
    assert(!r.contains(10L))
    // doc 11: 3 distinct 8-grams, none shared
    assert(r(11L) === ((3L, 0L, 0.0)))
    // docs 12/13: 3 grams each, exactly one shared (p1..p8)
    assert(r(12L) === ((3L, 1L, 0.3333)))
    assert(r(13L) === ((3L, 1L, 0.3333)))
  }

  test("contamination: eval doc's grams hit in train docs") {
    val r = SpanDedup.contamination(docs, "doc_id", "text", n = 8,
        isEval = col("doc_id") === 12L)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(!r.contains(12L)) // eval rows excluded from output
    assert(r(11L) === ((3L, 0L, 0.0)))
    assert(r(13L) === ((3L, 1L, 0.3333))) // shares p1..p8 with eval
  }

  test("contamination above the eval-gram cap degrades to a shuffle " +
      "join (no forced broadcast) with identical results") {
    SpanDedup.evalGramCapOverride = Some(0L)
    // a broadcast HINT overrides autoBroadcastJoinThreshold, so turning
    // the threshold off makes any remaining broadcast in the plan a
    // forced one — exactly what the cap must prevent
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = SpanDedup.contamination(docs, "doc_id", "text", n = 8,
        isEval = col("doc_id") === 12L)
      val p = out.queryExecution.executedPlan.toString
      // the eval join is on the gram hash; nested cached relations may
      // legitimately contain broadcasts of id-flag sides
      assert(!"BroadcastHashJoin \\[gh".r.findAllIn(p).hasNext,
        s"capped eval set must not be force-broadcast:\n$p")
      assert("(SortMergeJoin|ShuffledHashJoin) \\[gh".r.findAllIn(p).hasNext,
        s"eval join must degrade to a shuffle join:\n$p")
      // the degraded plan is bloom-pruned: train grams that cannot hit
      // the eval set are dropped before the exchange
      assert(p.contains("bloom_might_contain"),
        s"capped plan must bloom-prune the train grams:\n$p")
      val r = out.collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
      assert(!r.contains(12L))
      assert(r(11L) === ((3L, 0L, 0.0)))
      assert(r(13L) === ((3L, 1L, 0.3333)))
    } finally {
      SpanDedup.evalGramCapOverride = None
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("explicit bloom strategy matches the broadcast plan's results") {
    val broadcastR = SpanDedup.contamination(docs, "doc_id", "text",
        n = 8, isEval = col("doc_id") === 12L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).toSet
    val bloomQ = SpanDedup.contamination(docs, "doc_id", "text", n = 8,
      isEval = col("doc_id") === 12L, strategy = "bloom")
    assert(bloomQ.queryExecution.executedPlan.toString
      .contains("bloom_might_contain"))
    val bloomR = bloomQ.collect().map(x => (x.getLong(0), x.getLong(1),
      x.getLong(2), x.getDouble(3))).toSet
    assert(bloomR === broadcastR)
  }
}
