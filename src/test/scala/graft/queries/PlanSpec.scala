package graft.queries

import graft.SparkSuite
import graft.SparkEntry

/** Guards the plan shapes the engine is designed around: filters and
  * projections reaching the parquet scan, small dims broadcast, partial
  * (map-side) aggregation before exchanges, TakeOrderedAndProject for
  * global top-k. A regression here is a scale regression even when
  * results stay correct.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String = {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString
  }

  test("filters and column pruning reach the parquet scan") {
    val p = plan("q_filter_pushdown")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("EqualTo(o_orderstatus,F)"))
    assert(p.contains("GreaterThan(o_totalprice,50000.0)"))
    // only the 3 needed columns are read
    assert(p.contains(
      "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>"))
  }

  test("star join broadcasts all three dimension tables") {
    val p = plan("q_star_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("semi join is a broadcast left-semi") {
    val p = plan("q_semi_join")
    assert(p.contains("LeftSemi"))
    assert(p.contains("Broadcast"))
  }

  test("pricing summary does map-side partial aggregation") {
    val p = plan("q_pricing_summary")
    assert(p.contains("partial_"))
  }

  test("global top-k plans as TakeOrderedAndProject") {
    val p = plan("q_topk_global")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("kNN aggregates partially before the shuffle, queries broadcast") {
    val p = plan("q_knn")
    assert(p.contains("partial_topk_by_score") ||
      "ObjectHashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("resample pushes the key predicate to the events scan and " +
      "windows once per frame direction, never re-scanning") {
    val p = plan("q_gap_fill")
    // user_id < 40 must reach parquet: at 100 TB the grid math runs
    // over 40 users' rows, not the full event stream
    assert(p.contains("LessThan(user_id,40)"))
    // one window (the LOCF carry-forward); the events file is read
    // exactly twice (observation collapse + span), both filtered
    assert("Window".r.findAllIn(p).size >= 1)
  }

  test("data checks fold every row-local metric into one scan and " +
      "broadcast the referential dims") {
    val p = plan("q_data_checks")
    // 7 checks, but the fact table is scanned once per PASS, never
    // per metric: 1 row-local scan (5 checks fused) + 1 unique
    // groupBy + 2 ref left-joins, plus the 2 dim scans themselves = 6
    val scans = "Scan parquet".r.findAllIn(p).size
    assert(scans <= 6, s"$scans parquet scans — a check is paying " +
      "an extra pass (total must come from the same scan)")
    assert(p.contains("Broadcast"), "dim side of ref_in should broadcast")
  }

  test("profile is a single aggregation pass over a pruned scan") {
    val p = plan("q_profile")
    assert("Scan parquet".r.findAllIn(p).size === 1)
    // only the 5 profiled columns are read
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint," +
      "l_linenumber:int,l_returnflag:string,l_linestatus:string>"))
  }

  test("hash expressions keep their stage in whole-stage codegen") {
    // CodegenFallback would exclude the entire project stage from
    // WSCG; the delegating codegen keeps it compiled (the `*(n)`
    // prefix marks codegen'd operators)
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => T}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = docs.select(
        T.minhash_signature(split(col("text"), " "), 16),
        T.simhash64(split(col("text"), " ")),
        T.rolling_fingerprint(col("text")),
        T.hash_embedding(col("text"), 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen:\n$plan")
  }

  test("projection-only query reads only projected columns") {
    val p = plan("q_projection_cast")
    assert(p.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_linenumber:int>"))
  }

  test("contamination broadcasts the eval gram set (train never shuffled to it)") {
    val p = plan("q_contamination")
    assert(p.contains("BroadcastHashJoin"), s"eval join not broadcast:\n$p")
  }

  test("bloom contamination prunes train grams before the exchange and " +
      "keeps the filter out of the plan text (broadcast ref, not bits)") {
    val p = plan("q_contamination_bloom")
    assert(p.contains("bloom_might_contain"), s"no bloom prune:\n$p")
    // the filter is a broadcast reference: plan size must not scale
    // with the bloom's bit count (same rule as SemDeDup's anchors)
    assert(p.length < 100000, s"plan text carries the filter bits? " +
      s"${p.length} chars")
  }

  test("exact embedding join is blocked: no full-table broadcast NLJ") {
    // the blocked self-join shape: block-pair equi-joins, never a
    // BroadcastNestedLoopJoin over the whole corpus (which would pin
    // the full table in every executor at scale)
    val p = plan("q_embdup_cos")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"corpus broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
  }

  test("IVF search reads only probed cells (PartitionFilters on cell_id)") {
    // The inverted file is parquet partitioned by cell_id; the probe
    // set must reach the scan as a partition filter so unprobed cells
    // are never read — compute pruning alone is not IVF at 100 TB.
    val p = plan("q_ivf_knn")
    assert(p.contains("PartitionFilters: ["), s"no partition pruning:\n$p")
    assert("PartitionFilters: \\[cell_id#\\d+ (IN|INSET)".r
      .findFirstIn(p).isDefined,
      s"probe IN filter not pushed to partitions:\n$p")
  }

  test("IVF-backed hybrid retrieval prunes the vector branch's scan") {
    // The RAG-shaped composite (BM25 + IVF vector candidates fused by
    // RRF): the vector branch must read off the cell-partitioned index
    // with the probe IN filter at the scan, same as q_ivf_knn.
    val p = plan("q_hybrid_rrf_ivf")
    assert("PartitionFilters: \\[cell_id#\\d+ (IN|INSET)".r
      .findFirstIn(p).isDefined,
      s"vector branch not partition-pruned:\n$p")
  }

  test("clean-corpus keeps the dup/removed sets distributed (no LocalTableScan)") {
    // Regression guard for the 100 TB posture: the duplicate-pair set
    // and removed-id set must never round-trip through the driver — a
    // LocalTableScan in this plan means someone collected them.
    val p = plan("q_clean_corpus")
    assert(!p.contains("LocalTableScan"), s"driver-materialized set:\n$p")
  }

  test("top-words plans as partial agg + TakeOrderedAndProject") {
    val p = plan("q_top_words")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_"))
  }

  test("repetition aggregations are partial (map-side combine per word)") {
    val p = plan("q_repetition")
    assert(p.contains("partial_"))
  }

  test("BM25 selects top-k without a global sort; stats broadcast") {
    val p = plan("q_bm25_search")
    // candidate selection is TakeOrderedAndProject over the scored
    // docs; the rank window then only sees those k rows
    assert(p.contains("TakeOrderedAndProject"))
    // the 1-row corpus stats join is a broadcast, term agg is partial
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
    assert(p.contains("partial_"))
  }

  test("hybrid RRF pre-selects both branches via top-k, no global sort") {
    val p = plan("q_hybrid_rrf")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 2,
      s"each branch must TakeOrdered its top-kEach:\n$p")
    // the one-row query vector joins by broadcast
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("chunking is shuffle-free (scan -> generate, no exchange)") {
    // the final orderBy is presentation-only; strip the top sort by
    // planning the query body pre-sort via its physical plan: assert
    // the only Exchange (if any) is the range partitioning for that
    // sort, and no hash-partitioning exchange exists
    val p = plan("q_chunk_docs")
    assert(!p.contains("hashpartitioning"),
      s"chunking must not hash-shuffle:\n$p")
    assert(p.contains("Generate explode") || p.contains("Generate "),
      "chunk windows come from one generator")
  }

  test("adaptive gate shuffles once, on source (the writer partitioning)") {
    val p = plan("q_adaptive_gate")
    assert("hashpartitioning\\(source".r.findAllIn(p).size >= 1)
    // scoring happens before the window: no second hash exchange key
    assert(!"hashpartitioning\\(doc_id".r.findAllIn(p).hasNext,
      s"no per-doc shuffle expected:\n$p")
  }

  test("semdedup cluster assignment is a pure projection (no join/shuffle " +
      "before the cluster self-join)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val assigned = graft.operators.Dedup.semDedup(emb, "vec_id",
      "embedding", emb.where(emb("vec_id") < 8), "vec_id", "embedding",
      eps = 0.55)
    val p = assigned.queryExecution.executedPlan.toString
    // anchor model is broadcast, not joined and not a plan literal: no
    // BroadcastNestedLoopJoin (which a cross-join assignment would use)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"assignment must not cross-join anchors:\n$p")
    // and the plan must not grow with the anchor count — a plan-embedded
    // anchor array (typedlit) would be serialized into every task binary
    // and walked by Catalyst; at SemDeDup's k ~ sqrt(n) regime that kills
    // the driver. 8x the anchors must leave the plan text unchanged in
    // size (modulo a few chars of differing expression ids).
    val assignedBig = graft.operators.Dedup.semDedup(emb, "vec_id",
      "embedding", emb.where(emb("vec_id") < 64), "vec_id", "embedding",
      eps = 0.55)
    val pBig = assignedBig.queryExecution.executedPlan.toString
    assert(math.abs(pBig.length - p.length) < 200,
      s"plan size must not scale with anchor count: " +
        s"${p.length} chars @8 anchors vs ${pBig.length} @64")
  }

  test("pipeline templates carry no trailing global sort on the Spark " +
      "side (the gate sorts; a range exchange of the whole output is " +
      "pure waste)") {
    for (q <- Seq("q_chunk_docs", "q_gopher_quality", "q_domain_mix",
        "q_dataset_split", "q_pii_redact", "q_zorder_key")) {
      val p = plan(q)
      assert(!p.contains("rangepartitioning"),
        s"$q must not range-exchange its output for a presentation " +
          s"sort:\n$p")
    }
  }

  test("lm scoring aggregates counts partially before every exchange") {
    val p = plan("q_lm_perplexity")
    assert(p.contains("partial_count") || p.contains("partial_"),
      s"bigram counts need map-side combine:\n$p")
  }

  test("dsir scoring partial-aggregates the word counts and never " +
      "cartesians the corpus") {
    val p = plan("q_dsir_scores")
    assert(p.contains("partial_"),
      s"word counts need map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"corpus-side cartesian:\n$p")
  }
}
