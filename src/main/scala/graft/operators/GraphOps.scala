package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for corpus curation. The motivating read: a
  * web-scale training corpus wants a per-domain AUTHORITY signal
  * (CommonCrawl-style curation weights pages by link centrality) next
  * to the per-document quality scores — [[pageRank]] provides it as a
  * bounded number of shuffle rounds over an edge table, the shape that
  * survives 100 TB (each round is one join + one partial-aggregated
  * groupBy on the edge list; no per-node iteration state beyond the
  * (node, rank) table).
  *
  * Arithmetic contract: the whole computation is INTEGER-EXACT —
  * ranks live in micro-units (scale = 1e6 = rank 1.0), per-edge
  * contributions are floor(rank/outdeg), damping is
  * floor(d100 * Σcontrib / 100) — so any engine that restates the
  * same floor-division recurrence reproduces every rank bit for bit
  * (the DuckDB oracle does, making the operator hash-checkable, vs
  * a double-precision PageRank whose partial-sum order would differ).
  * The floor divisions UNDERCOUNT vs real-valued PageRank by at most
  * outdeg micro-units per node per round — noise at scale 1e6, and
  * deterministic noise at that.
  *
  * Semantics: the simplified (no dangling-mass redistribution)
  * variant — a node with no out-edges absorbs rank; total mass decays
  * accordingly, exactly as in the original formulation without the
  * dangling fix. Node set = sources ∪ destinations.
  */
object GraphOps {

  /** `iters` rounds of integer PageRank over `edges(src, dst)`.
    * Returns (node, rank) with rank in micro-units of `scale`.
    * Duplicate edges count as parallel links (dedupe upstream if that
    * is not wanted). d100 is the damping factor in hundredths (85 =
    * the classic 0.85).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, d100: Int = 85, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters in [1, 50], got $iters")
    require(d100 >= 0 && d100 <= 100, s"d100 in [0, 100], got $d100")
    // persist the loop invariants ONCE — without this, every round's
    // composed plan re-derives e/nodes/deg from the source scan and
    // the edge table is re-read O(iters) times
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = scale * (100L - d100) / 100L
    // localCheckpoint each round (the connected-components discipline,
    // see Dedup): ranks feeds the next round's join, so an unchecked
    // chain grows the logical plan superlinearly with iters and the
    // DRIVER (analysis/optimization time) dies long before the data
    // does. On a cluster with executor-loss concerns, set a checkpoint
    // dir and swap for checkpoint() — same shape.
    var ranks = nodes.withColumn("rank", lit(scale))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        // TRUE integral division (`div`), never double `/`: a double
        // quotient can round across an integer boundary and break the
        // bit-exact recurrence the oracle restates
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($d100 * coalesce(s, 0L)) div 100"))
            .as("rank"))
        .localCheckpoint(true)
      // the previous round's checkpoint blocks become unreferenced
      // here; the ContextCleaner reclaims them (same discipline as the
      // connected-components loop)
      i += 1
    }
    // the final ranks are checkpoint-materialized: lineage no longer
    // references the loop invariants, so their blocks can go
    e.unpersist(); nodes.unpersist(); deg.unpersist()
    ranks
  }

  /** Degree statistics of `edges(src, dst)`: per-node out/in degree —
    * the cheap first-pass graph profile (hubs to cap, sinks to flag)
    * before anything iterative runs.
    */
  def degreeStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val out = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val in = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("indeg"))
    out.join(in, Seq("node"), "full")
      .na.fill(0L, Seq("outdeg", "indeg"))
  }
}
