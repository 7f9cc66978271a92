package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-autotune analog (SURVEY §2.11 X4-X9,
  * `lantern_cli/src/index_autotune/`). Two sweeps:
  *
  *   - [[run]] keeps the reference's published HNSW grid API-compatible
  *     (Spark has no online HNSW — north star — so each variant
  *     measures the EXACT top-k path; recall is always 100).
  *   - [[runIvf]] targets the index family that actually exists here:
  *     (nCells, nprobe) over IVF, the axes governing its
  *     recall/latency/build trade.
  *
  * Grid iteration, early-stop, best-variant selection, and the
  * results schema mirror the reference throughout.
  */
object Autotune {

  // Sampled (corpus, queries, ground truth) memo for the IVF sweep,
  // keyed by input plan + sample params — the reference caches its
  // autotune sample table the same way (`index_autotune/mod.rs:39-68`)
  // so repeated sweeps over one corpus (bench reps, a daemon re-tune)
  // pay the sample + brute-force truth once per JVM, not per call.
  // Reusing the SAME corpus DataFrame also keeps IvfIndex.build's
  // plan-keyed memo hitting across calls.
  private val sampleMemo = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, String, Int, Int, Int, String),
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      DataFrame, DataFrame, DataFrame)]()

  private def ivfSample(df: DataFrame, idCol: String, vecCol: String,
      sampleN: Int, nQueries: Int, k: Int, metric: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val plan = df.queryExecution.optimizedPlan
    val key = (plan.semanticHash(), idCol, vecCol, sampleN, nQueries,
      k, metric)
    val hit = sampleMemo.get(key)
    if (hit != null && hit._1.sameResult(plan) &&
        (hit._2.sparkSession eq df.sparkSession))
      return (hit._2, hit._3, hit._4)
    val corpus = df.select(col(idCol), col(vecCol)).limit(sampleN)
      .cache()
    val queries = corpus
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nQueries).cache()
    val truth = Knn.topK(corpus, queries, idCol, vecCol, k, metric)
      .cache()
    truth.count()
    if (sampleMemo.size >= 8) releaseSamples()
    sampleMemo.put(key, (plan, corpus, queries, truth))
    (corpus, queries, truth)
  }

  /** Unpersist and forget every memoized autotune sample (the targeted
    * release for long-lived shared sessions, mirroring
    * `Dedup.releaseCaches`). Correctness never depends on the memo —
    * a fresh call re-derives from lineage.
    */
  def releaseSamples(): Unit = {
    val it = sampleMemo.values().iterator()
    while (it.hasNext) {
      val (_, c, q, t) = it.next()
      t.unpersist(); q.unpersist(); c.unpersist()
    }
    sampleMemo.clear()
  }

  /** Materialize a variant's search result and report the wall time
    * of the SEARCH ALONE: the result is persisted and counted inside
    * the timed window, so the recall computation (ground-truth join +
    * aggregate) that follows reuses the cached rows and never
    * contaminates the latency column — the reference times the top-k
    * query itself, not the truth comparison
    * (`index_autotune/mod.rs:230-236`; the r9 sweeps timed the lazy
    * search THROUGH the recall join, inflating every latency row by
    * truth-join cost). Callers unpersist after the recall read.
    */
  private[operators] def timedSearch(mk: => DataFrame)
      : (DataFrame, Double) = {
    val t0 = System.nanoTime()
    val res = mk
    res.persist()
    res.count()
    (res, (System.nanoTime() - t0) / 1e6)
  }

  private def recallPct(truth: DataFrame, res: DataFrame, k: Int)
      : Double =
    Knn.recall(truth, res, k)
      .agg(avg(col("recall"))).head().getDouble(0) * 100.0

  /** The published tuning grid (`index_autotune/mod.rs:329-360`). */
  case class Variant(m: Int, efConstruction: Int, ef: Int)
  val grid: Seq[Variant] = Seq(
    Variant(6, 32, 64), Variant(8, 40, 64), Variant(12, 48, 64),
    Variant(16, 60, 76), Variant(32, 96, 96), Variant(48, 128, 128))

  case class Result(experimentId: Int, m: Int, efConstruction: Int,
      ef: Int, recall: Double, latencyMs: Double, buildTimeMs: Double)

  /** X4-X7: sample corpus, 10 query points, k-NN recall/latency per
    * variant; early stop at recall >= 99.9 (`mod.rs:476-478`).
    * `onProgress` / `isCanceled` mirror the daemon's progress_callback
    * and is_canceled hooks (`daemon/autotune_jobs.rs:70-76`): progress
    * is reported per finished variant, and cancellation is checked
    * between variants (raising the reference's "Job cancelled").
    */
  def run(df: DataFrame, idCol: String, vecCol: String, k: Int = 10,
      sampleN: Int = 10000, nQueries: Int = 10,
      metric: String = "l2sq", targetRecall: Double = 99.9,
      onProgress: Int => Unit = _ => (),
      isCanceled: () => Boolean = () => false)
      : Seq[Result] = {
    val corpus = df.select(col(idCol), col(vecCol)).limit(sampleN).cache()
    // deterministic "random" query points: hash-ranked sample (X5)
    val queries = corpus
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nQueries).cache()
    val t0 = System.nanoTime()
    val truth = Knn.topK(corpus, queries, idCol, vecCol, k, metric)
      .cache()
    try {
      truth.count()
      val buildMs = (System.nanoTime() - t0) / 1e6

      val results = Seq.newBuilder[Result]
      var stopped = false
      grid.zipWithIndex.foreach { case (v, i) =>
        if (!stopped) {
          if (isCanceled()) throw new RuntimeException("Job cancelled")
          val (res, searchMs) = timedSearch(
            Knn.topK(corpus, queries, idCol, vecCol, k, metric))
          val recall = try recallPct(truth, res, k)
            finally res.unpersist()
          results += Result(i, v.m, v.efConstruction, v.ef, recall,
            searchMs / nQueries, buildMs)
          onProgress(((i + 1) * 100) / grid.size)
          if (recall >= targetRecall) stopped = true // mod.rs:476-478
        }
      }
      onProgress(100)
      results.result()
    } finally {
      truth.unpersist(); queries.unpersist(); corpus.unpersist()
    }
  }

  /** X8: pick min-latency among variants meeting the target recall;
    * fall back to max recall (`index_autotune/mod.rs:162-187`).
    */
  def bestVariant(results: Seq[Result], targetRecall: Double = 99.9)
      : Result = {
    val ok = results.filter(_.recall >= targetRecall)
    if (ok.nonEmpty) ok.minBy(r => (r.latencyMs, r.buildTimeMs))
    else results.maxBy(_.recall)
  }

  // ---- IVF-targeted sweep -------------------------------------------
  // The reference's grid searches HNSW build params; the index family
  // that exists HERE is IVF(-SQ8), so this sweep searches the axes that
  // actually govern its recall/latency/build trade: coarse cell count
  // (build-time k-means granularity) and probe width (query-time I/O).

  case class IvfVariant(nCells: Int, nprobe: Int)

  /** Small-to-wide sweep; within one nCells the build is shared (the
    * IvfIndex memo), so the grid costs |distinct nCells| builds.
    */
  val ivfGrid: Seq[IvfVariant] = Seq(
    IvfVariant(8, 1), IvfVariant(8, 4), IvfVariant(16, 2),
    IvfVariant(16, 4), IvfVariant(16, 16), IvfVariant(32, 8))

  case class IvfResult(experimentId: Int, nCells: Int, nprobe: Int,
      recall: Double, latencyMs: Double, buildTimeMs: Double)

  /** Sweep (nCells, nprobe): per variant, recall of IVF search vs the
    * brute-force ground truth, query latency, and the (memo-amortized)
    * index build time for its cell count. Early stop and cancellation
    * mirror [[run]].
    */
  def runIvf(df: DataFrame, idCol: String, vecCol: String, k: Int = 10,
      sampleN: Int = 10000, nQueries: Int = 10,
      metric: String = "l2sq", targetRecall: Double = 99.9,
      maxIter: Int = 5, seed: Long = 42L,
      onProgress: Int => Unit = _ => (),
      isCanceled: () => Boolean = () => false): Seq[IvfResult] = {
    // memo-owned frames: NOT unpersisted here — releaseSamples() is
    // the targeted drop for long-lived sessions
    val (corpus, queries, truth) =
      ivfSample(df, idCol, vecCol, sampleN, nQueries, k, metric)
    locally {
      val buildMs = scala.collection.mutable.Map[Int, Double]()
      def modelFor(nCells: Int): IvfIndex.Model = {
        val t = System.nanoTime()
        val m = IvfIndex.build(corpus, idCol, vecCol, nCells,
          maxIter = maxIter, seed = seed)
        buildMs.getOrElseUpdate(nCells, (System.nanoTime() - t) / 1e6)
        m
      }
      val results = Seq.newBuilder[IvfResult]
      var stopped = false
      ivfGrid.zipWithIndex.foreach { case (v, i) =>
        if (!stopped) {
          if (isCanceled()) throw new RuntimeException("Job cancelled")
          val model = modelFor(v.nCells)
          val (res, searchMs) = timedSearch(
            IvfIndex.search(model, queries, k, v.nprobe, metric))
          val recall = try recallPct(truth, res, k)
            finally res.unpersist()
          results += IvfResult(i, v.nCells, v.nprobe, recall,
            searchMs / nQueries, buildMs(v.nCells))
          onProgress(((i + 1) * 100) / ivfGrid.size)
          if (recall >= targetRecall) stopped = true
        }
      }
      onProgress(100)
      results.result()
    }
  }

  /** X8 selection over the IVF sweep: cheapest query meeting the
    * target, ties to the cheaper build; else max recall.
    */
  def bestIvfVariant(results: Seq[IvfResult],
      targetRecall: Double = 99.9): IvfResult = {
    val ok = results.filter(_.recall >= targetRecall)
    if (ok.nonEmpty) ok.minBy(r => (r.latencyMs, r.buildTimeMs))
    else results.maxBy(_.recall)
  }

  case class BqVariant(nprobe: Int, shortlist: Int)

  /** (nprobe, shortlist) axes of the two-stage BQ search: nprobe
    * bounds the probed-cell scan, shortlist the exact-rescore pool —
    * the two recall/cost levers a BQ deployment actually turns.
    */
  val bqGrid: Seq[BqVariant] = Seq(
    BqVariant(2, 20), BqVariant(2, 50), BqVariant(4, 20),
    BqVariant(4, 50), BqVariant(8, 50), BqVariant(16, 100))

  case class BqResult(experimentId: Int, nprobe: Int, shortlist: Int,
      recall: Double, latencyMs: Double, buildTimeMs: Double)

  /** Sweep the BQ search axes over ONE bits-bearing index (16 cells,
    * built once — unlike the IVF sweep, both axes here are pure query
    * parameters, so the build amortizes across the whole grid).
    * Recall is against the brute-force ground truth on the same
    * sample; early stop and cancellation mirror [[run]]/[[runIvf]].
    */
  def runBq(df: DataFrame, idCol: String, vecCol: String, k: Int = 10,
      sampleN: Int = 10000, nQueries: Int = 10,
      metric: String = "l2sq", targetRecall: Double = 99.9,
      nCells: Int = 16, maxIter: Int = 5, seed: Long = 42L,
      isCanceled: () => Boolean = () => false): Seq[BqResult] = {
    val (corpus, queries, truth) =
      ivfSample(df, idCol, vecCol, sampleN, nQueries, k, metric)
    val t0 = System.nanoTime()
    val model = IvfIndex.buildBq(corpus, idCol, vecCol, nCells,
      maxIter = maxIter, seed = seed)
    val buildMs = (System.nanoTime() - t0) / 1e6
    val results = Seq.newBuilder[BqResult]
    var stopped = false
    bqGrid.zipWithIndex.foreach { case (v, i) =>
      if (!stopped) {
        if (isCanceled()) throw new RuntimeException("Job cancelled")
        // record the EFFECTIVE depth: a grid shortlist below k is
        // clamped for the search, and the result row must describe
        // the configuration that was actually measured (replaying the
        // unclamped value through /search would 400)
        val sl = math.max(v.shortlist, k)
        val (res, searchMs) = timedSearch(
          IvfIndex.searchBqRefine(model, queries, k, v.nprobe, sl,
            metric))
        val recall = try recallPct(truth, res, k)
          finally res.unpersist()
        results += BqResult(i, v.nprobe, sl, recall,
          searchMs / nQueries, buildMs)
        if (recall >= targetRecall) stopped = true
      }
    }
    results.result()
  }

  /** BQ sweep results in the autotune_results shape (this family's
    * axes: nprobe × rescore-shortlist depth).
    */
  def bqToDF(spark: SparkSession, results: Seq[BqResult]): DataFrame = {
    import spark.implicits._
    results.toDF()
      .select(col("experimentId").as("experiment_id"),
        col("nprobe"), col("shortlist"),
        round(col("recall"), 1).as("recall"),
        col("latencyMs").as("latency"),
        col("buildTimeMs").as("build_time"))
  }

  /** X8 selection over the BQ sweep, same policy as
    * [[bestIvfVariant]].
    */
  def bestBqVariant(results: Seq[BqResult],
      targetRecall: Double = 99.9): BqResult = {
    val ok = results.filter(_.recall >= targetRecall)
    if (ok.nonEmpty) ok.minBy(r => (r.latencyMs, r.buildTimeMs))
    else results.maxBy(_.recall)
  }

  case class KindVariant(kind: String, nprobe: Int)

  /** Storage kinds × probe depth: the sweep a deployment runs to pick
    * its stored representation (the reference index server's
    * quantization kinds, external_index/server.rs:93-99). Kinds share
    * ONE coarse quantizer (k-means once), so the grid isolates the
    * storage kind's own recall/latency effect from cell-layout noise.
    */
  val kindGrid: Seq[KindVariant] = for {
    kind <- Seq("f32", "f16", "sq8", "bq")
    np <- Seq(4, 16)
  } yield KindVariant(kind, np)

  /** bytesPerDim: what each stored vector element costs on disk/scan —
    * the axis the whole sweep exists to trade recall against.
    */
  case class KindResult(experimentId: Int, kind: String, nprobe: Int,
      recall: Double, latencyMs: Double, buildTimeMs: Double,
      bytesPerDim: Double)

  /** Sweep every storage kind under one shared coarse quantizer:
    * per (kind, nprobe), recall vs brute-force truth, query latency,
    * build time, and the kind's bytes-per-dimension. The deterministic
    * fixed-quantizer twin of this sweep's recall column is the
    * hash-oracled q_quant_kinds face; this run adds the wall-clock
    * axes and the k-means quantizer.
    */
  def runKinds(df: DataFrame, idCol: String, vecCol: String, k: Int = 10,
      sampleN: Int = 10000, nQueries: Int = 10,
      metric: String = "l2sq", targetRecall: Double = 99.9,
      nCells: Int = 16, maxIter: Int = 5, seed: Long = 42L,
      shortlist: Int = 50,
      isCanceled: () => Boolean = () => false): Seq[KindResult] = {
    val (corpus, queries, truth) =
      ivfSample(df, idCol, vecCol, sampleN, nQueries, k, metric)
    val cb = ProductQuantizer.fitCodebook(corpus, idCol, vecCol,
      clusters = nCells, splits = 1, maxIter = maxIter, seed = seed)
    val cents = ProductQuantizer.localize(cb)(0)
    // one build per kind, amortized across its nprobe points
    case class Built(search: (DataFrame, Int) => DataFrame,
        buildMs: Double, bytesPerDim: Double)
    val builds = scala.collection.mutable.Map[String, Built]()
    def built(kind: String): Built = builds.getOrElseUpdate(kind, {
      val t0 = System.nanoTime()
      val b = kind match {
        case "f32" =>
          val m = IvfIndex.buildWithCentroids(corpus, idCol, vecCol,
            cents)
          Built((q, np) => IvfIndex.search(m, q, k, np, metric), 0, 4.0)
        case "f16" =>
          val m = IvfIndex.buildF16WithCentroids(corpus, idCol, vecCol,
            cents)
          Built((q, np) => IvfIndex.searchF16(m, q, k, np, metric), 0,
            2.0)
        case "sq8" =>
          val (m, mn, mx) = IvfIndex.buildSq8WithCentroids(corpus,
            idCol, vecCol, cents)
          Built((q, np) => IvfIndex.searchSq8(m, mn, mx, q, vecCol, k,
            np, metric), 0, 1.0)
        case "bq" =>
          val m = IvfIndex.buildBqWithCentroids(corpus, idCol, vecCol,
            cents)
          Built((q, np) => IvfIndex.searchBqRefine(m, q, k, np,
            math.max(shortlist, k), metric), 0, 1.0 / 8.0)
        case other => throw new IllegalArgumentException(
          s"unknown storage kind '$other'")
      }
      b.copy(buildMs = (System.nanoTime() - t0) / 1e6)
    })
    val results = Seq.newBuilder[KindResult]
    kindGrid.zipWithIndex.foreach { case (v, i) =>
      if (isCanceled()) throw new RuntimeException("Job cancelled")
      val b = built(v.kind)
      val (res, searchMs) = timedSearch(b.search(queries, v.nprobe))
      val recall = try recallPct(truth, res, k)
        finally res.unpersist()
      results += KindResult(i, v.kind, v.nprobe, recall,
        searchMs / nQueries, b.buildMs, b.bytesPerDim)
    }
    results.result()
  }

  /** X8 selection across kinds: cheapest STORAGE meeting the target
    * recall (bytes first — that is what the sweep exists to minimize
    * at corpus scale), latency as the tiebreak; else max recall.
    */
  def bestKind(results: Seq[KindResult],
      targetRecall: Double = 99.9): KindResult = {
    val ok = results.filter(_.recall >= targetRecall)
    if (ok.nonEmpty) ok.minBy(r => (r.bytesPerDim, r.latencyMs))
    else results.maxBy(_.recall)
  }

  /** Kind sweep results in the autotune_results shape. */
  def kindsToDF(spark: SparkSession,
      results: Seq[KindResult]): DataFrame = {
    import spark.implicits._
    results.toDF()
      .select(col("experimentId").as("experiment_id"), col("kind"),
        col("nprobe"),
        round(col("recall"), 1).as("recall"),
        col("latencyMs").as("latency"),
        col("buildTimeMs").as("build_time"),
        col("bytesPerDim").as("bytes_per_dim"))
  }

  /** IVF sweep results in the autotune_results shape (the HNSW param
    * columns replaced by this family's axes).
    */
  def ivfToDF(spark: SparkSession, results: Seq[IvfResult]): DataFrame = {
    import spark.implicits._
    results.toDF()
      .select(col("experimentId").as("experiment_id"),
        col("nCells").as("n_cells"), col("nprobe"),
        round(col("recall"), 1).as("recall"),
        col("latencyMs").as("latency"),
        col("buildTimeMs").as("build_time"))
  }

  // ---- hash-checkable recall axes -----------------------------------
  // The sweeps above carry wall-clock columns, which no restating
  // engine can reproduce — so their registry faces were rows-only.
  // These grids split the RECALL axis out: the same variant
  // enumeration run under a caller-FROZEN coarse quantizer, reporting
  // the integer truth-intersection count per variant. Every number is
  // an argmin/count over deterministic inputs, so a DuckDB
  // restatement matches bit for bit; the wall-clock axes stay graded
  // by AutotuneSpec's bounds.

  private def matchCount(res: DataFrame, truth: DataFrame): DataFrame =
    res.select(col("qid"), col("nid")).join(truth, Seq("qid", "nid"))
      .agg(count(lit(1)).cast("int").as("matches"))

  /** The exact-truth pair set, materialized ONCE per grid call: the
    * truth DataFrame is referenced by EVERY union branch below, and
    * left lazy the brute-force kNN subtree re-executes once per
    * variant (5x for the probe grid, 8x for the kind grid — measured
    * as the dominant cost of the q_autotune_{ivf,bq,kinds} faces).
    * nQueries x k is at most a few hundred (qid, nid) pairs, the same
    * bounded-control-state size as the codebook collects, so it comes
    * to the driver and goes back out as a broadcast local relation —
    * the rows (and hence every `matches` count) are identical.
    */
  private def materializedTruth(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val t = Knn.topK(corpus, queries, idCol, vecCol, k)
      .select(col("qid"), col("nid"))
    val spark = corpus.sparkSession
    val local = spark.createDataFrame(
      java.util.Arrays.asList(t.collect(): _*), t.schema)
    broadcast(local)
  }

  /** Recall axis of [[runIvf]] under a frozen quantizer: the cell
    * count is fixed by `centroids`, so the swept axis is `probes`
    * (query-time I/O width) — per variant, how many of the exact
    * top-k the partial probe recovers, summed over all queries.
    */
  def ivfRecallGrid(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, centroids: Array[Array[Float]],
      k: Int = 10, probes: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    val model = IvfIndex.buildWithCentroids(corpus, idCol, vecCol,
      centroids)
    val truth = materializedTruth(corpus, queries, idCol, vecCol, k)
    probes.zipWithIndex.map { case (np, i) =>
      matchCount(IvfIndex.search(model, queries, k, np), truth)
        .select(lit(i).as("experiment_id"),
          lit(centroids.length).as("n_cells"), lit(np).as("nprobe"),
          col("matches"))
    }.reduce(_ unionAll _)
  }

  /** Recall axis of [[runBq]] under a frozen quantizer: the published
    * (nprobe, shortlist) grid, each variant's two-stage search
    * intersected with exact truth. Shortlists below k are clamped
    * exactly as the timed sweep clamps them.
    */
  def bqRecallGrid(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, centroids: Array[Array[Float]],
      k: Int = 10,
      grid: Seq[(Int, Int)] = bqGrid.map(v => (v.nprobe, v.shortlist)))
      : DataFrame = {
    val model = IvfIndex.buildBqWithCentroids(corpus, idCol, vecCol,
      centroids)
    val truth = materializedTruth(corpus, queries, idCol, vecCol, k)
    grid.zipWithIndex.map { case ((np, sl0), i) =>
      val sl = math.max(sl0, k)
      matchCount(
        IvfIndex.searchBqRefine(model, queries, k, np, sl), truth)
        .select(lit(i).as("experiment_id"), lit(np).as("nprobe"),
          lit(sl).as("shortlist"), col("matches"))
    }.reduce(_ unionAll _)
  }

  /** Recall axis of [[runKinds]] under a frozen SHARED quantizer: the
    * published kind × nprobe grid (every storage kind probing the
    * same frozen cells), BQ rescoring through `shortlist`.
    */
  def kindsRecallGrid(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, centroids: Array[Array[Float]],
      k: Int = 10, shortlist: Int = 40): DataFrame = {
    val truth = materializedTruth(corpus, queries, idCol, vecCol, k)
    val I = IvfIndex
    val f32 = I.buildWithCentroids(corpus, idCol, vecCol, centroids)
    val f16 = I.buildF16WithCentroids(corpus, idCol, vecCol, centroids)
    val (sq8, mn, mx) = I.buildSq8WithCentroids(corpus, idCol, vecCol,
      centroids)
    val bq = I.buildBqWithCentroids(corpus, idCol, vecCol, centroids)
    def search(kind: String, q: DataFrame, np: Int): DataFrame =
      kind match {
        case "f32" => I.search(f32, q, k, np)
        case "f16" => I.searchF16(f16, q, k, np)
        case "sq8" => I.searchSq8(sq8, mn, mx, q, vecCol, k, np)
        case "bq" => I.searchBqRefine(bq, q, k, np,
          math.max(shortlist, k))
        case other => throw new IllegalArgumentException(
          s"unknown storage kind '$other'")
      }
    kindGrid.zipWithIndex.map { case (v, i) =>
      matchCount(search(v.kind, queries, v.nprobe), truth)
        .select(lit(i).as("experiment_id"), lit(v.kind).as("kind"),
          lit(v.nprobe).as("nprobe"), col("matches"))
    }.reduce(_ unionAll _)
  }

  /** X9: persist results in the reference's autotune_results schema
    * (`daemon/autotune_jobs.rs:47-56`).
    */
  def toDF(spark: SparkSession, results: Seq[Result]): DataFrame = {
    import spark.implicits._
    results.toDF()
      .select(col("experimentId").as("experiment_id"), col("m"),
        col("efConstruction").as("efc"), col("ef"),
        round(col("recall"), 1).as("recall"),
        col("latencyMs").as("latency"),
        col("buildTimeMs").as("build_time"))
  }
}
