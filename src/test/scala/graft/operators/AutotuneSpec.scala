package graft.operators

import graft.SparkSuite

class AutotuneSpec extends SparkSuite {

  test("exact search recalls 100 and early-stops at the first variant") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val rs = Autotune.run(emb, "vec_id", "embedding", k = 5,
      sampleN = 200, nQueries = 5)
    assert(rs.size === 1) // early stop at recall >= 99.9
    assert(rs.head.recall === 100.0)
    assert(rs.head.m === 6 && rs.head.efConstruction === 32)
  }

  test("bestVariant: min latency among passing, else max recall") {
    val rs = Seq(
      Autotune.Result(0, 6, 32, 64, 100.0, 5.0, 1.0),
      Autotune.Result(1, 8, 40, 64, 100.0, 3.0, 1.0),
      Autotune.Result(2, 12, 48, 64, 98.0, 1.0, 1.0))
    assert(Autotune.bestVariant(rs).experimentId === 1)
    val low = rs.map(r => r.copy(recall = r.recall - 50))
    assert(Autotune.bestVariant(low).experimentId === 0) // max recall
  }

  test("IndexParams validation mirrors the reference ranges (F9)") {
    IndexParams().validate()
    IndexParams(m = 2, efConstruction = 400, ef = 1, dim = 2000).validate()
    intercept[IllegalArgumentException] { IndexParams(m = 1).validate() }
    intercept[IllegalArgumentException] { IndexParams(m = 129).validate() }
    intercept[IllegalArgumentException] {
      IndexParams(efConstruction = 401).validate()
    }
    intercept[IllegalArgumentException] { IndexParams(dim = 2001).validate() }
    intercept[IllegalArgumentException] {
      IndexParams(metric = "ip").validate()
    }
  }

  test("IVF sweep: full grid reports, recall rises with nprobe, " +
      "full probe recalls 100, builds amortize per cell count") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val rs = Autotune.runIvf(emb, "vec_id", "embedding", k = 5,
      sampleN = 500, nQueries = 5, targetRecall = 101.0)
    assert(rs.size === Autotune.ivfGrid.size) // 101 disables early stop
    // (16,16) is a full probe == exact search
    val full = rs.find(r => r.nCells === 16 && r.nprobe === 16).get
    assert(full.recall === 100.0)
    // within nCells=16, wider probes can only help
    val n16 = rs.filter(_.nCells === 16).sortBy(_.nprobe).map(_.recall)
    assert(n16 === n16.sorted, s"recall not monotone in nprobe: $n16")
    // the two nCells=16 variants share one build (the IvfIndex memo)
    assert(rs.filter(_.nCells === 16).map(_.buildTimeMs).distinct.size === 1)
    val best = Autotune.bestIvfVariant(rs, targetRecall = 99.9)
    assert(best.recall >= 99.9 || best.recall === rs.map(_.recall).max)
  }

  test("BQ sweep: one build for the whole grid, full-probe wide " +
      "shortlist recalls 100, selection policy holds") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // 50-row sample so the widest variant is provably exhaustive
    val rs = Autotune.runBq(emb, "vec_id", "embedding", k = 5,
      sampleN = 50, nQueries = 5, targetRecall = 101.0)
    assert(rs.size === Autotune.bqGrid.size) // 101 disables early stop
    // both axes are query params: every variant shares ONE build
    assert(rs.map(_.buildTimeMs).distinct.size === 1)
    // (16, 100): full probe + shortlist >= the 50-row sample == exact
    val full = rs.find(r => r.nprobe === 16 && r.shortlist === 100).get
    assert(full.recall === 100.0)
    // at fixed nprobe, a deeper rescore pool can only help
    val n4 = rs.filter(_.nprobe === 4).sortBy(_.shortlist).map(_.recall)
    assert(n4 === n4.sorted, s"recall not monotone in shortlist: $n4")
    val best = Autotune.bestBqVariant(rs, targetRecall = 99.9)
    assert(best.recall >= 99.9 || best.recall === rs.map(_.recall).max)
  }

  test("kind sweep: every kind shares one quantizer, f32/f16/sq8 at " +
      "full probe are exact on a small sample, bytes ordering holds, " +
      "bestKind minimizes storage among passing kinds") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val rs = Autotune.runKinds(emb, "vec_id", "embedding", k = 5,
      sampleN = 50, nQueries = 5, targetRecall = 101.0, nCells = 4,
      shortlist = 100)
    assert(rs.size === Autotune.kindGrid.size)
    // full probe, lossless-or-near kinds on 50 rows: exact recall
    // (f16/sq8 grids cannot flip top-5 on a 50-row sample in practice
    // — and if they ever did, this assertion is the alarm we want)
    for (kind <- Seq("f32", "f16", "sq8")) {
      val full = rs.find(r => r.kind === kind && r.nprobe === 16).get
      assert(full.recall === 100.0, s"$kind full-probe recall")
    }
    // bq at full probe + shortlist >= sample is exact too (rescore)
    assert(rs.find(r => r.kind === "bq" && r.nprobe === 16)
      .get.recall === 100.0)
    // the storage axis the sweep trades against
    val bytes = rs.groupBy(_.kind).view.mapValues(_.head.bytesPerDim)
    assert(bytes("f32") > bytes("f16") && bytes("f16") > bytes("sq8") &&
      bytes("sq8") > bytes("bq"))
    // bestKind: cheapest bytes among kinds meeting the target
    val best = Autotune.bestKind(rs, targetRecall = 99.9)
    assert(best.kind === "bq" && best.recall >= 99.9)
    val df = Autotune.kindsToDF(spark, rs)
    assert(df.columns.toSeq === Seq("experiment_id", "kind", "nprobe",
      "recall", "latency", "build_time", "bytes_per_dim"))
  }

  test("IVF sweep results DF carries the family's axes in the " +
      "autotune_results shape") {
    val df = Autotune.ivfToDF(spark,
      Seq(Autotune.IvfResult(0, 16, 4, 97.5, 1.0, 2.0)))
    assert(df.columns.toSeq ===
      Seq("experiment_id", "n_cells", "nprobe", "recall", "latency",
        "build_time"))
    assert(df.head().getDouble(3) === 97.5)
  }

  test("results DF matches the reference autotune_results schema") {
    val df = Autotune.toDF(spark,
      Seq(Autotune.Result(0, 6, 32, 64, 100.0, 1.0, 2.0)))
    assert(df.columns.toSeq ===
      Seq("experiment_id", "m", "efc", "ef", "recall", "latency",
        "build_time"))
    assert(df.head().getDouble(4) === 100.0)
  }

  test("latency timing excludes the ground-truth comparison: " +
      "timedSearch materializes the search INSIDE the timed window, so " +
      "the recall read that follows reuses the cache and recomputes " +
      "nothing") {
    import org.apache.spark.sql.functions.{col, udf}
    val acc = spark.sparkContext.longAccumulator("search_evals")
    val counted = udf((i: Long) => { acc.add(1); i })
    val search = spark.range(100).select(counted(col("id")).as("x"))
    val (res, ms) = Autotune.timedSearch(search)
    assert(ms > 0.0)
    // the search really ran inside the window...
    val evalsInWindow = acc.value
    assert(evalsInWindow >= 100L, s"search not forced: $evalsInWindow")
    // ...and the truth-join stand-in reads the CACHE — were the search
    // still lazy (the r9 shape), this second action would re-run the
    // UDF and the latency column would have charged the truth join
    assert(res.count() == 100L)
    assert(acc.value == evalsInWindow,
      s"recall read recomputed the search: ${acc.value} > $evalsInWindow")
    res.unpersist()
  }
}
