package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuite
import graft.operators.{TextAnalysis => TA}

/** Invariant tests for the pipeline-composition SQL templates; the
  * cross-engine value check is local_verify / the driver's DuckDB gate.
  */
class PipelineOpsSpec extends SparkSuite {
  import spark.implicits._

  private def onDocs(sql: String): DataFrame = {
    spark.read.parquet(s"$sf0001/documents.parquet")
      .createOrReplaceTempView("documents")
    spark.sql(sql)
  }

  test("gopher gate: keep flag agrees with recomputed rules") {
    val rows = onDocs(PipelineOps.gopherQualitySql(TA.SparkDialect)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tokens = r.getInt(1)
      val stops = r.getInt(2)
      val mwl = r.getDouble(3)
      val af = r.getDouble(4)
      val sr = r.getDouble(5)
      val keep = r.getInt(6)
      // rounded columns are within 1e-4 of the rule inputs, so a strict
      // re-check needs the margin
      val expect = tokens >= 20 && tokens <= 100000 &&
        mwl >= 3.0 - 1e-4 && mwl <= 10.0 + 1e-4 &&
        af >= 0.8 - 1e-4 && stops >= 2 && sr <= 0.1 + 1e-4
      if (keep == 1) assert(expect, s"kept row fails recheck: $r")
    }
    // the gate must actually split the corpus, not pass/drop everything
    val kept = rows.count(_.getInt(6) == 1)
    assert(kept > 0 && kept < rows.length, s"gate degenerate: $kept")
  }

  test("seq_pack: offsets are contiguous and consistent per source") {
    val rows = onDocs(PipelineOps.seqPackSql(TA.SparkDialect, seqLen = 512))
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(0))
      var cum = 0L
      sorted.foreach { r =>
        val tokens = r.getLong(2)
        val startOff = r.getLong(3)
        assert(startOff == cum, s"gap at $r")
        assert(r.getLong(4) == startOff / 512)
        assert(r.getLong(5) == startOff % 512)
        cum += tokens
      }
    }
  }

  test("domain_mix: deterministic, and only passing draws survive") {
    val a = onDocs(PipelineOps.domainMixSql(TA.SparkDialect)).collect()
    val b = onDocs(PipelineOps.domainMixSql(TA.SparkDialect)).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.nonEmpty)
    a.foreach { r =>
      val srcIdx = r.getString(1).drop(3).toLong
      val u = r.getLong(2)
      val cap = if (srcIdx % 2 == 0) 800000L else 250000L
      assert(u < cap, s"row past its source cap: $r")
      assert(u == (r.getLong(0) % 1000000L) * 2654435761L % 1000000L)
    }
    // both rates are exercised
    val srcs = a.map(_.getString(1)).toSet
    assert(srcs.exists(s => s.drop(3).toLong % 2 == 0) &&
      srcs.exists(s => s.drop(3).toLong % 2 == 1))
  }

  test("pii_redact: masked output carries no digits, counts reconcile") {
    spark.read.parquet(s"$sf0001/customer.parquet")
      .createOrReplaceTempView("customer")
    val rows = spark.sql(PipelineOps.piiRedactSql(TA.SparkDialect)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val masked = r.getString(1)
      assert(!masked.exists(_.isDigit), s"unmasked digits: $r")
      assert(r.getInt(2) >= 1) // Customer#NNNN always has one digit run
      assert(r.getInt(3) >= r.getInt(2)) // digits >= runs
    }
  }

  test("alternating components over corpus pairs match propagation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val a = Dedup.connectedComponentsAlternating(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("chunking: windows tile every document with the declared stride") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    val rows = spark.sql(
      PipelineOps.chunkSql(TA.SparkDialect, chunkSize = 64, stride = 48))
      .collect()
    assert(rows.nonEmpty)
    val nTok = docs.selectExpr("doc_id",
      "size(split(trim(text), ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (docId, rs) =>
      val n = nTok(docId)
      val expected = (n - 1) / 48 + 1
      assert(rs.length == expected, s"doc $docId: ${rs.length} != $expected")
      rs.sortBy(_.getInt(1)).zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i)
        assert(r.getInt(2) == i * 48) // tok_start
        val expectLen = math.min(64, n - i * 48)
        assert(r.getInt(3) == expectLen, s"doc $docId chunk $i len")
        // chunk text has exactly chunk_tokens words
        assert(r.getString(4).split(' ').length == expectLen)
      }
    }
    // consecutive chunks overlap by chunkSize - stride tokens
    val byDoc = rows.groupBy(_.getLong(0))
    val multi = byDoc.filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture should produce multi-chunk docs")
    multi.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val aWords = a.getString(4).split(' ')
          val bWords = b.getString(4).split(' ')
          if (aWords.length == 64) // full window: 16-token overlap
            assert(aWords.drop(48).sameElements(bWords.take(16)))
        case _ => ()
      }
    }
  }

  test("zorder key: exact Morton interleave; sorting by z clusters " +
      "both dimensions") {
    spark.read.parquet(s"$sf0001/orders.parquet")
      .createOrReplaceTempView("orders")
    val rows = spark.sql(PipelineOps.zorderSql(TA.SparkDialect,
      "orders", "o_orderkey", "o_custkey", "o_orderkey"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).sum
    rows.foreach { case (a, b, z) => assert(z == morton(a, b), s"($a,$b)") }
    // locality: bucket the z-sorted rows; per-bucket spread in the a
    // dimension must be far below the global spread (that's the whole
    // point of the layout)
    val sorted = rows.sortBy(_._3)
    val nb = 16
    val per = math.max(sorted.length / nb, 1)
    val spreads = sorted.grouped(per).filter(_.length > 1).map { g =>
      g.map(_._1).max - g.map(_._1).min
    }.toSeq
    val global = rows.map(_._1).max - rows.map(_._1).min
    assert(spreads.sum.toDouble / spreads.length < global / 2.0,
      s"z buckets don't cluster dim a: ${spreads.mkString(",")} vs $global")
  }

  test("leakage split: every exact-dup group lands in ONE fold, and " +
      "singletons match the group-keyed draw") {
    import spark.implicits._
    // planted dup groups spread across ids that would OTHERWISE draw
    // different folds under the per-doc LCG (e.g. 17 vs 960017)
    (0 until 3000).map { i =>
      (i.toLong, if (i % 7 == 0) s"dup text ${i % 21}" else s"unique $i")
    }.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val rows = spark.sql(PipelineOps.leakageSplitSql(TA.SparkDialect))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val byGroup = rows.groupBy(_._2)
    assert(byGroup.forall { case (_, g) => g.map(_._3).distinct.size == 1 },
      "a dup group straddles folds")
    assert(byGroup.exists(_._2.length > 1), "no dup groups planted?")
    // representative's own row keys on itself: kept_id == doc_id
    assert(rows.filter(r => r._1 == r._2).nonEmpty)
    assert(rows.map(_._3).distinct.toSet
      .subsetOf(Set("train", "val", "test")))
    // per-doc draw WOULD have straddled: prove the guard changes folds
    val perDoc = spark.sql(PipelineOps.datasetSplitSql(TA.SparkDialect,
        "(SELECT doc_id, 'x' AS source, text FROM documents)"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val straddlers = byGroup.filter(_._2.length > 1).count { case (_, g) =>
      g.map(x => perDoc(x._1)).distinct.size > 1
    }
    assert(straddlers > 0, "fixture too small to demonstrate leakage")
  }

  test("near-dup leakage split: planted NEAR-dup (not identical) " +
      "groups land in one fold via their component representative") {
    import spark.implicits._
    // 40-word docs; i % 11 == 0 docs come in near-dup pairs (one word
    // edited — jaccard ~0.9, md5 DIFFERENT so the exact-dup split
    // would treat them as unrelated singletons)
    val docs = (0 until 600).flatMap { i =>
      val words = (0 until 40).map(w => s"w${(i * 40 + w) % 7919}")
      if (i % 11 == 0)
        Seq((i.toLong, words.mkString(" ")),
          (100000L + i, words.updated(20, "EDITED").mkString(" ")))
      else Seq((i.toLong, words.mkString(" ")))
    }.toDF("doc_id", "text")
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
      n = 3, numHashes = 128, bands = 64, tau = 0.5)
    val comp = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
    val rows = docs.select($"doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select($"doc_id",
        org.apache.spark.sql.functions.coalesce($"component", $"doc_id")
          .as("rep_id"))
      .withColumn("u",
        (($"rep_id" % 1000000L) * 2246822519L + 40503L) % 1000000L)
      .withColumn("split",
        org.apache.spark.sql.functions.when($"u" < 900000L, "train")
          .when($"u" < 950000L, "val").otherwise("test"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    val byGroup = rows.groupBy(_._2)
    val planted = byGroup.filter(_._2.length > 1)
    assert(planted.size >= 50, s"planted pairs missing: ${planted.size}")
    assert(planted.forall { case (_, g) =>
      g.map(_._3).distinct.size == 1 }, "a near-dup group straddles folds")
    // the pair members' ids (i vs 100000+i) WOULD straddle under a
    // per-doc draw for at least one group — the composition matters
    def perDocFold(id: Long): String = {
      val u = ((id % 1000000L) * 2246822519L + 40503L) % 1000000L
      if (u < 900000L) "train" else if (u < 950000L) "val" else "test"
    }
    assert(planted.exists { case (_, g) =>
      g.map(x => perDocFold(x._1)).distinct.size > 1 },
      "fixture too small to demonstrate near-dup leakage")
    Dedup.releaseCaches()
  }

  test("dsir: target-slice docs score above raw on average, and keep " +
      "tracks the sign of the mean log-ratio") {
    val rows = onDocs(PipelineOps.dsirScoreSql(TA.SparkDialect))
      .collect().map(r =>
        (r.getLong(0), r.getDouble(2), r.getInt(3)))
    val (target, raw) = rows.partition(_._1 % 10 < 3)
    def mean(xs: Array[(Long, Double, Int)]) =
      xs.map(_._2).sum / xs.length
    // the target LM must prefer its own slice over the raw average
    assert(mean(target) > mean(raw),
      s"no separation: target ${mean(target)} vs raw ${mean(raw)}")
    assert(rows.forall { case (_, s, k) => (s > 0) == (k == 1) ||
      s == 0.0 }, "keep flag disagrees with the score sign")
  }

  test("token-budget mix: shards stop at their budget boundary doc") {
    val rows = onDocs(PipelineOps.tokenBudgetMixSql(TA.SparkDialect))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_._1)
      val budget = sorted.head._5
      // every kept doc STARTS before the budget; the last one may
      // cross it (truncate-after semantics)
      sorted.foreach { case (_, _, tokens, cum, _) =>
        assert(cum - tokens < budget, s"$src doc starts past budget")
      }
      // the run is a prefix: all but the last end within budget only
      // if the next doc would start past it — i.e. last cum >= budget
      // unless the shard ran out of docs entirely
      val lastCum = sorted.last._4
      if (lastCum < budget) {
        // then every doc of the shard must have been kept
        val all = onDocs(
          s"SELECT count(*) c FROM documents WHERE source = '$src'")
          .head().getLong(0)
        assert(sorted.length == all, s"$src stopped before budget")
      }
    }
    // budgets actually bind on the fixture (some doc was dropped)
    val total = onDocs("SELECT count(*) c FROM documents")
      .head().getLong(0)
    assert(rows.length < total, "budget never bound — test is vacuous")
  }

  test("lm perplexity: train slice scores no worse than held-out; " +
      "nll bounded by smoothing floor") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    val rows = spark.sql(PipelineOps.lmPerplexitySql(TA.SparkDialect))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // every scored doc has >= 1 bigram and a positive, finite nll
    rows.foreach { case (id, n, nll) =>
      assert(n >= 1, s"doc $id")
      assert(nll > 0 && nll < 100, s"doc $id nll=$nll")
    }
    // the model must fit its own training slice at least as well as
    // unseen docs on average (a broken join would flatten this)
    val (tr, te) = rows.partition(_._1 % 10 < 3)
    val trMean = tr.map(_._3).sum / tr.length
    val teMean = te.map(_._3).sum / te.length
    assert(trMean <= teMean, s"train $trMean > heldout $teMean")
  }

  test("adaptive gate: keeps exactly the top half per source by rank") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    val rows = spark.sql(PipelineOps.adaptiveGateSql(TA.SparkDialect))
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val cnt = rs.length
      val kept = rs.filter(_.getInt(4) == 1)
      assert(kept.length == (cnt + 1) / 2, s"$src kept ${kept.length}/$cnt")
      // every kept quality >= every dropped quality (rank threshold)
      val minKept = kept.map(_.getDouble(2)).min
      val dropped = rs.filter(_.getInt(4) == 0)
      if (dropped.nonEmpty)
        assert(dropped.map(_.getDouble(2)).max <= minKept + 1e-12)
    }
  }

  test("normalize_text: lowercase, digits→0, punctuation→space, " +
      "whitespace collapsed; kept_frac bounded") {
    Seq((1L, "Hello, World!!  Call 555-1234 NOW."),
        (2L, "...???!!!"), (3L, "plain words"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents")
    val rows = spark.sql(PipelineOps.normalizeTextSql(TA.SparkDialect))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toMap
    assert(rows(1L)._1 === "hello world call 000 0000 now")
    assert(rows(2L)._1 === "") // punctuation soup normalizes away
    assert(rows(2L)._4 === 0.0)
    assert(rows(3L)._1 === "plain words")
    rows.values.foreach { case (_, raw, norm, frac) =>
      assert(norm <= raw + 1 && frac >= 0.0 && frac <= 1.0 + 1e-9)
    }
  }
}
