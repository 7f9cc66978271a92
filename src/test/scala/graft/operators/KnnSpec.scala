package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSuite {
  import spark.implicits._

  lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("self is always nearest with dist 0 under l2sq") {
    val queries = emb.where($"vec_id" < 5)
    val r = Knn.topK(emb, queries, "vec_id", "embedding", 3)
    val first = r.where($"rank" === 1).select($"qid", $"nid", $"dist")
      .as[(Long, Long, Double)].collect()
    assert(first.length === 5)
    first.foreach { case (q, n, d) => assert(q === n && d === 0.0) }
  }

  test("topK returns exactly k ranked rows per query, dist ascending") {
    val queries = emb.where($"vec_id" < 3)
    val r = Knn.topK(emb, queries, "vec_id", "embedding", 7).collect()
    assert(r.length === 21)
    val byQ = r.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq === (1 to 7))
      val dists = sorted.map(_.getDouble(3)).toSeq
      assert(dists === dists.sorted)
    }
  }

  test("TopK aggregate matches window ranking (ties broken by id)") {
    val queries = emb.where($"vec_id" < 10)
    val agg = Knn.topK(emb, queries, "vec_id", "embedding", 10)
      .select($"qid", $"nid", $"rank")
    // window-based reference plan
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{VectorFunctions => V}
    val q = queries.select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val pairs = emb.crossJoin(broadcast(q))
      .select($"qid", $"vec_id".as("nid"),
        V.l2sq_dist($"embedding", $"qvec").as("dist"))
    val w = Window.partitionBy($"qid").orderBy($"dist", $"nid")
    val win = pairs.select($"qid", $"nid", row_number().over(w).as("rank"))
      .where($"rank" <= 10)
    assert(agg.except(win).count() === 0 && win.except(agg).count() === 0)
  }

  test("recall of identical result sets is 1.0") {
    val queries = emb.where($"vec_id" < 4)
    val t = Knn.topK(emb, queries, "vec_id", "embedding", 5)
    val rec = Knn.recall(t, t, 5).select($"recall").as[Double].collect()
    assert(rec.length === 4 && rec.forall(_ === 1.0))
  }

  test("string ids use the window fallback with identical semantics") {
    val strEmb = emb.select(concat(lit("id-"), $"vec_id").as("vec_id"),
      $"embedding")
    val queries = strEmb.where($"vec_id".isin("id-0", "id-1"))
    val r = Knn.topK(strEmb, queries, "vec_id", "embedding", 5)
    assert(r.count() === 10)
    val first = r.where($"rank" === 1)
      .select($"qid", $"nid").as[(String, String)].collect()
    first.foreach { case (q, n) => assert(q === n) } // self nearest
    // agrees with the long-id aggregate path modulo the id prefix
    val longR = Knn.topK(emb, emb.where($"vec_id" < 2), "vec_id",
      "embedding", 5).select(concat(lit("id-"), $"qid"),
        concat(lit("id-"), $"nid"), $"rank")
      .as[(String, String, Int)].collect().toSet
    val strR = r.select($"qid", $"nid", $"rank")
      .as[(String, String, Int)].collect().toSet
    assert(strR === longR)
    // both id paths expose the SAME column order (positional readers)
    assert(r.columns.toSeq === Seq("qid", "nid", "rank", "dist"))
  }

  test("MMR: lambda=1 reduces to distance order; lambda=0.3 demotes " +
      "the near-duplicate of an already-picked result") {
    // corpus: A and its near-copy A2 closest to the query, B slightly
    // farther but pointing elsewhere
    val corpus = Seq(
      (1L, Seq(1.00f, 0.00f)),  // A
      (2L, Seq(0.99f, 0.05f)),  // A2 ~ duplicate of A
      (3L, Seq(0.60f, 0.75f)),  // B: diverse direction
      (4L, Seq(-1.0f, 0.00f))   // far away
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Knn.topK(corpus, q, "vec_id", "embedding", 4)
    def order(lambda: Double) =
      Knn.mmrRerank(top, corpus, "vec_id", "embedding", lambda, m = 3)
        .orderBy($"mmr_rank").select($"nid").as[Long].collect().toSeq
    assert(order(1.0) === Seq(1L, 2L, 3L)) // pure relevance
    val diverse = order(0.3)
    assert(diverse.head === 1L)
    assert(diverse(1) === 3L, s"near-dup not demoted: $diverse")
    // output is always a subset of the candidate set, sized m
    assert(diverse.toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
    assert(diverse.size === 3)
  }

  test("dot metric ranks by largest inner product") {
    val queries = emb.where($"vec_id" === 0)
    val r = Knn.topK(emb, queries, "vec_id", "embedding", 2, "dot")
      .where($"rank" === 1).select($"nid").as[Long].head()
    assert(r === 0L) // unit vectors: self-dot = 1 is max
  }

  test("rankQuality: hand-computed MRR and nDCG, perfect list " +
      "scores 1, zero-hit list scores 0") {
    val truth = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3),
      (2L, 10L, 1), (2L, 20L, 2), (2L, 30L, 3),
      (3L, 10L, 1), (3L, 20L, 2), (3L, 30L, 3))
      .toDF("qid", "nid", "rank")
    val result = Seq(
      // q1: miss at rank 1, hits at 2 and 3
      (1L, 99L, 1), (1L, 10L, 2), (1L, 20L, 3),
      // q2: the truth list verbatim
      (2L, 10L, 1), (2L, 20L, 2), (2L, 30L, 3),
      // q3: no hits at all
      (3L, 97L, 1), (3L, 98L, 2), (3L, 99L, 3))
      .toDF("qid", "nid", "rank")
    val m = Knn.rankQuality(truth, result, 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1),
        r.getDouble(2))).toMap
    assert(m(1L)._1 === 0.5) // first hit at rank 2
    // DCG = 1/log2(3) + 1/log2(4); IDCG = 1 + 1/log2(3) + 1/log2(4)
    val dcg = 1.0 / (math.log(3) / math.log(2)) + 0.5
    val idcg = 1.0 + dcg
    assert(m(1L)._2 === math.rint(dcg / idcg * 10000) / 10000)
    assert(m(2L) === ((1.0, 1.0)))
    assert(m(3L) === ((0.0, 0.0)))
  }
}
