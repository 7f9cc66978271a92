package graft.operators

import graft.SparkSuite
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class SparseSearchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"$sf0001/documents.parquet")

  test("sparse_dot merges sorted index/value pairs: overlap, " +
      "disjoint, self") {
    val df = Seq((
      Array(1, 3, 7), Array(2L, 5L, 1L),
      Array(3, 7, 9), Array(4L, 10L, 100L)
    )).toDF("ia", "va", "ib", "vb")
    val r = df.select(
      T.sparse_dot($"ia", $"va", $"ib", $"vb"),
      T.sparse_dot($"ia", $"va", $"ia", $"va")).head()
    assert(r.getLong(0) === 5L * 4L + 1L * 10L) // shared idx 3 and 7
    assert(r.getLong(1) === 4L + 25L + 1L) // self dot
    val disjoint = Seq((Array(1), Array(9L), Array(2), Array(9L)))
      .toDF("ia", "va", "ib", "vb")
      .select(T.sparse_dot($"ia", $"va", $"ib", $"vb")).as[Long].head()
    assert(disjoint === 0L)
  }

  test("fnv_hash matches the scala fold and the SQL surface resolves") {
    val got = Seq("table").toDF("t")
      .select(T.fnv_hash($"t")).as[Long].head()
    assert(got === graft.functions.TextHash.fnv1a(
      org.apache.spark.unsafe.types.UTF8String.fromString("table")))
    assert(spark.sql("SELECT fnv_hash('table') AS h").as[Long].head()
      === got)
  }

  test("postings: impacts are positive integers, collisions merge tf " +
      "before the log, and sparseVectors sorts indices ascending") {
    val p = SparseSearch.postings(docs, "doc_id", "text")
    val bad = p.where($"w" < 1L).count()
    assert(bad === 0, "non-positive impact")
    // tf=1 → floor(100 ln 2 + .5) = 69; a doc repeating a word beats it
    val single = Seq((1L, "unique"), (2L, "dup dup dup"))
      .toDF("doc_id", "text")
    val sp = SparseSearch.postings(single, "doc_id", "text")
      .orderBy($"id").collect()
    assert(sp(0).getLong(2) === 69L) // ln(2)*100 rounded
    assert(sp(1).getLong(2) === math.floor(100.0 * math.log(4.0) + 0.5)
      .toLong)
    val sv = SparseSearch.sparseVectors(docs, "doc_id", "text")
    sv.select($"indices").as[Seq[Int]].take(20).foreach { idx =>
      assert(idx.zip(idx.tail).forall { case (a, b) => a < b },
        "indices not strictly ascending")
    }
  }

  test("topK reads only query-term postings (posting-list pattern, " +
      "no cross join) and scores integer impacts") {
    val res = SparseSearch.topK(docs, "doc_id", "text",
      Seq("table", "scan", "fast"), 10)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"sparse topK cross-joined:\n$plan")
    // the early isin filter reaches the scan side of the posting agg
    assert(plan.contains("idx#") && plan.contains("IN") ||
      plan.contains("INSET"), s"query-term filter missing:\n$plan")
    val rows = res.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    // descending integer scores, ties by id
    val scores = rows.map(_.getLong(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }
}
