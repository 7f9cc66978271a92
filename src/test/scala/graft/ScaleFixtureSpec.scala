package graft

import org.apache.spark.sql.functions._

/** Guards the scale-certification tool itself: ScaleBench's growth
  * factors are only meaningful if ScaleFixture's amplification really
  * is structure-preserving — replica 0 verbatim, key namespaces
  * disjoint, and the per-replica letter cipher a BIJECTION on text
  * (which is what makes every within-replica shingle set, Jaccard
  * score and edit distance carry over exactly).
  */
class ScaleFixtureSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"$sf0001/documents.parquet").limit(200).cache()

  test("documents: 3x amplification is disjoint, replica-0-verbatim, " +
      "and the cipher inverts back to the original text") {
    val out = ScaleFixture.documents(docs, 3).cache()
    val n = docs.count()
    assert(out.count() === 3 * n)
    // doc_id namespaces disjoint: total distinct = 3x source distinct
    assert(out.select($"doc_id").distinct().count() === 3 * n)
    // replica 0 verbatim
    val r0 = out.join(docs.select($"doc_id", $"text".as("orig")), "doc_id")
    assert(r0.where($"text" =!= $"orig").count() === 0)
    // replica 2's text reverse-translates to the original — the cipher
    // is a bijection, so all set/distance structure is preserved
    val md = docs.agg(max("doc_id")).collect()(0).getLong(0) + 1
    val lower = ('a' to 'z').mkString; val upper = ('A' to 'Z').mkString
    val rot2 = lower.drop(2) + lower.take(2) + upper.drop(2) + upper.take(2)
    val back = ScaleFixture.documents(docs, 3)
      .where($"doc_id" >= 2 * md)
      .withColumn("doc_id", $"doc_id" - 2 * md)
      .withColumn("undone", translate($"text", rot2, lower + upper))
      .join(docs.select($"doc_id", $"text".as("orig")), "doc_id")
    assert(back.where($"undone" =!= $"orig").count() === 0)
    // cross-replica token overlap collapsed: replica 2 shares no
    // (letter-bearing) text values with replica 0
    val t0 = out.where($"doc_id" < md).select($"text")
    val t2 = out.where($"doc_id" >= 2 * md).select($"text")
      .where($"text".rlike("[A-Za-z]"))
    assert(t0.intersect(t2).count() === 0)
  }

  test("customer: ciphered names keep within-replica edit distances " +
      "exactly and replica name sets disjoint") {
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .limit(100).cache()
    val out = ScaleFixture.customer(cust, 2).cache()
    val mc = cust.agg(max("c_custkey")).collect()(0).getLong(0) + 1
    // replica 1's pairwise levenshtein == replica 0's for the same
    // base-key pairs (bijective letter map, digits untouched)
    def pairs(repl: Int) = {
      val r = out.where($"c_custkey" >= repl * mc &&
          $"c_custkey" < (repl + 1) * mc)
        .select(($"c_custkey" % mc).as("k"), $"c_name")
      r.as("a").join(r.as("b"), $"a.k" < $"b.k")
        .select($"a.k".as("ka"), $"b.k".as("kb"),
          levenshtein($"a.c_name", $"b.c_name").as("ed"))
    }
    val joined = pairs(0).as("p0").join(pairs(1).as("p1"),
      $"p0.ka" === $"p1.ka" && $"p0.kb" === $"p1.kb")
    assert(joined.count() > 0)
    assert(joined.where($"p0.ed" =!= $"p1.ed").count() === 0)
    // name sets disjoint across replicas
    val n0 = out.where($"c_custkey" < mc).select($"c_name")
    val n1 = out.where($"c_custkey" >= mc).select($"c_name")
    assert(n0.intersect(n1).count() === 0)
  }

  test("embeddings: replica 0 bit-identical, jittered replicas keep " +
      "ids disjoint and dimension intact") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .limit(50).cache()
    val out = ScaleFixture.embeddings(emb, 2).cache()
    val n = emb.count()
    assert(out.count() === 2 * n)
    assert(out.select($"vec_id").distinct().count() === 2 * n)
    val r0 = out.join(emb.select($"vec_id", $"embedding".as("orig")),
      "vec_id")
    assert(r0.where($"embedding" =!= $"orig").count() === 0)
    val mv = emb.agg(max("vec_id")).collect()(0).getLong(0) + 1
    val r1 = out.where($"vec_id" >= mv)
    assert(r1.where(size($"embedding") =!=
      lit(emb.select(size($"embedding")).head().getInt(0))).count() === 0)
  }
}
