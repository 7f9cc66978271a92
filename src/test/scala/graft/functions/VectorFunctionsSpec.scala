package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => V}

class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 6.0f, 8.0f)),
    (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f))
  ).toDF("a", "b")

  test("l2sq_dist matches hand computation") {
    val r = df.select(V.l2sq_dist($"a", $"b")).as[Double].collect()
    assert(r(0) === 9.0 + 16.0 + 25.0)
    assert(r(1) === 1.0)
  }

  test("inner_product and l1_dist") {
    val r = df.select(V.inner_product($"a", $"b"), V.l1_dist($"a", $"b"))
      .as[(Double, Double)].collect()
    assert(r(0)._1 === 4.0 + 12.0 + 24.0)
    assert(r(0)._2 === 3.0 + 4.0 + 5.0)
  }

  test("cos_dist: parallel vectors → 0, zero vector → NaN") {
    val d = Seq((Array(1f, 2f), Array(2f, 4f))).toDF("a", "b")
      .select(V.cos_dist($"a", $"b")).as[Double].head()
    assert(math.abs(d) < 1e-12)
    val nan = df.where($"a"(0) === 0f)
      .select(V.cos_dist($"a", $"b")).as[Double].head()
    assert(nan.isNaN)
  }

  test("hamming_dist counts differing elements") {
    val r = Seq((Array(1, 0, 1, 1), Array(1, 1, 1, 0))).toDF("a", "b")
      .select(V.hamming_dist($"a", $"b")).as[Long].head()
    assert(r === 2L)
  }

  test("vector_norm and normalize") {
    val d = Seq(Tuple1(Array(3f, 4f))).toDF("a")
    assert(d.select(V.vector_norm($"a")).as[Double].head() === 5.0)
    val n = d.select(V.vector_normalize($"a")).as[Array[Float]].head()
    assert(math.abs(n(0) - 0.6f) < 1e-6 && math.abs(n(1) - 0.8f) < 1e-6)
    // zero vector passes through
    val z = Seq(Tuple1(Array(0f, 0f))).toDF("a")
      .select(V.vector_normalize($"a")).as[Array[Float]].head()
    assert(z.toSeq == Seq(0f, 0f))
  }

  test("SQL registration works") {
    val r = spark.sql(
      "SELECT l2sq_dist(array(1.0, 2.0), array(3.0, 2.0)) AS d").head().getDouble(0)
    assert(r === 4.0)
  }

  test("multiple distance expressions codegen together (fresh locals)") {
    // non-nullable inputs make nullSafeCodeGen emit snippets flat in
    // the enclosing scope: fixed local names would collide and Janino
    // would reject the generated class. CODEGEN_ONLY turns the silent
    // interpreter fallback into a hard failure.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.sql(
        """SELECT l2sq_dist(array(1.0, 2.0), array(3.0, 4.0)) AS a,
          |       cos_dist(array(1.0, 2.0), array(1.0, 2.0)) AS b,
          |       inner_product(array(1.0, 2.0), array(3.0, 4.0)) AS c,
          |       l1_dist(array(1.0, 2.0), array(3.0, 4.0)) AS d,
          |       vector_norm(array(3.0, 4.0)) AS e,
          |       hamming_dist(array(1, 0), array(1, 1)) AS f""".stripMargin)
        .head()
      assert(r.getDouble(0) === 8.0)
      assert(math.abs(r.getDouble(1)) < 1e-12)
      assert(r.getDouble(2) === 11.0)
      assert(r.getDouble(3) === 4.0)
      assert(r.getDouble(4) === 5.0)
      assert(r.getLong(5) === 1L)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("dimension mismatch raises") {
    val bad = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(V.l2sq_dist($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("dimension mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("dimension mismatch"))
  }

  test("bq_encode packs sign bits 64-per-long; bq_hamming == sign disagreements") {
    // 70 dims forces a 2-word pack; values straddle 0 so both words
    // carry bits. The unpacked reference count is computed inline.
    val rnd = new scala.util.Random(7)
    val a = Array.fill(70)(rnd.nextFloat() - 0.5f)
    val b = Array.fill(70)(rnd.nextFloat() - 0.5f)
    val expected = a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }
    val d = Seq((a, b)).toDF("a", "b")
    val hd = d.select(
      V.bq_hamming(V.bq_encode($"a"), V.bq_encode($"b"))).as[Long].head()
    assert(hd === expected.toLong)
    // word count is ceil(70/64) = 2
    val words = d.select(V.bq_encode($"a")).as[Array[Long]].head()
    assert(words.length === 2)
    // zero is NOT positive: sign bit clear, matching `x > 0` in the
    // q_sign_hamming convention
    val z = Seq(Tuple1(Array(0f, 1f))).toDF("a")
      .select(V.bq_encode($"a")).as[Array[Long]].head()
    assert(z(0) === 2L)
  }

  test("bq functions on the SQL surface, codegen only") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val r = spark.sql(
        """SELECT bq_hamming(bq_encode(array(1.0, -2.0, 3.0)),
          |                  bq_encode(array(-1.0, -2.0, 3.0))) AS h""".stripMargin)
        .head().getLong(0)
      assert(r === 1L)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("distances on real embeddings table are finite and symmetric-ish") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val self = emb.select(V.l2sq_dist($"embedding", $"embedding").as("d"))
      .agg(max($"d")).as[Double].head()
    assert(self === 0.0)
  }

  test("*_f64 functions read ARRAY<DOUBLE> at full precision — a " +
      "float32 downcast would be off by ~1e-8 relative and fail " +
      "these exact comparisons") {
    val third = 1.0 / 3.0 // not representable in float32
    val dd = Seq((Array(third, 2.0, 3.0), Array(0.0, 0.0, 0.0)))
      .toDF("a", "b")
    val r = dd.select(
      V.l2sq_dist_f64($"a", $"b"),
      V.inner_product_f64($"a", $"a"),
      V.vector_norm_f64($"a")).collect().head
    assert(r.getDouble(0) === third * third + 4.0 + 9.0) // exact doubles
    assert(r.getDouble(1) === third * third + 4.0 + 9.0)
    assert(r.getDouble(2) === math.sqrt(third * third + 4.0 + 9.0))
    // the float path on the same values differs (downcast happened)
    val f = dd.select(V.l2sq_dist($"a", $"b")).as[Double].head()
    assert(f !== third * third + 4.0 + 9.0)
    assert(math.abs(f - (third * third + 4.0 + 9.0)) < 1e-6)
    // SQL surface resolves the f64 names
    val viaSql = spark.sql(
      "SELECT l2sq_dist_f64(array(1.0D/3.0D), array(0.0D)) AS d")
      .as[Double].head()
    assert(viaSql === third * third)
  }
}
