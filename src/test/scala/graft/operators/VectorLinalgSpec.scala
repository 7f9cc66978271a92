package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{VectorFunctions => VF}

class VectorLinalgSpec extends SparkSuite {
  import spark.implicits._

  private def naiveMoments(rows: Seq[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = rows.length
    val d = rows.head.length
    val mean = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    }
    (mean, cov)
  }

  private val rnd = new scala.util.Random(42)
  private val data: Seq[(Long, Array[Float])] =
    (0L until 200L).map(i => (i, Array.fill(6)(rnd.nextGaussian().toFloat)))

  test("VectorMoments matches the naive two-pass computation") {
    val df = data.toDF("id", "v")
    val (n, mean, cov) = Pca.moments(df, "v")
    assert(n === 200L)
    val (em, ec) = naiveMoments(data.map(_._2.map(_.toDouble)))
    mean.zip(em).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    for (i <- 0 until 6; j <- 0 until 6)
      assert(math.abs(cov(i)(j) - ec(i)(j)) < 1e-9)
  }

  test("VectorMoments is merge-order independent across partitionings") {
    val one = Pca.moments(data.toDF("id", "v").coalesce(1), "v")
    val many = Pca.moments(data.toDF("id", "v").repartition(7), "v")
    assert(one._1 === many._1)
    one._2.zip(many._2).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
    for (i <- 0 until 6; j <- 0 until 6)
      assert(math.abs(one._3(i)(j) - many._3(i)(j)) < 1e-9)
  }

  test("Jacobi reconstructs A = V' diag(w) V with orthonormal V") {
    val d = 10
    val r = new scala.util.Random(7)
    val b = Array.fill(d, d)(r.nextGaussian())
    // symmetric a = b + b'
    val a = Array.tabulate(d, d)((i, j) => b(i)(j) + b(j)(i))
    val (w, v) = Jacobi.eigSym(a)
    // descending eigenvalues
    w.sliding(2).foreach { p => assert(p(0) >= p(1) - 1e-12) }
    // orthonormal rows
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => v(i)(k) * v(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    // reconstruction
    for (i <- 0 until d; j <- 0 until d) {
      val rec = (0 until d).map(k => v(k)(i) * w(k) * v(k)(j)).sum
      assert(math.abs(rec - a(i)(j)) < 1e-8)
    }
  }

  test("Pca: trace equals eigenvalue sum; projected variance matches " +
      "eigenvalues; reconstruction error shrinks with k") {
    val df = spark.read.parquet(s"$sf001/embeddings.parquet")
    val model = Pca.fit(df, "embedding", 64)
    assert(math.abs(model.eigenvalues.sum - model.trace) < 1e-6 *
      math.max(1.0, math.abs(model.trace)))
    // population variance of each projected coordinate == eigenvalue
    val proj = Pca.project(df, "embedding", model, "p")
      .select(posexplode($"p").as(Seq("c", "x")))
      .groupBy($"c")
      .agg((avg($"x" * $"x") - avg($"x") * avg($"x")).as("variance"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (c <- 0 until 8)
      assert(math.abs(proj(c) - model.eigenvalues(c)) <
        1e-6 * math.max(1.0, model.eigenvalues(c)), s"component $c")
    // eigenvalues descending
    model.eigenvalues.sliding(2).foreach { p =>
      assert(p(0) >= p(1) - 1e-12)
    }
    def mse(k: Int): Double = {
      val m = model.copy(eigenvalues = model.eigenvalues.take(k),
        components = model.components.take(k))
      Pca.reconstructionError(df, "embedding", m, "err")
        .agg(avg($"err")).collect()(0).getDouble(0)
    }
    val errs = Seq(1, 4, 16).map(mse)
    assert(errs(0) > errs(1) && errs(1) > errs(2))
    // mean residual at k == sum of dropped eigenvalues
    val dropped = model.eigenvalues.drop(4).sum
    assert(math.abs(errs(1) - dropped) < 1e-6 * math.max(1.0, dropped))
  }

  test("Mahalanobis: mean over fitting corpus == d (trace identity); " +
      "synthetic direction scores t^2/lambda") {
    val df = spark.read.parquet(s"$sf001/embeddings.parquet")
    val model = Pca.fit(df, "embedding", 64)
    val meanScore = Pca.mahalanobis(df, "embedding", model, "s")
      .agg(avg($"s")).collect()(0).getDouble(0)
    assert(math.abs(meanScore - 64.0) < 1e-6, s"mean $meanScore")
    // x = mean + t * v_0 has squared Mahalanobis t^2 / lambda_0
    val t = 0.37
    val x = model.mean.zip(model.components(0))
      .map { case (m, v) => (m + t * v).toFloat }
    val one = Seq(Tuple1(x)).toDF("embedding")
    val s0 = Pca.mahalanobis(one, "embedding", model, "s")
      .collect()(0).getAs[Double]("s")
    val expect = t * t / model.eigenvalues(0)
    // float32 storage of x costs ~1e-7 relative precision
    assert(math.abs(s0 - expect) < 1e-4 * math.max(1.0, expect),
      s"$s0 vs $expect")
  }

  test("zscoreSquared matches the naive per-dimension computation") {
    val df = data.toDF("id", "v")
    val (em, ec) = naiveMoments(data.map(_._2.map(_.toDouble)))
    val sds = em.indices.map(i => math.sqrt(ec(i)(i)))
    val got = Pca.zscoreSquared(df, "v", "s")
      .select($"id", $"s").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    data.foreach { case (id, v) =>
      val want = v.indices.map { j =>
        val z = (v(j) - em(j)) / sds(j); z * z
      }.sum
      assert(math.abs(got(id) - want) < 1e-9, s"row $id")
    }
  }

  test("RandomProject matches a reference computation and is usable " +
      "from SQL") {
    val df = data.toDF("id", "v")
    val out = df.select($"id", VF.rand_project($"v", 4).as("y"))
      .orderBy($"id").collect()
    val scale = math.sqrt(3.0 / 4)
    data.sortBy(_._1).zip(out).foreach { case ((_, v), row) =>
      val y = row.getSeq[Double](1)
      for (c <- 0 until 4) {
        var acc = 0.0
        for (j <- v.indices) {
          val vh = (c + 1).toLong * 12345L + (j + 1).toLong
          val h = (vh * vh * vh) % 101L % 6L
          val s = if (h == 0L) 1.0 else if (h == 1L) -1.0 else 0.0
          acc += v(j).toDouble * s
        }
        assert(math.abs(y(c) - scale * acc) < 1e-12)
      }
    }
    // SQL surface
    df.createOrReplaceTempView("rp_in")
    val viaSql = spark.sql(
      "SELECT id, rand_project(v, 4) AS y FROM rp_in ORDER BY id")
      .collect()
    out.zip(viaSql).foreach { case (a, b) =>
      assert(a.getSeq[Double](1) === b.getSeq[Double](1))
    }
  }

  test("RandomProject preserves pairwise distances within JL bounds " +
      "on real embeddings") {
    val df = spark.read.parquet(s"$sf001/embeddings.parquet").limit(40)
    val p = df.select($"vec_id", $"embedding",
      VF.rand_project($"embedding", 32).as("y")).collect()
    val pairs = (for {
      i <- p.indices; j <- p.indices if i < j
    } yield {
      val a = p(i).getSeq[Float](1); val b = p(j).getSeq[Float](1)
      val ya = p(i).getSeq[Double](2); val yb = p(j).getSeq[Double](2)
      val d0 = a.zip(b).map { case (x, y) =>
        (x - y).toDouble * (x - y) }.sum
      val d1 = ya.zip(yb).map { case (x, y) => (x - y) * (x - y) }.sum
      (d0, d1 / d0)
      // near-duplicate pairs (the testdata plants some) have d0 ~ 0,
      // where the ratio is numerically meaningless — JL speaks about
      // separated points
    }).filter(_._1 > 1e-2).map(_._2)
    assert(pairs.nonEmpty)
    // k=32 is a loose JL regime and the guarantee is probabilistic:
    // assert the distribution, not the worst pair (one deterministic
    // unlucky direction may collapse)
    val mean = pairs.sum / pairs.size
    assert(mean > 0.7 && mean < 1.3, s"mean ratio $mean")
    val sortedR = pairs.sorted
    val med = sortedR(sortedR.size / 2)
    assert(med > 0.7 && med < 1.4, s"median ratio $med")
    val within = pairs.count(r => r > 0.4 && r < 2.5).toDouble / pairs.size
    assert(within > 0.9, s"only ${within * 100}%% of pairs within 2.5x")
  }
}
