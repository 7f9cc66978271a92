package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PqSpec extends SparkSuite {
  import spark.implicits._

  // pq_test_with_db.rs:14-24 analog: 1000 rows, 128-dim, seeded uniform
  private lazy val pqInput = {
    val rnd = new scala.util.Random(42)
    (0 until 1000).map(i =>
      (i.toLong, Array.fill(128)(rnd.nextFloat()))).toDF("id", "v")
  }

  test("splitLayout: last split absorbs remainder") {
    val l = ProductQuantizer.splitLayout(10, 3)
    assert(l.map(s => (s.start, s.len)) === Seq((0, 3), (3, 3), (6, 4)))
  }

  test("codebook shape and quantization completeness (reference e2e)") {
    // clusters=10 splits=32 → codebook 320 rows of dim 4; all rows
    // quantized, len 32, non-null (pq_test_with_db.rs:94-117)
    val cb = ProductQuantizer.fitCodebook(pqInput, "id", "v",
      clusters = 10, splits = 32)
    assert(cb.count() === 320)
    assert(cb.select(size($"c")).distinct().as[Int].collect().toSeq === Seq(4))
    val q = ProductQuantizer.quantizeColumn(pqInput, "v", "v_pq", cb)
    assert(q.where($"v_pq".isNull).count() === 0)
    assert(q.select(size($"v_pq")).distinct().as[Int].collect().toSeq ===
      Seq(32))
    assert(q.count() === 1000)
  }

  test("validations mirror pq/mod.rs") {
    intercept[IllegalArgumentException] {
      ProductQuantizer.fitCodebook(pqInput, "id", "v", 257, 4)
    }
    intercept[IllegalArgumentException] {
      ProductQuantizer.fitCodebook(pqInput, "id", "v", 16, 4,
        datasetLimit = Some(8))
    }
    intercept[IllegalArgumentException] {
      ProductQuantizer.splitLayout(8, 9)
    }
  }

  test("reconstruction error decreases with more clusters") {
    def mse(clusters: Int): Double = {
      val cb = ProductQuantizer.fitCodebook(pqInput, "id", "v",
        clusters, splits = 8, maxIter = 10)
      val q = ProductQuantizer.quantizeColumn(pqInput, "v", "v_pq", cb)
      val d = ProductQuantizer.dequantizeColumn(q, "v_pq", "v_hat", cb)
      d.select(graft.functions.VectorFunctions
        .l2sq_dist($"v", $"v_hat").as("e"))
        .agg(avg($"e")).as[Double].head()
    }
    val e2 = mse(2)
    val e32 = mse(32)
    assert(e32 < e2)
    assert(e32 > 0.0)
  }

  test("dequantize round-trips codes above 127 (u8 wrap)") {
    // 200 clusters forces codes > 127 → negative bytes; (b & 0xFF)
    // must recover them
    val cb = ProductQuantizer.fitCodebook(pqInput, "id", "v",
      clusters = 200, splits = 4, maxIter = 3)
    val q = ProductQuantizer.quantizeColumn(pqInput, "v", "v_pq", cb)
    val hasHigh = q.select(explode($"v_pq").as("c"))
      .where($"c" < 0).count()
    assert(hasHigh > 0) // wrap actually exercised
    val d = ProductQuantizer.dequantizeColumn(q, "v_pq", "v_hat", cb)
    val err = d.select(graft.functions.VectorFunctions
      .l2sq_dist($"v", $"v_hat").as("e")).agg(avg($"e"))
      .as[Double].head()
    assert(err < 128 * 0.1) // sane reconstruction, not garbage
  }

  test("quantization is deterministic across runs") {
    val cb = ProductQuantizer.fitCodebook(pqInput, "id", "v", 10, 8,
      maxIter = 5)
    val q1 = ProductQuantizer.quantizeColumn(pqInput, "v", "p", cb)
      .select($"id", $"p").collect().map(r =>
        r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val q2 = ProductQuantizer.quantizeColumn(pqInput, "v", "p", cb)
      .select($"id", $"p").collect().map(r =>
        r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(q1 === q2)
  }

  test("OPQ rotation is orthonormal and lowers reconstruction error " +
      "on a cross-split-correlated corpus at the same code budget") {
    // 4 latent factors SPREAD ACROSS every natural subvector: each of
    // the 4 contiguous splits sees all 4 factors, so plain PQ wastes
    // its 16 centroids modeling correlated structure; OPQ's PCA
    // rotation concentrates each factor and the eigenvalue allocation
    // deals one factor per subquantizer.
    val rnd = new scala.util.Random(7)
    val corr = (0 until 2000).map { i =>
      val f = Array.fill(4)(rnd.nextGaussian())
      val v = Array.tabulate(16)(j => (f(j % 4) +
        0.05 * rnd.nextGaussian()).toFloat)
      (i.toLong, v)
    }.toDF("id", "v")
    corr.cache().count()
    val splits = 4
    val rot = Opq.fitRotation(corr, "v", splits)
    // orthonormality: R * R^T = I (isometry — the whole point)
    val d = rot.length
    assert(d === 16)
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(k => rot(a)(k) * rot(b)(k)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R R^T [$a][$b] = $dot")
    }
    val rotated = Opq.rotateColumn(corr, "v", "rv", rot)
    // rotation preserves the metric: pairwise L2 unchanged (spot rows)
    val twoV = corr.orderBy($"id").limit(2)
      .select($"v").as[Array[Float]].collect()
    val twoR = rotated.orderBy($"id").limit(2)
      .select($"rv").as[Array[Float]].collect()
    def l2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) =>
        (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    assert(math.abs(l2(twoV(0), twoV(1)) - l2(twoR(0), twoR(1))) < 1e-4)
    // same code budget: 16 centroids x 4 splits
    val cbPlain = ProductQuantizer.fitCodebook(corr, "id", "v",
      clusters = 16, splits = splits, maxIter = 10)
    val cbOpq = ProductQuantizer.fitCodebook(rotated, "id", "rv",
      clusters = 16, splits = splits, maxIter = 10)
    val msePlain = Opq.reconstructionMse(corr, "v", cbPlain)
    val mseOpq = Opq.reconstructionMse(rotated, "rv", cbOpq)
    info(f"plain PQ mse $msePlain%.4f, OPQ mse $mseOpq%.4f " +
      f"(${msePlain / mseOpq}%.2fx better)")
    assert(mseOpq < msePlain * 0.8,
      f"OPQ did not improve: $mseOpq%.4f vs plain $msePlain%.4f")
  }
}
