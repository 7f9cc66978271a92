package graft.operators

import scala.util.Random

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HllSpec extends SparkSuite {
  import spark.implicits._

  private def regsOf(keys: Seq[Long], p: Int): Array[Int] = {
    val m = 1 << p
    val regs = new Array[Int](m)
    keys.distinct.foreach { x =>
      val h = Hll.hash64(x)
      val b = Hll.bucket(h, p); val r = Hll.rho(h, p)
      if (r > regs(b)) regs(b) = r
    }
    regs
  }

  test("sketch of a union equals elementwise max of the part sketches") {
    val a = (1L to 5000L).toSeq
    val b = (2500L to 9000L).toSeq
    val ra = regsOf(a, 10); val rb = regsOf(b, 10)
    val merged = ra.zip(rb).map { case (x, y) => math.max(x, y) }
    assert(merged.toSeq == regsOf(a ++ b, 10).toSeq)
    // and the distributed aggregate agrees with the model
    graft.functions.VectorFunctions.register(spark)
    val df = (a ++ b).toDF("x").repartition(8)
    val got = df.selectExpr("hll_sketch(x, 10) AS r")
      .selectExpr("r").as[Seq[Int]].head()
    assert(got == merged.toSeq)
  }

  test("estimate accuracy: within 5% at p=12 over 100k mixed keys") {
    val rnd = new Random(3)
    val keys = (1L to 60000L) ++ (0 until 40000).map(_ => rnd.nextLong())
    val n = keys.distinct.size
    val est = Hll.estimate(regsOf(keys, 12))
    assert(math.abs(est.toDouble / n - 1.0) < 0.05,
      s"est $est vs true $n")
  }

  test("small-range linear counting kicks in and stays deterministic") {
    // 100 distinct at p=12: raw is biased high-m-low-n; the correction
    // must fire (zero registers present, raw <= 2.5m) and land close.
    val keys = (1L to 100L).toSeq
    val regs = regsOf(keys, 12)
    val raw = Hll.rawEstimate(regs)
    assert(regs.count(_ == 0) > 0 && raw * 2 <= BigInt(5) * 4096)
    val est = Hll.estimate(regs)
    assert(math.abs(est.toDouble / 100 - 1.0) < 0.05, s"lc est $est")
  }

  test("SQL surface: zip_with-merged day sketches match the total") {
    graft.functions.VectorFunctions.register(spark)
    val day1 = (1L to 3000L).map(("d1", _))
    val day2 = (2000L to 6000L).map(("d2", _))
    (day1 ++ day2).toDF("day", "x").createOrReplaceTempView("hits")
    // per-day sketches persisted, then merged without rescanning
    val merged = spark.sql(
      """WITH per_day AS (
        |  SELECT day, hll_sketch(x, 8) AS r FROM hits GROUP BY day)
        |SELECT hll_estimate(aggregate(collect_list(r),
        |  array_repeat(0, 256),
        |  (acc, r) -> zip_with(acc, r, (a, b) -> greatest(a, b)))) AS est
        |FROM per_day""".stripMargin).as[Long].head()
    val direct = spark.sql(
      "SELECT hll_estimate(hll_sketch(x, 8)) FROM hits").as[Long].head()
    assert(merged == direct)
    val trueN = (day1 ++ day2).map(_._2).distinct.size
    assert(math.abs(merged.toDouble / trueN - 1.0) < 0.15)
  }

  test("serialization roundtrip and null handling") {
    val agg = HllSketch(org.apache.spark.sql.catalyst.expressions.Literal(1L), 8)
    val buf = regsOf((1L to 500L).toSeq, 8)
    assert(agg.deserialize(agg.serialize(buf)).toSeq == buf.toSeq)
    graft.functions.VectorFunctions.register(spark)
    val withNulls = Seq[Option[Long]](Some(1L), None, Some(2L), None)
      .toDF("x")
    val got = withNulls.selectExpr("hll_sketch(x, 8) AS r")
      .selectExpr("r").as[Seq[Int]].head()
    assert(got == regsOf(Seq(1L, 2L), 8).toSeq)
  }

  test("precision out of range is rejected at construction") {
    graft.functions.VectorFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT hll_sketch(x, 2) FROM VALUES (1L) t(x)").collect()
    }
    assert(e.getMessage.contains("precision"))
  }
}
