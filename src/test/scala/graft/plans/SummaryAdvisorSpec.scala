package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.functions._

class SummaryAdvisorSpec extends SparkSuite {
  import spark.implicits._

  private val baseDir = java.nio.file.Files
    .createTempDirectory("graft_adv_base").toString + "/fact.parquet"

  {
    val rows = for {
      d <- 1 to 20; f <- Seq("A", "B"); i <- 1 to 5
    } yield (f, d.toLong * 100 + i, (i * 2).toDouble, i * 1.5)
    rows.toDF("flag", "k", "qty", "price")
      .withColumn("day",
        expr("date_add(date'2024-03-01', cast(k % 10 as int))"))
      .write.mode("overwrite").parquet(baseDir)
  }

  private def base = spark.read.parquet(baseDir)

  test("recommends dims from groupings+filters, measures from bare " +
      "numeric agg inputs, sketch keys from non-dim distinct counts") {
    val rec = SummaryAdvisor.recommend(spark, baseDir, Seq(
      base.groupBy($"flag").agg(sum($"qty").as("s")),
      base.where($"day" >= lit("2024-03-05").cast("date"))
        .groupBy($"flag", $"day")
        .agg(avg($"price").as("a"), count(lit(1)).as("n")),
      base.agg(countDistinct($"k").as("d"))))
    assert(rec.dims == Seq("day", "flag"))
    assert(rec.measures == Seq("price", "qty"))
    assert(rec.sketchKeys == Seq("k"))
    assert(rec.servable == 3 && rec.total == 3)
    assert(rec.factRows == 200L)
    // day = 2024-03-01 + (k % 10) and k % 10 = i, so 5 distinct days:
    // 2 flags x 5 days, every combination populated
    assert(rec.rollupRows == 10L)
    assert(math.abs(rec.reduction - 20.0) < 1e-9)
  }

  test("recommends EXPRESSION measures for derived aggregate inputs; " +
      "dim-grouped bare measures stay unservable") {
    val rec = SummaryAdvisor.recommend(spark, baseDir, Seq(
      // derived input -> recommended as an ExprMeasure, SERVABLE
      base.groupBy($"flag").agg(sum($"qty" * 2).as("s")),
      // qty is grouped here -> becomes a dim; summing it elsewhere
      // cannot serve
      base.groupBy($"qty").agg(count(lit(1)).as("n")),
      base.groupBy($"flag").agg(sum($"qty").as("s"))))
    assert(rec.dims == Seq("flag", "qty"))
    assert(rec.measures.isEmpty)
    assert(rec.exprMeasures.map(_.name) == Seq("em_1"),
      rec.exprMeasures)
    assert(rec.exprMeasures.head.sql.contains("qty"),
      rec.exprMeasures.head.sql)
    assert(rec.servable == 2 && rec.total == 3)
    assert(rec.reports.head.servable, rec.reports.head.reason)
    assert(rec.reports.last.reason.contains("grouped elsewhere"))
    // a NON-base-column input (a literal-only expression) still aborts
    val rec2 = SummaryAdvisor.recommend(spark, baseDir, Seq(
      base.groupBy($"flag").agg(sum(lit(1.0)).as("s"))))
    assert(rec2.servable == 0)
    assert(rec2.reports.head.reason.contains("non-column expression"))
  }

  test("a recommendation with expression measures registers and the " +
      "derived-input workload then serves from the rollup") {
    val sumDir = java.nio.file.Files
      .createTempDirectory("graft_adv_expr").toString + "/rollup"
    def q = base.groupBy($"flag").agg(sum($"qty" * $"price").as("s"))
    val rec = SummaryAdvisor.recommend(spark, baseDir, Seq(q))
    assert(rec.exprMeasures.size == 1 && rec.servable == 1)
    rec.register(spark, baseDir, sumDir)
    try {
      val scans = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources
            .LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution
            .datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
      assert(scans.exists(_.contains("rollup")), s"scanned $scans")
      val got = q.orderBy($"flag").collect().map(_.toSeq).toSeq
      SummaryRewrite.unregister(spark, baseDir)
      val want = q.orderBy($"flag").collect().map(_.toSeq).toSeq
      assert(got == want)
    } finally SummaryRewrite.unregister(spark, baseDir)
  }

  test("a recommendation registers and the workload then serves from " +
      "the rollup") {
    val sumDir = java.nio.file.Files
      .createTempDirectory("graft_adv_sum").toString + "/rollup"
    val rec = SummaryAdvisor.recommend(spark, baseDir, Seq(
      base.groupBy($"flag").agg(sum($"qty").as("s"),
        min($"price").as("mn"))))
    rec.register(spark, baseDir, sumDir)
    try {
      val q = base.groupBy($"flag")
        .agg(sum($"qty").as("s"), min($"price").as("mn"))
      val scans = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources
            .LogicalRelation =>
          l.relation.asInstanceOf[org.apache.spark.sql.execution
            .datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)
      }.flatten
      assert(scans.exists(_.contains("rollup")), s"scanned $scans")
    } finally SummaryRewrite.unregister(spark, baseDir)
  }

  test("workload capture: executed aggregate queries feed " +
      "recommendCaptured (observe -> advise loop)") {
    SummaryAdvisor.clearCaptured()
    SummaryAdvisor.startCapture(spark)
    try {
      base.groupBy($"flag").agg(sum($"qty").as("s")).collect()
      base.where($"day" >= lit("2024-03-05").cast("date"))
        .groupBy($"day").agg(avg($"price").as("a")).collect()
      // a non-aggregate query must NOT be captured
      base.select($"flag").limit(1).collect()
      // listener delivery is async: poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (SummaryAdvisor.capturedCount < 2 &&
          System.nanoTime() < deadline) Thread.sleep(50)
      assert(SummaryAdvisor.capturedCount >= 2,
        s"captured ${SummaryAdvisor.capturedCount}")
      val rec = SummaryAdvisor.recommendCaptured(spark, baseDir)
      assert(rec.dims == Seq("day", "flag"), rec.dims)
      assert(rec.measures == Seq("price", "qty"), rec.measures)
      assert(rec.servable == rec.total && rec.total >= 2)
    } finally {
      SummaryAdvisor.stopCapture(spark)
      SummaryAdvisor.clearCaptured()
    }
  }

  test("recommendFrame emits the one-row report") {
    val row = SummaryAdvisor.recommendFrame(spark, baseDir, Seq(
      base.groupBy($"flag").agg(sum($"qty").as("s"))))
      .collect().head
    assert(row.getAs[String]("dims") == "flag")
    assert(row.getAs[String]("measures") == "qty")
    assert(row.getAs[Long]("fact_rows") == 200L)
    assert(row.getAs[Int]("servable") == 1)
  }

  test("percentile reads recommend sample sketches; register needs a " +
      "sampleId and the quantiles then serve from the rollup") {
    val rec = SummaryAdvisor.recommend(spark, baseDir, Seq(
      base.groupBy($"flag")
        .agg(expr("percentile(price, 0.5)").as("p50")),
      base.groupBy($"flag")
        .agg(expr("percentile_approx(qty, 0.9)").as("p90"),
          sum($"qty").as("s"))))
    assert(rec.sampleCols == Seq("price", "qty"), rec.sampleCols)
    assert(rec.servable == 2 && rec.total == 2,
      rec.reports.map(_.reason))
    // percentile over an expression is reported, not recommended
    val bad = SummaryAdvisor.recommend(spark, baseDir, Seq(
      base.groupBy($"flag")
        .agg(expr("percentile(price * 2, 0.5)").as("p"))))
    assert(bad.servable == 0 &&
      bad.reports.head.reason.contains("PERCENTILE"))
    // register refuses without a sampleId, accepts with one, and the
    // rollup then serves the quantiles through sampleQuantiles
    val sumDir = java.nio.file.Files
      .createTempDirectory("graft_adv_smp").toString + "/rollup"
    intercept[IllegalArgumentException] {
      rec.register(spark, baseDir, sumDir, refresh = true)
    }
    rec.register(spark, baseDir, sumDir, refresh = true,
      sampleId = "k")
    try {
      val got = SummaryRewrite.sampleQuantiles(spark, sumDir,
        Seq("flag"), "price", Seq(0.5)).orderBy($"flag")
        .collect().map(r => (r.getString(0), r.getDouble(2)))
      // k=1024 default >= 100 rows per flag: exact order statistic
      val want = base.select($"flag", $"price").collect()
        .groupBy(_.getString(0)).toSeq.sortBy(_._1).map {
          case (f, rows) =>
            val vs = rows.map(_.getDouble(1)).sorted
            (f, vs(math.floor(0.5 * (vs.length - 1)).toInt))
        }
      assert(got.toSeq == want)
    } finally SummaryRewrite.unregister(spark, baseDir)
  }

  test("percentile over an INTEGRAL column recommends an HDR sketch " +
      "instead (self-contained: register needs no sampleId) and the " +
      "quantiles serve within the 2^-5 relative bound") {
    val rec = SummaryAdvisor.recommend(spark, baseDir, Seq(
      base.groupBy($"flag").agg(expr("percentile(k, 0.5)").as("p50"))))
    assert(rec.hdrCols == Seq("k"), rec.hdrCols)
    assert(rec.sampleCols.isEmpty, rec.sampleCols)
    assert(rec.servable == 1 && rec.total == 1,
      rec.reports.map(_.reason))
    val sumDir = java.nio.file.Files
      .createTempDirectory("graft_adv_hdr").toString + "/rollup"
    rec.register(spark, baseDir, sumDir, refresh = true) // no sampleId
    try {
      val got = SummaryRewrite.hdrQuantiles(spark, sumDir,
        Seq("flag"), "k", Seq((50L, 100L))).orderBy($"flag")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val want = base.select($"flag", $"k").collect()
        .groupBy(_.getString(0)).toSeq.sortBy(_._1).map {
          case (f, rows) =>
            val vs = rows.map(_.getLong(1)).sorted
            (f, vs((0.5 * vs.length).ceil.toInt - 1))
        }
      got.zip(want).foreach { case ((f, est), (f2, ex)) =>
        assert(f == f2)
        assert(est <= ex && ex - est <= math.max(1L, ex >> 5),
          s"flag=$f est=$est exact=$ex")
      }
    } finally SummaryRewrite.unregister(spark, baseDir)
  }
}
