package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class SummaryRewriteSpec extends SparkSuite {
  import spark.implicits._

  private val baseDir = java.nio.file.Files
    .createTempDirectory("graft_mv_base").toString + "/fact.parquet"
  private val sumDir = java.nio.file.Files
    .createTempDirectory("graft_mv_sum").toString + "/rollup"

  private def writeBase(): Unit = {
    val rows = for {
      d <- 1 to 40; f <- Seq("A", "B"); i <- 1 to 5
    } yield (f, d.toLong * 10 + i, (i * 2).toDouble, i * 10.5)
    rows.toDF("flag", "k", "qty", "price")
      .withColumn("day",
        expr("date_add(date'2024-01-01', cast(k % 28 as int))"))
      .write.mode("overwrite").parquet(baseDir)
  }

  // logical-level scan paths: AQE wraps the physical plan, so the
  // optimized logical plan is the stable place to observe the rewrite
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.rootPaths.map(_.toString)
    }.flatten

  writeBase()
  SummaryRewrite.register(spark, baseDir, sumDir,
    dims = Seq("flag", "day"), measures = Seq("qty", "price"))

  private def base = spark.read.parquet(baseDir)

  test("grouped sum/count/min/max replan onto the rollup, value-exact") {
    val before = SummaryRewriteRule.fireCount.get()
    val q = base.groupBy($"flag")
      .agg(count(lit(1)).as("n"), sum($"qty").as("sq"),
        min($"qty").as("mn"), max($"price").as("mx"))
      .orderBy($"flag")
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(SummaryRewriteRule.fireCount.get() == before + 1)
    val paths = scanPaths(q)
    assert(paths.exists(_.contains("rollup")), s"scanned $paths")
    assert(!paths.exists(_.contains("fact.parquet")), s"scanned $paths")
    // ground truth without the rule
    SummaryRewrite.clear()
    val want = base.groupBy($"flag")
      .agg(count(lit(1)).as("n"), sum($"qty").as("sq"),
        min($"qty").as("mn"), max($"price").as("mx"))
      .orderBy($"flag").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4)))
    SummaryRewrite.register(spark, baseDir, sumDir,
      dims = Seq("flag", "day"), measures = Seq("qty", "price"))
    assert(got.toSeq == want.toSeq)
  }

  test("dim filter rides the rollup; decimal-cast sum translates") {
    val q = base.where($"day" >= lit("2024-01-10").cast("date"))
      .groupBy($"flag", $"day")
      .agg(sum($"price".cast("decimal(18,2)")).cast("double").as("sp"))
      .orderBy($"flag", $"day")
    val got = q.collect()
    assert(scanPaths(q).exists(_.contains("rollup")))
    SummaryRewrite.clear()
    val want = base.where($"day" >= lit("2024-01-10").cast("date"))
      .groupBy($"flag", $"day")
      .agg(sum($"price".cast("decimal(18,2)")).cast("double").as("sp"))
      .orderBy($"flag", $"day").collect()
    SummaryRewrite.register(spark, baseDir, sumDir,
      dims = Seq("flag", "day"), measures = Seq("qty", "price"))
    assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
  }

  test("non-dim filter, distinct agg, and unknown measure do NOT rewrite") {
    // filter on a measure column
    val q1 = base.where($"qty" > 4).groupBy($"flag")
      .agg(sum($"qty").as("s"))
    assert(scanPaths(q1).exists(_.contains("fact.parquet")))
    // distinct aggregate
    val q2 = base.groupBy($"flag").agg(countDistinct($"k").as("d"))
    assert(scanPaths(q2).exists(_.contains("fact.parquet")))
    // aggregate over an expression, not a bare measure
    val q3 = base.groupBy($"flag").agg(sum($"qty" * 2).as("s"))
    assert(scanPaths(q3).exists(_.contains("fact.parquet")))
    // and all three still answer correctly
    assert(q1.collect().length == 2)
    assert(q2.collect().map(_.getLong(1)).sum > 0)
    assert(q3.collect().length == 2)
  }

  test("global aggregate (no grouping) rewrites too") {
    val q = base.agg(count(lit(1)).as("n"), sum($"qty").as("s"))
    val got = q.collect().head
    assert(scanPaths(q).exists(_.contains("rollup")))
    assert(got.getLong(0) == 400L)
    SummaryRewrite.clear()
    val want = base.agg(count(lit(1)).as("n"), sum($"qty").as("s"))
      .collect().head
    SummaryRewrite.register(spark, baseDir, sumDir,
      dims = Seq("flag", "day"), measures = Seq("qty", "price"))
    assert(got.getDouble(1) == want.getDouble(1))
  }

  test("derived-dim grouping (week of day) rewrites and stays exact") {
    val q = base.groupBy(weekofyear($"day").as("wk"))
      .agg(count(lit(1)).as("n"), sum($"qty").as("s"),
        min($"price").as("mn"))
      .orderBy($"wk")
    val got = q.collect().map(_.toSeq)
    assert(scanPaths(q).exists(_.contains("rollup")))
    SummaryRewrite.clear()
    val want = base.groupBy(weekofyear($"day").as("wk"))
      .agg(count(lit(1)).as("n"), sum($"qty").as("s"),
        min($"price").as("mn"))
      .orderBy($"wk").collect().map(_.toSeq)
    SummaryRewrite.register(spark, baseDir, sumDir,
      dims = Seq("flag", "day"), measures = Seq("qty", "price"))
    assert(got.toSeq == want.toSeq)
  }

  test("a group expression touching a non-dim column does not rewrite") {
    val q = base.groupBy(($"k" % 10).as("b")).agg(sum($"qty").as("s"))
    assert(scanPaths(q).exists(_.contains("fact.parquet")))
    assert(q.collect().length == 5) // k = d*10+i, i in 1..5
  }

  test("refresh after base append picks up new rows") {
    val extra = Seq(("A",
      java.sql.Date.valueOf("2024-01-02"), 999L, 100.0, 1.0))
      .toDF("flag", "day", "k", "qty", "price")
      .select($"flag", $"day", $"k", $"qty", $"price")
    extra.write.mode("append").parquet(baseDir)
    SummaryRewrite.register(spark, baseDir, sumDir,
      dims = Seq("flag", "day"), measures = Seq("qty", "price"),
      refresh = true)
    val q = base.agg(count(lit(1)).as("n"))
    assert(scanPaths(q).exists(_.contains("rollup")))
    assert(q.collect().head.getLong(0) == 401L)
  }
}
