package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSuite {
  import spark.implicits._

  // step 10 s; key 1 observes v=10 in bucket 0 and v=40 in bucket 3,
  // key 2 observes once. Timestamps are epoch-second literals (UTC
  // session), so bucket = epoch div 10.
  private lazy val ev = Seq(
    (1L, 5L, 10L), (1L, 35L, 40L), (2L, 12L, 7L))
    .toDF("k", "sec", "v")
    .withColumn("ts", timestamp_seconds($"sec"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy($"key", $"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq

  test("LOCF fills every gap bucket with the prior observation") {
    val r = rows(TimeSeries.resample(ev, "k", "ts", "v", 10L))
    assert(r == Seq(
      (1L, 0L, 10L, true), (1L, 1L, 10L, false), (1L, 2L, 10L, false),
      (1L, 3L, 40L, true), (2L, 1L, 7L, true)))
  }

  test("interpolation draws the integer segment between observations") {
    // segment 10 → 40 over 3 buckets: +10 per bucket
    val r = rows(TimeSeries.resample(ev, "k", "ts", "v", 10L,
      interpolate = true))
    assert(r == Seq(
      (1L, 0L, 10L, true), (1L, 1L, 20L, false), (1L, 2L, 30L, false),
      (1L, 3L, 40L, true), (2L, 1L, 7L, true)))
  }

  test("interpolation truncates like the oracle on falling segments") {
    // 10 → 3 over 3 buckets: deltas (3-10)*1 div 3 = -2 (truncation,
    // not floor -3), then (3-10)*2 div 3 = -4
    val e = Seq((1L, 5L, 10L), (1L, 35L, 3L)).toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds($"sec"))
    val r = rows(TimeSeries.resample(e, "k", "ts", "v", 10L,
      interpolate = true))
    assert(r == Seq(
      (1L, 0L, 10L, true), (1L, 1L, 8L, false), (1L, 2L, 6L, false),
      (1L, 3L, 3L, true)))
  }

  test("multiple observations in one bucket resolve to the latest") {
    val e = Seq((1L, 5L, 10L), (1L, 9L, 99L), (1L, 25L, 1L))
      .toDF("k", "sec", "v")
      .withColumn("ts", timestamp_seconds($"sec"))
    val r = rows(TimeSeries.resample(e, "k", "ts", "v", 10L))
    assert(r == Seq(
      (1L, 0L, 99L, true), (1L, 1L, 99L, false), (1L, 2L, 1L, true)))
  }

  test("step must be positive") {
    intercept[IllegalArgumentException] {
      TimeSeries.resample(ev, "k", "ts", "v", 0L)
    }
  }
}
