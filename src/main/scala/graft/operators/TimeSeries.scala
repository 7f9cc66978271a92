package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling of irregular event series — the metric
  * preparation step every monitoring/feature pipeline runs before
  * windowed models: observations land at arbitrary timestamps, the
  * consumer wants one row per (key, fixed step) with gaps filled by
  * carry-forward or linear interpolation.
  *
  * Reference scope: lantern_extras has no time-series operator; this
  * extends the engine's event-analytics family (sessionize, funnel,
  * rolling stats) with the resampling primitive those consume.
  *
  * Scale shape: one partial-agg groupBy collapses raw events to at
  * most one row per (key, bucket); the dense grid is generated
  * per-key with `sequence` + explode (never a cross join against a
  * calendar table); the fill itself is a single window shuffle
  * partitioned BY KEY. Keys are the parallel unit — a key's grid
  * (span / step rows) must fit a task, which is the natural contract
  * for per-entity series (a 30-day hourly grid is 720 rows); an
  * unbounded multi-year key wants a coarser step, not a bigger
  * executor.
  *
  * Arithmetic contract: values are caller-quantized integers (e.g.
  * cents), and interpolation uses truncating integer division —
  * `div` here, `//` in DuckDB, both truncate toward zero on
  * negatives — so every filled value is engine-independent and
  * hash-checkable.
  */
object TimeSeries {

  /** Resample `df` to a `stepSec` grid per key. Input columns: a key
    * (cast to long), a timestamp, and an INTEGER value column
    * (pre-quantize doubles upstream). Output: (key, bucket, value,
    * observed) — `bucket` = floor(epoch_seconds / stepSec), one row
    * for every bucket between the key's first and last observation,
    * `observed` false on filled rows. Multiple observations in one
    * bucket resolve to the latest (max (ts, value) — deterministic
    * under timestamp ties). `interpolate` = false carries the last
    * observation forward (LOCF); true draws the integer line segment
    * between the surrounding observations:
    * v = pv + ((nv − pv)·(b − pb)) div (nb − pb).
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, stepSec: Long,
      interpolate: Boolean = false): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    val obs = df.select(col(keyCol).cast("long").as("key"),
        expr(s"unix_timestamp(`$tsCol`) div $stepSec").as("bucket"),
        col(tsCol).as("ts"), col(valCol).cast("long").as("v"))
      .groupBy(col("key"), col("bucket"))
      .agg(max(struct(col("ts"), col("v"))).as("m"))
      .select(col("key"), col("bucket"), col("m.v").as("v"))
    val span = obs.groupBy(col("key"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
    val grid = span.select(col("key"),
      explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val j = grid.join(obs, Seq("key", "bucket"), "left")
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = w.rowsBetween(0, Window.unboundedFollowing)
    if (!interpolate) {
      j.select(col("key"), col("bucket"),
        last(col("v"), ignoreNulls = true).over(wPrev).as("value"),
        col("v").isNotNull.as("observed"))
    } else {
      j.select(col("key"), col("bucket"), col("v"),
          last(col("v"), ignoreNulls = true).over(wPrev).as("pv"),
          last(when(col("v").isNotNull, col("bucket")),
            ignoreNulls = true).over(wPrev).as("pb"),
          first(col("v"), ignoreNulls = true).over(wNext).as("nv"),
          first(when(col("v").isNotNull, col("bucket")),
            ignoreNulls = true).over(wNext).as("nb"))
        .select(col("key"), col("bucket"),
          when(col("v").isNotNull, col("v"))
            // the grid is clamped to [first obs, last obs], so the
            // one-sided branches only fire on degenerate inputs —
            // kept for composition with externally-supplied grids
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") +
              expr("((nv - pv) * (bucket - pb)) div (nb - pb)"))
            .as("value"),
          col("v").isNotNull.as("observed"))
    }
  }
}
