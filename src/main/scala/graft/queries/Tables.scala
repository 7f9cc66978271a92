package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Uniform access to the driver-generated test tables.
  *
  * `events.parquet` has shipped with two different physical types for
  * `ts` across testdata generations: TIMESTAMP(NANOS) — which Spark's
  * vectorized reader rejects unless read as raw long nanos — and
  * TIMESTAMP_MICROS with isAdjustedToUTC=false, which Spark surfaces
  * as TIMESTAMP_NTZ. The shim adapts to whatever the files carry and
  * always yields a session-UTC TIMESTAMP column, matching how DuckDB
  * (the oracle) presents the same data: DuckDB reads either encoding
  * as a naive timestamp, and with the session timezone pinned to UTC
  * the microsecond values agree exactly.
  */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Probe the footer schema with nanosAsLong on: legacy NANOS files
      // arrive as LongType, modern MICROS files as TimestampNTZType (or
      // TimestampType if a future generation sets isAdjustedToUTC).
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          // integer div: col/1000 would be double division and round the
          // odd microsecond differently than DuckDB's ns truncation
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // naive micros; session tz is UTC so the cast is value-preserving
          raw.withColumn("ts", col("ts").cast(TimestampType))
        case TimestampType => raw
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported parquet type $other")
      }
    } else {
      s.read.parquet(s"$dir/$name.parquet")
    }
}
