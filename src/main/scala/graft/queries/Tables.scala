package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Uniform access to the driver-generated test tables.
  *
  * `events.parquet` carries TIMESTAMP(NANOS) which Spark's vectorized
  * parquet reader rejects; we read it as raw long nanos
  * (spark.sql.legacy.parquet.nanosAsLong) and convert to a microsecond
  * timestamp — lossless for this data and consistent with how DuckDB
  * presents the same column.
  */
object Tables {
  def apply(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.read.parquet(s"$dir/events.parquet")
        // integer div: col/1000 would be double division and round the
        // odd microsecond differently than DuckDB's ns truncation
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      s.read.parquet(s"$dir/$name.parquet")
    }
}
