package graft.queries

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** The events read shim must normalize EVERY ts encoding the testdata
  * generator has shipped to a session-UTC TIMESTAMP: raw int64 nanos
  * (the legacy TIMESTAMP(NANOS) files arrive as LongType under
  * nanosAsLong) and TIMESTAMP_MICROS/NTZ (the current generation).
  * The current-generation path is exercised by every events-family
  * oracle; this spec keeps the legacy branch from rotting.
  */
class TablesSpec extends SparkSuite {
  import spark.implicits._

  test("legacy long-nanos events files still read as session-UTC " +
      "timestamps with microsecond truncation") {
    val dir = Files.createTempDirectory("tables_nanos").toString
    // 2024-01-01T00:00:00.000001500Z as nanos: micros must truncate
    // (1 us), not round to 2 us
    val base = 1704067200L * 1000000000L
    Seq((1L, base + 1500L), (2L, base + 999L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.orderBy($"event_id")
      .select(unix_micros($"ts")).as[Long].collect().toSeq
    assert(got === Seq(base / 1000L + 1L, base / 1000L))
  }

  test("current-generation micros files arrive as TimestampType with " +
      "unchanged microsecond values") {
    val df = Tables(spark, sf0001, "events")
    assert(df.schema("ts").dataType === TimestampType)
    // spot value agrees with a raw NTZ read cast under the UTC session
    val raw = spark.read.parquet(s"$sf0001/events.parquet")
      .orderBy($"event_id").select($"ts".cast(TimestampType))
      .limit(1).as[java.sql.Timestamp].head
    val shimmed = df.orderBy($"event_id").select($"ts")
      .limit(1).as[java.sql.Timestamp].head
    assert(shimmed === raw)
  }
}
