package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.ProductQuantizer
import org.apache.spark.sql.functions._

class PqStreamSpec extends SparkSuite {
  import spark.implicits._

  test("streaming quantize: backfill, then only new arrivals (Q2)") {
    val base = Files.createTempDirectory("pqstream").toString
    val rnd = new scala.util.Random(11)
    def rows(ids: Range) =
      ids.map(i => (i.toLong, Array.fill(16)(rnd.nextFloat())))
        .toDF("id", "v")
    rows(0 until 100).write.parquet(s"$base/src/p0")

    val cb = ProductQuantizer.fitCodebook(
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$base/src"), "id", "v", clusters = 8, splits = 4)

    PqStream.quantizeAvailable(spark, s"$base/src", "id", "v", cb,
      s"$base/out", s"$base/ckpt")
    val out1 = spark.read.parquet(s"$base/out")
    assert(out1.count() === 100)
    assert(out1.where(size($"v_pq") =!= 4).count() === 0)

    // "trigger" path: 20 new rows arrive, only they get quantized
    rows(1000 until 1020).write.parquet(s"$base/src/p1")
    PqStream.quantizeAvailable(spark, s"$base/src", "id", "v", cb,
      s"$base/out", s"$base/ckpt")
    val out2 = spark.read.parquet(s"$base/out")
    assert(out2.count() === 120)
    assert(out2.where($"id" >= 1000).count() === 20)

    // codes agree with the batch quantizer for the same codebook
    val batch = ProductQuantizer.quantizeColumn(
      spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$base/src"), "v", "v_pq", cb)
      .select($"id", $"v_pq").as[(Long, Seq[Byte])].collect().toMap
    val streamed = out2.select($"id", $"v_pq")
      .as[(Long, Seq[Byte])].collect().toMap
    assert(streamed === batch)
  }
}
