package graft.sources

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

class VecsFilesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("vecs").toString

  test("fvecs roundtrip: 41 vectors dim 8 (FIXTURES §5)") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 41).map(_ => Array.fill(8)(rnd.nextFloat()))
    VecsFiles.writeFvecs(s"$dir/small.fvecs", vecs)
    val df = VecsFiles.readFvecs(spark, s"$dir/small.fvecs")
    assert(df.count() === 41)
    val back = df.orderBy($"idx").select($"vector")
      .as[Seq[Float]].collect()
    assert(back.zip(vecs).forall { case (a, b) => a == b.toSeq })
  }

  test("limit mirrors the SRF count argument") {
    val vecs = (0 until 10).map(_ => Array.fill(4)(1.0f))
    VecsFiles.writeFvecs(s"$dir/lim.fvecs", vecs)
    assert(VecsFiles.readFvecs(spark, s"$dir/lim.fvecs", limit = 3)
      .count() === 3)
  }

  test("bvecs widens u8 to short (255 stays 255)") {
    VecsFiles.writeBvecs(s"$dir/b.bvecs",
      Seq(Array(0.toByte, 127.toByte, 255.toByte)))
    val v = VecsFiles.readBvecs(spark, s"$dir/b.bvecs")
      .select($"vector").as[Seq[Short]].head()
    assert(v === Seq[Short](0, 127, 255))
  }

  test("varying dimension is rejected (dotvecs.rs:131-136)") {
    VecsFiles.writeFvecs(s"$dir/bad.fvecs",
      Seq(Array.fill(4)(1.0f), Array.fill(5)(1.0f)))
    val e = intercept[Exception] {
      VecsFiles.readFvecs(spark, s"$dir/bad.fvecs").count()
    }
    assert(e.getMessage.contains("varying dimension") ||
      e.getCause.getMessage.contains("varying dimension"))
  }

  test("truncated file is rejected") {
    val full = {
      val b = java.nio.ByteBuffer.allocate(4 + 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(4); (0 until 4).foreach(_ => b.putFloat(1f))
      b.array()
    }
    Files.write(java.nio.file.Paths.get(s"$dir/trunc.fvecs"),
      full.dropRight(3))
    val e = intercept[Exception] {
      VecsFiles.readFvecs(spark, s"$dir/trunc.fvecs").count()
    }
    assert(e.getMessage.contains("truncated") ||
      e.getCause.getMessage.contains("truncated"))
  }

  test("file larger than one decode buffer splits into bounded tasks") {
    // 200 records of dim 8 = 36 bytes each; a 360-byte split budget
    // yields 10 records per task → 20 record-aligned splits. Every
    // value and every global index must survive the split decode.
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(_ => Array.fill(8)(rnd.nextFloat()))
    VecsFiles.writeFvecs(s"$dir/big.fvecs", vecs)
    val df = VecsFiles.readFvecs(spark, s"$dir/big.fvecs",
      splitBytes = 360)
    assert(df.rdd.getNumPartitions === 20) // one split per task
    val back = df.orderBy($"idx").select($"idx", $"vector")
      .as[(Long, Seq[Float])].collect()
    assert(back.map(_._1).toSeq === (0L until 200L))
    assert(back.zip(vecs).forall { case ((_, a), b) => a == b.toSeq })
    // limit composes with splitting (applied per file, before planning)
    assert(VecsFiles.readFvecs(spark, s"$dir/big.fvecs", limit = 25,
      splitBytes = 360).count() === 25)
  }

  test("csv sink writes postgres-array-style embeddings") {
    val df = Seq((1L, Array(1.5f, -2.0f))).toDF("id", "emb")
    VecsFiles.writeCsvEmbeddings(df, "id", "emb", s"$dir/csvout")
    val line = spark.read.text(s"$dir/csvout").as[String].head()
    assert(line === "1,\"{1.5,-2.0}\"")
  }

  test("multiple files read in parallel keep per-file indices") {
    VecsFiles.writeFvecs(s"$dir/m1.fvecs", Seq(Array(1f, 2f)))
    VecsFiles.writeFvecs(s"$dir/m2.fvecs", Seq(Array(3f, 4f), Array(5f, 6f)))
    val df = VecsFiles.readFvecs(spark, s"$dir/m{1,2}.fvecs")
    assert(df.count() === 3)
    val byFile = df.groupBy($"file").count().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(byFile("m1.fvecs") === 1L && byFile("m2.fvecs") === 2L)
  }
}
