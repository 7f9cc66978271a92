package graft.multimodal

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def mediaDf = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("media", BinaryType),
      StructField("meta", Multimodal.mediaMetaType)))
    val rows = java.util.List.of(
      Row(1L, Array.range(0, 1000).map(_.toByte), Row("image", 100, 10, null, null)),
      Row(2L, Array.range(0, 64).map(_.toByte), Row("video", 8, 8, null, 16)),
      Row(3L, null, Row("image", 0, 0, null, null)))
    spark.createDataFrame(rows, schema)
  }

  test("mediaFeatures: unit-norm features, null → failed sentinel") {
    val out = Multimodal.mediaFeatures(mediaDf, "media", "feat", dim = 16)
    val rows = out.orderBy($"id").select($"id", $"feat")
      .as[(Long, Seq[Float])].collect()
    assert(rows.forall(_._2.length === 16))
    val n1 = math.sqrt(rows(0)._2.map(x => x.toDouble * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-6)
    assert(rows(2)._2 === Seq.fill(16)(-1.0f)) // null payload
    // determinism
    val again = Multimodal.mediaFeatures(mediaDf, "media", "feat", 16)
      .orderBy($"id").select($"feat").as[Seq[Float]].collect()
    assert(again(0) === rows(0)._2)
  }

  test("oversized payload gets the sentinel (20 MB cap)") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("media", BinaryType)))
    val big = new Array[Byte](Multimodal.MaxMediaBytes + 1)
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, big)), schema)
    val feat = Multimodal.mediaFeatures(df, "media", "f", 4)
      .select($"f").as[Seq[Float]].head()
    assert(feat === Seq.fill(4)(-1.0f))
  }

  test("resizeMedia rewrites payload and meta dims") {
    val out = Multimodal.resizeMedia(mediaDf, "media", "meta", 224, 224)
    val r = out.where($"id" === 1).select($"media", $"meta.width",
      $"meta.height").head()
    assert(r.getAs[Array[Byte]](0).length === 224 * 224)
    assert(r.getInt(1) === 224 && r.getInt(2) === 224)
    // null media passes through as null
    assert(out.where($"id" === 3).select($"media").head().isNullAt(0))
  }

  test("explodeFrames slices video payload into indexed frames") {
    val frames = Multimodal.explodeFrames(
      mediaDf.where($"id" === 2), "id", "media", nFrames = 4)
    val rows = frames.orderBy($"frame_idx")
      .select($"frame_idx", $"frame").as[(Int, Array[Byte])].collect()
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2, 3))
    assert(rows.forall(_._2.length === 16)) // 64 bytes / 4 frames
    assert(rows(1)._2.head === 16.toByte) // second chunk starts at offset 16
  }

  test("plumbing composes: frames → features in one plan") {
    val frames = Multimodal.explodeFrames(
      mediaDf.where($"id" === 2), "id", "media", 4)
    val feats = Multimodal.mediaFeatures(frames, "frame", "emb", 8)
    assert(feats.count() === 4)
    assert(feats.where(size($"emb") === 8).count() === 4)
  }
}
