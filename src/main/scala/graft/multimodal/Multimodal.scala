package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextHash

/** Multimodal columns for training-data pipelines: media as opaque
  * BINARY columns with typed metadata, processed by batched
  * mapPartitions (the Scala analog of mapInPandas: executor-side batch
  * loops, one decoder instance per partition).
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED behind `MediaDecoder` — this container ships no image/audio
  * libraries — with a deterministic fake (`StubDecoder`) so the
  * Spark-side plumbing (schema, batch shape, partitioning, size caps,
  * failure sentinel) is real and fully tested. Swap `StubDecoder` for a
  * real codec-backed implementation in production.
  *
  * Reference surfaces mirrored: `image_embedding`/`clip_image`
  * (F5/F6, `lantern_extras/src/embeddings.rs:139-150`), the 20 MB
  * media-size cap (`ort_runtime.rs:159`), 224x224 resize target
  * (`ort_runtime.rs:608-664`), and the failed-media sentinel
  * `[-1.0 x dim]` (`ort_runtime.rs:956-997`).
  */
object Multimodal {

  val MaxMediaBytes: Int = 20 * 1024 * 1024 // ort_runtime.rs:159

  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),          // image | audio | video
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Decoder contract — one instance per partition; implementations
    * must be deterministic for a given byte payload.
    */
  trait MediaDecoder extends Serializable {
    /** Decode + feature-extract to a dim-length vector. */
    def features(media: Array[Byte], dim: Int): Array[Float]
    /** Decode + resize → new payload bytes (e.g., 224x224 pixels). */
    def resize(media: Array[Byte], w: Int, h: Int): Array[Byte]
    /** Sample up to n frames from a video payload. */
    def sampleFrames(media: Array[Byte], n: Int): Seq[Array[Byte]]
  }

  /** Deterministic stand-in: features are stripe-hash projections of
    * the payload; resize is a seeded byte resample to w*h bytes; frame
    * sampling slices the payload into n equal chunks. Real decoding
    * would sit exactly here (this is the clearly-marked stub).
    */
  object StubDecoder extends MediaDecoder {
    override def features(media: Array[Byte], dim: Int): Array[Float] = {
      // accumulate per-stripe hashes with WRAPPING LONG addition —
      // order-insensitive and exact, so any independent engine (the
      // DuckDB oracle) reproduces it bit-for-bit regardless of its
      // aggregation order; doubles appear only in the final fixed-order
      // 16-element projection/normalization
      val acc = new Array[Long](dim)
      var i = 0
      while (i < media.length) {
        val h = TextHash.mix64((media(i) & 0xffL) ^ (i.toLong << 8))
        acc(i % dim) += h
        i += 1
      }
      val proj = acc.map(a => a.toDouble / Long.MaxValue)
      val norm = math.sqrt(proj.map(x => x * x).sum)
      if (norm == 0.0) Array.fill(dim)(-1.0f)
      else proj.map(x => (x / norm).toFloat)
    }

    override def resize(media: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](w * h)
      if (media.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = media((i.toLong * media.length / out.length).toInt)
          i += 1
        }
      }
      out
    }

    override def sampleFrames(media: Array[Byte], n: Int)
        : Seq[Array[Byte]] = {
      if (media.isEmpty) return Seq.empty
      val chunk = math.max(media.length / n, 1)
      (0 until math.min(n, media.length)).map { f =>
        val start = f * chunk
        java.util.Arrays.copyOfRange(media, start,
          math.min(start + chunk, media.length))
      }
    }
  }

  /** F5 analog: add a feature/embedding column for a BINARY media
    * column. Batched mapPartitions; oversized or null payloads get the
    * failed sentinel [-1 x dim] so jobs never reprocess them (mirrors
    * the failed-image path).
    */
  def mediaFeatures(df: DataFrame, binCol: String, outCol: String,
      dim: Int, decoder: MediaDecoder = StubDecoder,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField(outCol, ArrayType(FloatType), nullable = false))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val bytes = if (r.isNullAt(idx)) null
            else r.getAs[Array[Byte]](idx)
          val feat =
            if (bytes == null || bytes.length > MaxMediaBytes)
              Array.fill(dim)(-1.0f)
            else decoder.features(bytes, dim)
          Row.fromSeq(r.toSeq :+ feat)
        }
      }
    }(Encoders.row(schema))
  }

  /** Resize a BINARY image column; metadata struct updated in step. */
  def resizeMedia(df: DataFrame, binCol: String, metaCol: String,
      w: Int = 224, h: Int = 224,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val schema = df.schema
    val bIdx = schema.fieldIndex(binCol)
    val mIdx = schema.fieldIndex(metaCol)
    df.mapPartitions { iter =>
      iter.map { r =>
        val bytes = if (r.isNullAt(bIdx)) null
          else r.getAs[Array[Byte]](bIdx)
        val resized = if (bytes == null) null else decoder.resize(bytes, w, h)
        val meta = r.getStruct(mIdx)
        val newMeta = Row(meta.getString(0), w, h, meta.get(3), meta.get(4))
        Row.fromSeq(r.toSeq.updated(bIdx, resized).updated(mIdx, newMeta))
      }
    }(Encoders.row(schema))
  }

  /** Explode a video payload into sampled frames:
    * (id, frame_idx, frame BINARY).
    */
  def explodeFrames(df: DataFrame, idCol: String, binCol: String,
      nFrames: Int, decoder: MediaDecoder = StubDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("frame", BinaryType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { iter =>
      iter.flatMap { r =>
        val bytes = if (r.isNullAt(bIdx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](bIdx)
        decoder.sampleFrames(bytes, nFrames).zipWithIndex.map {
          case (frame, i) => Row(r.get(idIdx), i, frame)
        }
      }
    }(Encoders.row(outSchema))
  }
}
