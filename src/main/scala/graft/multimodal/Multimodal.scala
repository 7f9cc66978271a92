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
  * Codec work sits behind `MediaDecoder`, and the JDK-covered formats
  * are REAL: [[ImageIoDecoder]] rides javax.imageio (PNG/JPEG/BMP/
  * GIF/WBMP — decode, deterministic resize, frame sampling, luminance
  * features) and [[AudioDecoder]] rides javax.sound.sampled
  * (WAV/AIFF/AU — PCM decode, mono-mix, RMS-energy features,
  * resample, frame slicing), and [[AviMjpegDecoder]] walks RIFF/AVI
  * containers to extract MJPEG frames (each a plain JPEG the JDK
  * reads). Only codec-compressed formats with no JDK decoder
  * (MP4/H.264, MP3/OGG) keep the deterministic `StubDecoder` (also
  * the DuckDB-oracle-checkable reference for the feature plumbing);
  * swap in a codec-backed `MediaDecoder` for them in production.
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
    /** Decode to an INTEGER luminance grid (gw × gh, row-major) for
      * perceptual hashing — exact integers, because the hash bits are
      * order comparisons that must be reproducible across engines
      * (a float pipeline could flip a bit in the last ulp). None =
      * undecodable payload; such rows take no part in image dedup.
      */
    def grayGrid(media: Array[Byte], gw: Int, gh: Int)
        : Option[Array[Long]] = None
    /** Both perceptual-hash grids (9x8 for dHash, 8x8 for aHash) in
      * one call. Decoders that pay a real pixel decode override this
      * to decode ONCE and sample both grids from the decoded image;
      * the default is for cheap synthetic decoders.
      */
    def hashGrids(media: Array[Byte])
        : Option[(Array[Long], Array[Long])] =
      grayGrid(media, 9, 8).flatMap(d =>
        grayGrid(media, 8, 8).map(a => (d, a)))
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

    /** Deterministic fake grid: the same wrapping-long stripe-hash
      * accumulation as [[features]], WITHOUT the float normalization —
      * the raw signed accumulators ARE the "luminance" values, exact
      * integers an independent engine restates bit-for-bit (the
      * q_image_dedup oracle does).
      */
    override def grayGrid(media: Array[Byte], gw: Int, gh: Int)
        : Option[Array[Long]] = {
      val dim = gw * gh
      val acc = new Array[Long](dim)
      var i = 0
      while (i < media.length) {
        val h = TextHash.mix64((media(i) & 0xffL) ^ (i.toLong << 8))
        acc(i % dim) += h
        i += 1
      }
      Some(acc)
    }
  }

  /** REAL image decoder over the JDK's javax.imageio (PNG, JPEG, BMP,
    * GIF, WBMP — no external libraries): decode → deterministic
    * nearest-pixel grid sampling → luminance features. This is the
    * production implementation of the F5/F6 image path for the formats
    * the JDK ships codecs for; `StubDecoder` remains only as the
    * any-bytes fallback and the DuckDB-oracle-checkable reference.
    *
    * Determinism notes: pixel access uses exact integer grid sampling
    * (`getRGB` at floor-scaled coordinates), never Graphics2D
    * interpolation, so features are bit-stable across JVMs; resize
    * re-encodes as PNG (lossless) with the same nearest-pixel rule.
    * Undecodable payloads yield the failed sentinel [-1 x dim] — the
    * same contract as oversized media (`ort_runtime.rs:956-997`).
    */
  object ImageIoDecoder extends MediaDecoder {
    /** Decoded-dimension cap: the 20 MB payload cap bounds COMPRESSED
      * bytes only — a few-hundred-KB PNG can declare 50000x50000 and
      * would allocate ~10 GB decoded. Header dims are read cheaply
      * before any pixel decode; oversized images fail to the sentinel.
      */
    val MaxDecodedPixels: Long = 64L * 1024 * 1024 // 64 MP ≈ 256 MB RGBA

    private def decode(media: Array[Byte])
        : Option[java.awt.image.BufferedImage] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(media))
        if (iis == null) return None
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val (w, h) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
            if (w <= 0 || h <= 0 || w * h > MaxDecodedPixels) None
            else Option(reader.read(0))
          } finally reader.dispose()
        } finally iis.close()
      } catch { case _: Exception => None }

    override def features(media: Array[Byte], dim: Int): Array[Float] =
      decode(media) match {
        case None => Array.fill(dim)(-1.0f)
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          // grid big enough to give every feature cell its own pixel
          val g = math.ceil(math.sqrt(dim.toDouble)).toInt
          val feats = new Array[Double](dim)
          var i = 0
          while (i < dim) {
            val gx = i % g; val gy = i / g
            val px = math.min((gx.toLong * w / g).toInt, w - 1)
            val py = math.min((gy.toLong * h / g).toInt, h - 1)
            val rgb = img.getRGB(px, py)
            val r = (rgb >> 16) & 0xff
            val gg = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            // integer ITU-R 601 luma in [0, 255000] — exact arithmetic
            feats(i) = (r * 299 + gg * 587 + b * 114).toDouble / 255000.0
            i += 1
          }
          val norm = math.sqrt(feats.map(x => x * x).sum)
          if (norm == 0.0) feats.map(_ => 0.0f)
          else feats.map(x => (x / norm).toFloat)
      }

    /** Exact integer luma grid: the same floor-scaled nearest-pixel
      * sampling as [[features]], with ITU-R 601 luma kept as the raw
      * integer r*299 + g*587 + b*114 in [0, 255000] — no floats
      * anywhere, so perceptual-hash bit comparisons are exact.
      */
    private def gridFrom(img: java.awt.image.BufferedImage, gw: Int,
        gh: Int): Array[Long] = {
      val w = img.getWidth; val h = img.getHeight
      val out = new Array[Long](gw * gh)
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw) {
          val px = math.min((gx.toLong * w / gw).toInt, w - 1)
          val py = math.min((gy.toLong * h / gh).toInt, h - 1)
          val rgb = img.getRGB(px, py)
          out(gy * gw + gx) = ((rgb >> 16) & 0xff) * 299L +
            ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
          gx += 1
        }
        gy += 1
      }
      out
    }

    override def grayGrid(media: Array[Byte], gw: Int, gh: Int)
        : Option[Array[Long]] =
      decode(media).map(gridFrom(_, gw, gh))

    // one full pixel decode serves BOTH hash grids (the default would
    // decode the compressed payload twice per row)
    override def hashGrids(media: Array[Byte])
        : Option[(Array[Long], Array[Long])] =
      decode(media).map(img => (gridFrom(img, 9, 8), gridFrom(img, 8, 8)))

    override def resize(media: Array[Byte], w: Int, h: Int): Array[Byte] =
      decode(media) match {
        case None => Array.empty[Byte]
        case Some(img) =>
          val out = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val sw = img.getWidth; val sh = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val sx = math.min((x.toLong * sw / w).toInt, sw - 1)
              val sy = math.min((y.toLong * sh / h).toInt, sh - 1)
              out.setRGB(x, y, img.getRGB(sx, sy))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          bos.toByteArray
      }

    /** Multi-image payloads (animated GIF) sample up to n frames,
      * re-encoded PNG; single-image payloads yield that one frame.
      */
    override def sampleFrames(media: Array[Byte], n: Int)
        : Seq[Array[Byte]] = {
      val iis = try javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media))
      catch { case _: Exception => null }
      if (iis == null) return Seq.empty
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return Seq.empty
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val total =
            try reader.getNumImages(true) catch { case _: Exception => 1 }
          val take = math.min(n, math.max(total, 1))
          (0 until take).flatMap { f =>
            // spread sampled frames evenly over the sequence
            val idx = if (take == 1) 0 else (f.toLong * (total - 1) / (take - 1)).toInt
            try {
              if (reader.getWidth(idx).toLong * reader.getHeight(idx)
                  > MaxDecodedPixels) None
              else {
                val img = reader.read(idx)
                val bos = new java.io.ByteArrayOutputStream()
                javax.imageio.ImageIO.write(img, "png", bos)
                Some(bos.toByteArray)
              }
            } catch { case _: Exception => None }
          }
        } finally reader.dispose()
      } finally iis.close()
    }
  }

  /** REAL audio decoder over the JDK's javax.sound.sampled (WAV, AIFF,
    * AU — the uncompressed formats the JDK ships codecs for): decode to
    * 16-bit PCM, mono-mix, then per-window RMS energy features. Like
    * [[ImageIoDecoder]], everything is exact integer/deterministic
    * double arithmetic; undecodable payloads yield the failed sentinel.
    *
    * `resize(w, h)` reinterprets the image contract as "resample to
    * w*h samples" (nearest-sample, re-encoded 16-bit mono WAV);
    * `sampleFrames` slices the PCM stream into n equal windows,
    * each re-encoded as standalone WAV.
    */
  object AudioDecoder extends MediaDecoder {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

    /** Decode to (mono 16-bit samples, source sample rate); None if no
      * JDK codec applies.
      */
    private def pcm(media: Array[Byte]): Option[(Array[Short], Float)] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(media))
        val src = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          2 * src.getChannels, src.getSampleRate, false)
        val dec = AudioSystem.getAudioInputStream(target, in)
        val bytes = dec.readAllBytes()
        val ch = target.getChannels
        val n = bytes.length / (2 * ch)
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          // mono-mix channels with exact integer averaging
          var sum = 0L
          var c = 0
          while (c < ch) {
            val off = (i * ch + c) * 2
            sum += ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
            c += 1
          }
          out(i) = (sum / ch).toShort
          i += 1
        }
        Some((out, src.getSampleRate))
      } catch { case _: Exception => None }

    override def features(media: Array[Byte], dim: Int): Array[Float] =
      pcm(media) match {
        case None => Array.fill(dim)(-1.0f)
        case Some((samples, _)) if samples.isEmpty => Array.fill(dim)(-1.0f)
        case Some((samples, _)) =>
          val feats = new Array[Double](dim)
          var w = 0
          while (w < dim) {
            val start = (w.toLong * samples.length / dim).toInt
            val end = math.max(
              ((w + 1).toLong * samples.length / dim).toInt, start + 1)
            var acc = 0.0
            var i = start
            while (i < math.min(end, samples.length)) {
              val s = samples(i).toDouble / 32768.0
              acc += s * s
              i += 1
            }
            feats(w) = math.sqrt(acc / math.max(end - start, 1))
            w += 1
          }
          val norm = math.sqrt(feats.map(x => x * x).sum)
          if (norm == 0.0) feats.map(_ => 0.0f)
          else feats.map(x => (x / norm).toFloat)
      }

    private def encodeWav(samples: Array[Short],
        sampleRate: Float): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        bytes(i * 2) = (samples(i) & 0xff).toByte
        bytes(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate, 16, 1, 2, sampleRate, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    override def resize(media: Array[Byte], w: Int, h: Int): Array[Byte] =
      pcm(media) match {
        case None => Array.empty[Byte]
        case Some((samples, _)) if samples.isEmpty => Array.empty[Byte]
        case Some((samples, rate)) =>
          val n = w * h
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            out(i) = samples(
              math.min((i.toLong * samples.length / n).toInt,
                samples.length - 1))
            i += 1
          }
          // resampling changes duration at the SOURCE rate: scale the
          // header rate by the same factor so wall-clock duration (and
          // perceived pitch) survive the round trip
          val outRate = math.max(1f,
            rate * n.toFloat / samples.length)
          encodeWav(out, outRate)
      }

    override def sampleFrames(media: Array[Byte], n: Int)
        : Seq[Array[Byte]] =
      pcm(media) match {
        case None => Seq.empty
        case Some((samples, _)) if samples.isEmpty => Seq.empty
        case Some((samples, rate)) =>
          val take = math.min(n, samples.length)
          (0 until take).map { f =>
            val start = (f.toLong * samples.length / take).toInt
            val end = ((f + 1).toLong * samples.length / take).toInt
            // frames are true slices at the source rate
            encodeWav(java.util.Arrays.copyOfRange(
              samples, start, math.max(end, start + 1)), rate)
          }
      }
  }

  /** REAL video frame extraction for MJPEG-in-AVI — the one video
    * format decodable with zero external codecs, because each frame is
    * a plain JPEG the JDK already reads. A minimal RIFF walker (public
    * container spec: 'RIFF'/'LIST' chunks, frames in the 'movi' list
    * as '##dc'/'##db' chunks) collects frame payloads; decoding,
    * features, and resize then ride [[ImageIoDecoder]].
    *
    * `features` = the middle frame's image features (a cheap,
    * deterministic whole-video signature); `sampleFrames` returns the
    * raw JPEG payloads evenly sampled over the sequence (already
    * decodable images, no re-encode); `resize` resizes the middle
    * frame. Compressed codecs (H.264 etc.) have no JDK decoder and
    * fall out as the failed sentinel.
    */
  object AviMjpegDecoder extends MediaDecoder {
    /** (offset, length) of every video-stream chunk payload, on-disk
      * order — payloads are copied only when a frame is SELECTED, so
      * features/resize (which keep one frame) never duplicate the
      * whole file. Iterative worklist walk with ALL arithmetic in
      * Long: crafted size fields near 2^32 can neither wrap to a
      * non-advancing offset (hang) nor index negatively (crash), and
      * nesting depth is heap-bounded, not stack-bounded — a malformed
      * payload degrades to "no frames" (→ the failed sentinel), never
      * to a stuck or killed task.
      */
    private[multimodal] def frameSpans(avi: Array[Byte])
        : Seq[(Int, Int)] = {
      def u32(off: Int): Long =
        (avi(off) & 0xffL) | ((avi(off + 1) & 0xffL) << 8) |
          ((avi(off + 2) & 0xffL) << 16) | ((avi(off + 3) & 0xffL) << 24)
      def fourcc(off: Int): String =
        new String(avi, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      def isFrame(cc: String): Boolean =
        cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
          (cc.endsWith("dc") || cc.endsWith("db"))
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      if (avi.length < 12 || fourcc(0) != "RIFF") return Seq.empty
      val work = scala.collection.mutable.Stack[(Long, Long)]((0L, avi.length.toLong))
      while (work.nonEmpty) {
        var (off, end) = work.pop()
        while (off + 8 <= end) {
          val cc = fourcc(off.toInt)
          val size = u32(off.toInt + 4) // unsigned, in [0, 2^32)
          val dataStart = off + 8
          val dataEnd = dataStart + size // Long math: cannot wrap
          if (dataEnd > end) { off = end } // corrupt — stop this level
          else {
            if (cc == "RIFF" || cc == "LIST") {
              if (dataStart + 4 <= end) work.push((dataStart + 4, dataEnd))
            } else if (isFrame(cc) && size > 0) {
              out += ((dataStart.toInt, size.toInt))
            }
            off = dataEnd + (size & 1) // chunks pad to even
          }
        }
      }
      // the LIFO worklist visits sibling LISTs (interleaved 'rec '
      // groups, OpenDML AVIX segments) in reverse — restore true
      // on-disk order by offset so frame indices are temporal
      out.sortBy(_._1).toSeq
    }

    private def copySpan(avi: Array[Byte], span: (Int, Int)): Array[Byte] =
      java.util.Arrays.copyOfRange(avi, span._1, span._1 + span._2)

    private def middle(avi: Array[Byte]): Option[Array[Byte]] = {
      val fs = frameSpans(avi)
      if (fs.isEmpty) None else Some(copySpan(avi, fs(fs.length / 2)))
    }

    override def features(media: Array[Byte], dim: Int): Array[Float] =
      middle(media) match {
        case None => Array.fill(dim)(-1.0f)
        case Some(frame) => ImageIoDecoder.features(frame, dim)
      }

    /** Video perceptual hash = the middle keyframe's image grid, so
      * near-identical clips (re-encodes, watermarks) dedup with the
      * same dHash machinery as stills.
      */
    override def grayGrid(media: Array[Byte], gw: Int, gh: Int)
        : Option[Array[Long]] =
      middle(media).flatMap(ImageIoDecoder.grayGrid(_, gw, gh))

    override def resize(media: Array[Byte], w: Int, h: Int): Array[Byte] =
      middle(media) match {
        case None => Array.empty[Byte]
        case Some(frame) => ImageIoDecoder.resize(frame, w, h)
      }

    override def sampleFrames(media: Array[Byte], n: Int)
        : Seq[Array[Byte]] = {
      val fs = frameSpans(media)
      if (fs.isEmpty) return Seq.empty
      val take = math.min(n, fs.length)
      (0 until take).map { f =>
        val idx = if (take == 1) 0 else (f.toLong * (fs.length - 1) / (take - 1)).toInt
        copySpan(media, fs(idx))
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
