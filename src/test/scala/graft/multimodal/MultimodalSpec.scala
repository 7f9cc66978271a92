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

  // ---- real JDK codec path (ImageIoDecoder) ----

  private def pngBytes(w: Int, h: Int)(px: (Int, Int) => Int)
      : Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder: real PNG decode drives luminance features") {
    // left half black, right half white
    val img = pngBytes(32, 32)((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val f = Multimodal.ImageIoDecoder.features(img, 16)
    assert(f.length === 16)
    // unit norm
    assert(math.abs(f.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
    // 16 features = 4x4 grid: each row has 2 dark then 2 bright cells
    for (row <- 0 until 4) {
      val cells = f.slice(row * 4, row * 4 + 4)
      assert(cells(0) < 1e-6 && cells(1) < 1e-6, s"row $row left dark")
      assert(cells(2) > 0.1f && cells(3) > 0.1f, s"row $row right bright")
    }
    // deterministic across calls
    assert(Multimodal.ImageIoDecoder.features(img, 16).toSeq === f.toSeq)
    // distinct images → distinct features
    val inv = pngBytes(32, 32)((x, _) => if (x < 16) 0xffffff else 0x000000)
    assert(Multimodal.ImageIoDecoder.features(inv, 16).toSeq !== f.toSeq)
  }

  test("ImageIoDecoder: undecodable bytes get the failed sentinel; " +
      "BMP and JPEG also decode") {
    val junk = Array.fill(128)(0x5a.toByte)
    assert(Multimodal.ImageIoDecoder.features(junk, 8).toSeq ===
      Seq.fill(8)(-1.0f))
    for (fmt <- Seq("bmp", "jpg")) {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt codec")
      val f = Multimodal.ImageIoDecoder.features(bos.toByteArray, 8)
      assert(f.forall(_ >= 0f), s"$fmt decoded to sentinel")
    }
  }

  test("ImageIoDecoder: resize re-encodes PNG at the target dims and " +
      "preserves the pixel layout") {
    val img = pngBytes(64, 32)((x, _) => if (x < 32) 0xff0000 else 0x0000ff)
    val resized = Multimodal.ImageIoDecoder.resize(img, 16, 16)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth === 16 && back.getHeight === 16)
    assert((back.getRGB(2, 8) & 0xffffff) === 0xff0000) // left stays red
    assert((back.getRGB(13, 8) & 0xffffff) === 0x0000ff) // right stays blue
  }

  test("ImageIoDecoder: end-to-end through mediaFeatures over a DF") {
    val rows = Seq(
      (1L, pngBytes(16, 16)((_, _) => 0xffffff)),
      (2L, pngBytes(16, 16)((_, _) => 0x000000)),
      (3L, Array.fill(64)(0x00.toByte)) // undecodable
    ).toDF("id", "media")
    val out = Multimodal.mediaFeatures(rows, "media", "emb", 9,
      decoder = Multimodal.ImageIoDecoder)
      .select($"id", $"emb").as[(Long, Array[Float])].collect().toMap
    assert(out(1L).forall(f => math.abs(f - 1.0f / 3) < 1e-4)) // uniform
    assert(out(2L).forall(_ === 0f)) // all-black → zero (norm-0 guard)
    assert(out(3L).toSeq === Seq.fill(9)(-1.0f)) // sentinel
  }

  // ---- real MJPEG-AVI video path (AviMjpegDecoder) ----

  /** Minimal valid RIFF/AVI: RIFF('AVI ') > LIST('movi') > 00dc chunks. */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val chunks = new java.io.ByteArrayOutputStream()
    frames.foreach { f =>
      chunks.write("00dc".getBytes); chunks.write(u32(f.length))
      chunks.write(f)
      if (f.length % 2 == 1) chunks.write(0) // even padding
    }
    val movi = "movi".getBytes ++ chunks.toByteArray
    val list = "LIST".getBytes ++ u32(movi.length) ++ movi
    val body = "AVI ".getBytes ++ list
    bos.write("RIFF".getBytes); bos.write(u32(body.length))
    bos.write(body)
    bos.toByteArray
  }

  private def jpegBytes(rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("AviMjpegDecoder: walks the RIFF container and decodes frames") {
    val avi = aviBytes(Seq(
      jpegBytes(0x000000), jpegBytes(0x808080), jpegBytes(0xffffff)))
    val frames = Multimodal.AviMjpegDecoder.sampleFrames(avi, 3)
    assert(frames.length === 3)
    val lums = frames.map { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f))
      img.getRGB(8, 8) & 0xff
    }
    assert(lums(0) < 40 && lums(2) > 215, s"frame order lost: $lums")
    assert(lums(1) > 90 && lums(1) < 170)
    // features come from the REAL middle frame (mid gray, not black)
    val feat = Multimodal.AviMjpegDecoder.features(avi, 4)
    assert(feat.forall(f => f > 0.49f && f < 0.51f)) // uniform unit-norm
    // resize rides the image path
    val resized = Multimodal.AviMjpegDecoder.resize(avi, 4, 4)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth === 4)
    // junk → sentinel / empty
    assert(Multimodal.AviMjpegDecoder.features(
      Array.fill(64)(0x11.toByte), 4).toSeq === Seq.fill(4)(-1.0f))
    assert(Multimodal.AviMjpegDecoder.sampleFrames(
      Array.fill(64)(0x11.toByte), 2).isEmpty)
  }

  // ---- real JDK audio path (AudioDecoder) ----

  private def wavBytes(samples: Array[Short], rate: Float = 16000f)
      : Array[Byte] = {
    import javax.sound.sampled._
    val bytes = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      bytes(i * 2) = (s & 0xff).toByte
      bytes(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate,
      16, 1, 2, rate, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioDecoder: real WAV decode drives RMS-energy features") {
    // first half silence, second half full-scale square wave
    val samples = Array.tabulate[Short](8000)(i =>
      if (i < 4000) 0
      else if ((i / 8) % 2 == 0) 30000 else -30000)
    val wav = wavBytes(samples)
    val f = Multimodal.AudioDecoder.features(wav, 8)
    assert(f.length === 8)
    assert(math.abs(f.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
    assert(f.take(4).forall(_ < 1e-6), "silent half must be ~0")
    assert(f.drop(4).forall(_ > 0.3f), "loud half must carry the energy")
    // deterministic
    assert(Multimodal.AudioDecoder.features(wav, 8).toSeq === f.toSeq)
    // junk bytes → sentinel
    assert(Multimodal.AudioDecoder.features(
      Array.fill(64)(0x33.toByte), 4).toSeq === Seq.fill(4)(-1.0f))
  }

  test("AudioDecoder: resample and frame-slice round-trip as WAV") {
    val samples = Array.tabulate[Short](4000)(i => (i % 100 * 300).toShort)
    val wav = wavBytes(samples)
    val resized = Multimodal.AudioDecoder.resize(wav, 40, 25) // 1000 samples
    val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(resized))
    assert(back.getFrameLength === 1000)
    val frames = Multimodal.AudioDecoder.sampleFrames(wav, 4)
    assert(frames.length === 4)
    frames.foreach { fr =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(fr))
      assert(ais.getFrameLength === 1000) // 4000 / 4
    }
  }

  test("ImageIoDecoder: sampleFrames yields a decodable frame for " +
      "single-image payloads") {
    val img = pngBytes(8, 8)((_, _) => 0x123456)
    val frames = Multimodal.ImageIoDecoder.sampleFrames(img, 4)
    assert(frames.length === 1)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frames.head))
    assert(back.getWidth === 8)
    assert(Multimodal.ImageIoDecoder.sampleFrames(
      Array.fill(10)(0x7f.toByte), 2).isEmpty)
  }

  // ---- perceptual hashing (dHash/aHash) over real decoded pixels ----

  // a gradient-rich base image: brightness varies with x and y so the
  // dHash gradient bits carry real structure
  private def gradientPng(tweak: (Int, Int) => Int): Array[Byte] =
    pngBytes(64, 64) { (x, y) =>
      val v = math.min(255, (x * 3 + y) + tweak(x, y))
      (v << 16) | (v << 8) | v
    }

  test("dHash: near-identical PNGs land within hamming 3; a distinct " +
      "image does not") {
    val base = gradientPng((_, _) => 0)
    // a mild local edit: +6 brightness in one 6x6 patch (a watermark)
    val edited = gradientPng((x, y) =>
      if (x >= 20 && x < 26 && y >= 20 && y < 26) 6 else 0)
    val distinct = pngBytes(64, 64)((x, y) =>
      if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xffffff)
    def dh(png: Array[Byte]): Long = PerceptualHash.dHash64(
      Multimodal.ImageIoDecoder.grayGrid(png, 9, 8).get)
    val (hb, he, hd) = (dh(base), dh(edited), dh(distinct))
    assert(java.lang.Long.bitCount(hb ^ he) <= 3,
      s"near-dup hamming ${java.lang.Long.bitCount(hb ^ he)}")
    assert(java.lang.Long.bitCount(hb ^ hd) > 10,
      s"distinct hamming ${java.lang.Long.bitCount(hb ^ hd)}")
    // aHash agrees on the near-dup relation
    def ah(png: Array[Byte]): Long = PerceptualHash.aHash64(
      Multimodal.ImageIoDecoder.grayGrid(png, 8, 8).get)
    assert(java.lang.Long.bitCount(ah(base) ^ ah(edited)) <= 3)
  }

  test("imageDupPairs finds the re-encoded near-dup through the real " +
      "decoder and skips undecodable payloads") {
    val base = gradientPng((_, _) => 0)
    val edited = gradientPng((x, y) =>
      if (x >= 20 && x < 26 && y >= 20 && y < 26) 6 else 0)
    val distinct = pngBytes(64, 64)((x, y) =>
      if ((x / 8 + y / 8) % 2 == 0) 0x000000 else 0xffffff)
    val junk = Array.fill(64)(0x5a.toByte)
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, base),
        org.apache.spark.sql.Row(2L, edited),
        org.apache.spark.sql.Row(3L, distinct),
        org.apache.spark.sql.Row(4L, junk)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("media",
          org.apache.spark.sql.types.BinaryType))))
    val pairs = PerceptualHash.imageDupPairs(df, "id", "media",
      maxHamming = 3, decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("video perceptual hash: middle MJPEG frame drives the grid") {
    // reuse the AVI fixture builder if frames decode; a non-AVI payload
    // yields None (no crash)
    assert(Multimodal.AviMjpegDecoder.grayGrid(
      Array.fill(32)(1.toByte), 9, 8).isEmpty)
  }
}
