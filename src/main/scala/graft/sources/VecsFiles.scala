package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers/writers for the `.fvecs/.ivecs/.bvecs` vector dataset formats
  * (SURVEY S1-S3; record layout `dim:u32 LE` + `dim` elements,
  * `lantern_extras/src/dotvecs.rs:85-138`).
  *
  * Implementation: the formats are fixed-record once the leading dim is
  * read, so the reader probes each file's 4-byte header, derives the
  * record size, and plans RECORD-ALIGNED BYTE-RANGE SPLITS (default
  * 128 MB). Each task seeks to its range and decodes only that slice —
  * a single multi-GB SIFT1B-scale file becomes many bounded-memory
  * tasks instead of one whole-file buffer (the reference streams
  * records for the same reason, `dotvecs.rs:85-138`). Constant
  * dimension per file is enforced at plan time (size divisibility) AND
  * per record during decode (`dotvecs.rs:131-136`); `limit` mirrors
  * the SRF count argument (`dotvecs.rs:126-128`), applied per file.
  */
object VecsFiles {
  sealed trait ElemType extends Serializable {
    def bytes: Int
    def sparkType: DataType
  }
  case object F32 extends ElemType { val bytes = 4; val sparkType = FloatType }
  case object I32 extends ElemType { val bytes = 4; val sparkType = IntegerType }
  case object U8 extends ElemType { val bytes = 1; val sparkType = ShortType }

  val DefaultSplitBytes: Long = 128L << 20

  // not `private`: the split Dataset's encoder codegen needs
  // bytecode-public access to the class
  private[sources] case class VecSplit(file: String, dim: Int,
      startRec: Long, numRec: Long)

  /** Decode one record-aligned slice; every record's dim header must
    * match the probed file dim.
    */
  private def decodeSlice(content: Array[Byte], elem: ElemType,
      expectedDim: Int, baseRec: Long): Iterator[(Long, Seq[Any])] = {
    val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    val n = content.length / (4 + expectedDim * elem.bytes)
    (0 until n).iterator.map { i =>
      val dim = buf.getInt()
      if (dim != expectedDim) throw new IllegalArgumentException(
        s"varying dimension: $expectedDim then $dim at record " +
          s"${baseRec + i}")
      val v: Seq[Any] = elem match {
        case F32 => Seq.fill(dim)(buf.getFloat())
        case I32 => Seq.fill(dim)(buf.getInt())
        case U8 => Seq.fill(dim)((buf.get() & 0xff).toShort)
      }
      (baseRec + i, v)
    }
  }

  private def read(spark: SparkSession, path: String, elem: ElemType,
      limit: Int, splitBytes: Long): DataFrame = {
    require(splitBytes >= 16, s"splitBytes too small: $splitBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(conf)
    val statuses = Option(fs.globStatus(hp)).map(_.toSeq)
      .getOrElse(Seq.empty)
      .flatMap(st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st))
      .filterNot { st =>
        val n = st.getPath.getName; n.startsWith("_") || n.startsWith(".")
      }
    require(statuses.nonEmpty, s"no vecs files at $path")
    val splits = statuses.flatMap { st =>
      val len = st.getLen
      if (len == 0) Seq.empty[VecSplit]
      else {
        val header = new Array[Byte](4)
        val in = fs.open(st.getPath)
        try in.readFully(0L, header) finally in.close()
        val dim = ByteBuffer.wrap(header)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        if (dim <= 0) throw new IllegalArgumentException(
          s"invalid vector dimension $dim in ${st.getPath}")
        val recBytes = 4L + dim.toLong * elem.bytes
        if (recBytes > Int.MaxValue - 8) throw new IllegalArgumentException(
          s"${st.getPath}: single record of $recBytes bytes exceeds " +
            "the per-task decode buffer")
        if (len % recBytes != 0) throw new IllegalArgumentException(
          s"${st.getPath}: $len bytes is not a whole number of " +
            s"$recBytes-byte records (truncated or varying dimension)")
        val totalRec =
          if (limit >= 0) math.min(len / recBytes, limit.toLong)
          else len / recBytes
        // a split's decode buffer is one Array[Byte]: cap records per
        // split so numRec * recBytes always fits in Int
        val recsPerSplit = math.max(1L,
          math.min(splitBytes, Int.MaxValue - 8L) / recBytes)
        (0L until totalRec by recsPerSplit).map(s => VecSplit(
          st.getPath.toString, dim, s,
          math.min(recsPerSplit, totalRec - s)))
      }
    }
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("idx", LongType, nullable = false),
      StructField("vector", ArrayType(elem.sparkType, containsNull = false),
        nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    if (splits.isEmpty)
      return spark.createDataFrame(java.util.List.of[Row](), schema)
    val confSer = spark.sparkContext.broadcast(
      org.apache.spark.sql.graftshim.GraftShims.serializableConf(conf))
    val splitDS = spark.createDataset(splits)(
      org.apache.spark.sql.Encoders.product[VecSplit])
      .repartition(splits.size) // one bounded-memory decode per task
    splitDS.flatMap { sp =>
      val p = new org.apache.hadoop.fs.Path(sp.file)
      val taskFs = p.getFileSystem(
        org.apache.spark.sql.graftshim.GraftShims.confOf(confSer.value))
      val recBytes = 4 + sp.dim * elem.bytes
      val bytes = new Array[Byte]((recBytes * sp.numRec).toInt)
      val in = taskFs.open(p)
      try in.readFully(sp.startRec * recBytes, bytes) finally in.close()
      decodeSlice(bytes, elem, sp.dim, sp.startRec).map {
        case (idx, v) => Row(sp.file, idx, v)
      }
    }(enc)
  }

  /** S1: `.fvecs` → (file, idx, vector ARRAY<FLOAT>). */
  def readFvecs(spark: SparkSession, path: String, limit: Int = -1,
      splitBytes: Long = DefaultSplitBytes): DataFrame =
    read(spark, path, F32, limit, splitBytes)

  /** S2: `.ivecs` → ARRAY<INT>. */
  def readIvecs(spark: SparkSession, path: String, limit: Int = -1,
      splitBytes: Long = DefaultSplitBytes): DataFrame =
    read(spark, path, I32, limit, splitBytes)

  /** S3: `.bvecs` → u8 widened to ARRAY<SMALLINT> (`dotvecs.rs:65-83`). */
  def readBvecs(spark: SparkSession, path: String, limit: Int = -1,
      splitBytes: Long = DefaultSplitBytes): DataFrame =
    read(spark, path, U8, limit, splitBytes)

  /** Test/fixture writer (driver-side; fixtures are small). */
  def writeFvecs(path: String, vectors: Seq[Array[Float]]): Unit = {
    val total = vectors.map(v => 4 + 4 * v.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    vectors.foreach { v =>
      buf.putInt(v.length)
      v.foreach(buf.putFloat)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  def writeIvecs(path: String, vectors: Seq[Array[Int]]): Unit = {
    val total = vectors.map(v => 4 + 4 * v.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    vectors.foreach { v =>
      buf.putInt(v.length)
      v.foreach(buf.putInt)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  def writeBvecs(path: String, vectors: Seq[Array[Byte]]): Unit = {
    val total = vectors.map(v => 4 + v.length).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    vectors.foreach { v =>
      buf.putInt(v.length)
      v.foreach(buf.put)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
  }

  /** S9: CSV sink `(id, "{v1,...,vn}")` (`embeddings/mod.rs:386-415`). */
  def writeCsvEmbeddings(df: DataFrame, idCol: String, vecCol: String,
      path: String): Unit =
    df.select(col(idCol),
        concat(lit("{"),
          concat_ws(",", transform(col(vecCol), _.cast("string"))),
          lit("}")).as("embedding"))
      .write.mode("overwrite").option("header", "false").csv(path)
}
