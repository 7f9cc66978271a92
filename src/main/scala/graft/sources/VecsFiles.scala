package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers/writers for the `.fvecs/.ivecs/.bvecs` vector dataset formats
  * (SURVEY S1-S3; record layout `dim:u32 LE` + `dim` elements,
  * `lantern_extras/src/dotvecs.rs:85-138`).
  *
  * Implementation: Spark's binaryFile source + per-file decode — the
  * file is the unit of parallelism, which matches how these benchmark
  * archives ship (many moderate files). The formats are fixed-record
  * once the first dim is read, so a splitting FileFormat is possible,
  * but per-file parallelism is the right complexity until single files
  * exceed partition size. Constant dimension is enforced per file, as
  * in the reference (`dotvecs.rs:131-136`); `limit` mirrors the SRF
  * count argument (`dotvecs.rs:126-128`).
  */
object VecsFiles {
  sealed trait ElemType {
    def bytes: Int
    def sparkType: DataType
  }
  case object F32 extends ElemType { val bytes = 4; val sparkType = FloatType }
  case object I32 extends ElemType { val bytes = 4; val sparkType = IntegerType }
  case object U8 extends ElemType { val bytes = 1; val sparkType = ShortType }

  private def decode(content: Array[Byte], elem: ElemType,
      limit: Int): Seq[Seq[Any]] = {
    val buf = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    val out = Seq.newBuilder[Seq[Any]]
    var expectedDim = -1
    var n = 0
    while (buf.remaining() >= 4 && (limit < 0 || n < limit)) {
      val dim = buf.getInt()
      if (dim <= 0) throw new IllegalArgumentException(
        s"invalid vector dimension $dim at record $n")
      if (expectedDim < 0) expectedDim = dim
      else if (dim != expectedDim) throw new IllegalArgumentException(
        s"varying dimension: $expectedDim then $dim at record $n")
      if (buf.remaining() < dim * elem.bytes)
        throw new IllegalArgumentException(
          s"truncated record $n: need ${dim * elem.bytes} bytes, " +
            s"have ${buf.remaining()}")
      val v: Seq[Any] = elem match {
        case F32 => Seq.fill(dim)(buf.getFloat())
        case I32 => Seq.fill(dim)(buf.getInt())
        case U8 => Seq.fill(dim)((buf.get() & 0xff).toShort)
      }
      out += v
      n += 1
    }
    out.result()
  }

  private def read(spark: SparkSession, path: String, elem: ElemType,
      limit: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("idx", LongType, nullable = false),
      StructField("vector", ArrayType(elem.sparkType, containsNull = false),
        nullable = false)))
    val bin = spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    bin.flatMap { r =>
      val file = r.getString(0)
      decode(r.getAs[Array[Byte]](1), elem, limit).zipWithIndex.map {
        case (v, i) => Row(file, i.toLong, v)
      }
    }(enc)
  }

  /** S1: `.fvecs` → (file, idx, vector ARRAY<FLOAT>). */
  def readFvecs(spark: SparkSession, path: String, limit: Int = -1)
      : DataFrame = read(spark, path, F32, limit)

  /** S2: `.ivecs` → ARRAY<INT>. */
  def readIvecs(spark: SparkSession, path: String, limit: Int = -1)
      : DataFrame = read(spark, path, I32, limit)

  /** S3: `.bvecs` → u8 widened to ARRAY<SMALLINT> (`dotvecs.rs:65-83`). */
  def readBvecs(spark: SparkSession, path: String, limit: Int = -1)
      : DataFrame = read(spark, path, U8, limit)

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
