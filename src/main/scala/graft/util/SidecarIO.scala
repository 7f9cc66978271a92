package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.{MessageType, MessageTypeParser, PrimitiveType}

/** Driver-local parquet IO for BOUNDED index sidecars (centroid
  * tables, `_meta` records, scalar-quantizer models, tombstone id
  * lists). These are control state — nCells / dim / "operational
  * trickle" sized, never data-scale — yet reading them through
  * `spark.read.parquet(...).collect()` launches a full Spark job
  * (listing + schema inference + a one-task stage) and writing them
  * through `.coalesce(1).write` launches another. On the index
  * lifecycle paths (build / load / delete / merge / compact) those
  * fixed-cost jobs dominate the sf-scale artifact work itself.
  * Reading/writing the same parquet bytes with parquet-java on the
  * driver removes the jobs while keeping the on-disk format identical
  * (Spark and DuckDB keep reading the sidecars unchanged).
  *
  * Scope guard: ONLY for sidecars bounded by model parameters. Data
  * files stay on Spark's distributed read/write paths.
  */
object SidecarIO {

  /** Visible data files of a sidecar dir (skip _SUCCESS/.crc/hidden),
    * lexicographic for deterministic multi-file ordering.
    */
  private def partFiles(fs: FileSystem, dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isFile)
      .map(_.getPath)
      .filterNot(p => p.getName.startsWith("_") ||
        p.getName.startsWith("."))
      .sortBy(_.getName)

  /** Every row of a tiny sidecar as example Groups (all part files
    * concatenated in name order).
    */
  private def readGroups(conf: Configuration, dir: String): Seq[Group] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    partFiles(fs, d).flatMap { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), f).withConf(conf).build()
      try Iterator.continually(reader.read()).takeWhile(_ != null).toList
      finally reader.close()
    }
  }

  /** The sidecar's leaf schema (first part file's footer) — a pure
    * driver-side footer read, no row materialization.
    */
  def schemaOf(conf: Configuration, dir: String): Option[MessageType] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    partFiles(fs, d).headOption.map { f =>
      val in = HadoopInputFile.fromPath(f, conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getFileMetaData.getSchema finally r.close()
    }
  }

  /** Float-array column inside a (LIST)-annotated group — handles both
    * the parquet-java layout written here (required elements) and
    * Spark's own writer layout (optional elements), which share the
    * 3-level list/element structure.
    */
  private def floatList(g: Group, field: Int): Array[Float] = {
    val lst = g.getGroup(field, 0)
    Array.tabulate(lst.getFieldRepetitionCount(0))(
      i => lst.getGroup(0, i).getFloat(0, 0))
  }

  /** `_centroids` sidecar → centroid table ordered by cell_id. */
  def readCentroids(conf: Configuration, dir: String)
      : Array[Array[Float]] =
    readGroups(conf, dir)
      .map(g => g.getInteger("cell_id", 0) ->
        floatList(g, g.getType.getFieldIndex("centroid")))
      .sortBy(_._1).map(_._2).toArray

  /** `_meta` sidecar → the build-time id column, if present. */
  def readMetaIdCol(conf: Configuration, dir: String): Option[String] =
    readGroups(conf, dir).headOption.map(_.getString("id_col", 0))

  /** `_sqmodel` sidecar → per-dimension (min, max), ordered by pos. */
  def readSqModel(conf: Configuration, dir: String)
      : (Array[Double], Array[Double]) = {
    val rows = readGroups(conf, dir)
      .map(g => (g.getInteger("pos", 0), g.getDouble("mn", 0),
        g.getDouble("mx", 0)))
      .sortBy(_._1)
    (rows.map(_._2).toArray, rows.map(_._3).toArray)
  }

  /** Single-column sidecar (tombstone id lists) → (original column
    * name, driver-local relation named `outName` with the matching
    * Spark type). Covers the integral ids the dense index guards for
    * plus string ids the sparse surface admits.
    */
  def readSingleColLocal(spark: org.apache.spark.sql.SparkSession,
      dir: String, outName: String)
      : (String, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val schema = schemaOf(spark.sessionState.newHadoopConf(), dir)
      .getOrElse(throw new IllegalStateException(
        s"no readable sidecar under $dir"))
    val name = schema.getFields.get(0).getName
    val prim = schema.getFields.get(0).asPrimitiveType()
      .getPrimitiveTypeName
    val groups = readGroups(spark.sessionState.newHadoopConf(), dir)
    val df = prim match {
      case PrimitiveType.PrimitiveTypeName.INT64 =>
        groups.map(_.getLong(0, 0)).distinct.toDF(outName)
      case PrimitiveType.PrimitiveTypeName.INT32 =>
        groups.map(_.getInteger(0, 0)).distinct.toDF(outName)
      case PrimitiveType.PrimitiveTypeName.BINARY =>
        groups.map(_.getString(0, 0)).distinct.toDF(outName)
      case other => throw new IllegalStateException(
        s"unexpected tombstone column type $other under $dir")
    }
    (name, df)
  }

  /** Sparse-index `_meta` → (n_docs, vocab, n_buckets). */
  def readSparseMeta(conf: Configuration, dir: String)
      : (Long, Int, Int) = {
    val g = readGroups(conf, dir).headOption.getOrElse(
      throw new IllegalStateException(s"no _meta sidecar under $dir"))
    (g.getLong("n_docs", 0), g.getInteger("vocab", 0),
      g.getInteger("n_buckets", 0))
  }

  // ---- writers -------------------------------------------------------

  private def overwriteWith(conf: Configuration, dir: String,
      schema: MessageType)(fill: (SimpleGroupFactory,
        org.apache.parquet.hadoop.ParquetWriter[Group]) => Unit): Unit = {
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (fs.exists(d)) fs.delete(d, true)
    fs.mkdirs(d)
    val writer = ExampleParquetWriter
      .builder(new Path(d, "part-00000.parquet"))
      .withConf(conf)
      .withType(schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try fill(new SimpleGroupFactory(schema), writer)
    finally writer.close()
  }

  def writeMeta(conf: Configuration, dir: String, idCol: String,
      vecCol: String): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      """message meta {
        |  required binary id_col (UTF8);
        |  required binary vec_col (UTF8);
        |}""".stripMargin)
    overwriteWith(conf, dir, schema) { (gf, w) =>
      w.write(gf.newGroup().append("id_col", idCol)
        .append("vec_col", vecCol))
    }
  }

  def writeCentroids(conf: Configuration, dir: String,
      centroids: Array[Array[Float]]): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      """message centroids {
        |  required int32 cell_id;
        |  required group centroid (LIST) {
        |    repeated group list {
        |      required float element;
        |    }
        |  }
        |}""".stripMargin)
    overwriteWith(conf, dir, schema) { (gf, w) =>
      centroids.zipWithIndex.foreach { case (c, i) =>
        val g = gf.newGroup()
        g.append("cell_id", i)
        val lst = g.addGroup("centroid")
        c.foreach(f => lst.addGroup("list").append("element", f))
        w.write(g)
      }
    }
  }

  def writeSparseMeta(conf: Configuration, dir: String, nDocs: Long,
      vocab: Int, nBuckets: Int): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      """message meta {
        |  required int64 n_docs;
        |  required int32 vocab;
        |  required int32 n_buckets;
        |}""".stripMargin)
    overwriteWith(conf, dir, schema) { (gf, w) =>
      w.write(gf.newGroup().append("n_docs", nDocs)
        .append("vocab", vocab).append("n_buckets", nBuckets))
    }
  }

  /** Sparse-index `_stats` sidecar: (idx, df) per surviving term. */
  def writeIdxDf(conf: Configuration, dir: String,
      rows: Seq[(Int, Long)]): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      """message stats {
        |  required int32 idx;
        |  required int64 df;
        |}""".stripMargin)
    overwriteWith(conf, dir, schema) { (gf, w) =>
      rows.foreach { case (i, d) =>
        w.write(gf.newGroup().append("idx", i).append("df", d))
      }
    }
  }

  def writeSqModel(conf: Configuration, dir: String, mn: Array[Double],
      mx: Array[Double]): Unit = {
    val schema = MessageTypeParser.parseMessageType(
      """message sqmodel {
        |  required int32 pos;
        |  required double mn;
        |  required double mx;
        |}""".stripMargin)
    overwriteWith(conf, dir, schema) { (gf, w) =>
      mn.indices.foreach { i =>
        w.write(gf.newGroup().append("pos", i).append("mn", mn(i))
          .append("mx", mx(i)))
      }
    }
  }
}
