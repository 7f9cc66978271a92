package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.VecsFiles

/** Gate faces for the file-format readers (SURVEY S1-S3): the vecs
  * decode path was ScalaTest-only; this registers it against the
  * DuckDB oracle by round-tripping a bounded fixture slice of the
  * embeddings table through a REAL `.fvecs` artifact and decoding it
  * back with the record-aligned split reader. The split size is forced
  * far below the file size so the gate exercises the multi-split path
  * (~17 splits at 256 × 64-float records), not a single whole-file
  * read — the shape that matters at SIFT1B scale.
  */
object SourceQueries {
  private implicit class ColName(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }

  private val FixtureRows = 256

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fvecs_decode" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      // bounded fixture slice (FixtureRows vectors, a model-sized
      // collect like the PQ codebook, NOT corpus-sized), written in
      // vec_id order so record index == vec_id rank
      val vecs = emb.where($"vec_id" < FixtureRows).orderBy($"vec_id")
        .select($"embedding").collect()
        .map(_.getSeq[Float](0).toArray).toSeq
      val tmp = java.nio.file.Files.createTempDirectory("graft_fvecs")
      val file = tmp.resolve("fixture.fvecs").toString
      VecsFiles.writeFvecs(file, vecs)
      VecsFiles.readFvecs(s, file, splitBytes = 4096)
        .select($"idx", posexplode($"vector"))
        .toDF("idx", "pos", "val")
    })
  )

  val oracleSql: Map[String, String] = Map(
    // float32 survives the fvecs round-trip bit-exactly, so the oracle
    // is simply the same slice of the parquet table, exploded; two
    // unnests in one SELECT zip pairwise in DuckDB
    "q_fvecs_decode" ->
      s"""SELECT idx, CAST(unnest(range(0, len(embedding))) AS INT) AS pos,
         |  unnest(embedding) AS val
         |FROM (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT)
         |    AS idx, embedding
         |  FROM embeddings WHERE vec_id < $FixtureRows) _e
         |ORDER BY idx, pos""".stripMargin
  )
}
