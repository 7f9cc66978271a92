package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.multimodal.Multimodal.{MediaDecoder, StubDecoder, MaxMediaBytes}

/** Perceptual image hashing + near-dup pair discovery — the
  * image-corpus face of the dedup suite (the capability a multimodal
  * training pipeline needs that text shingles cannot give it).
  * Reference capability analog: the reference embeds images for
  * similarity (`lantern_cli/src/embeddings/core/ort_runtime.rs`
  * image pipelines); dHash answers the cheaper question "is this the
  * same picture, re-encoded/resized/slightly edited" without a model.
  *
  * Hashes are computed from the decoder's INTEGER luminance grid
  * ([[MediaDecoder.grayGrid]]) so every bit is an exact integer
  * comparison — reproducible across engines, which is what lets the
  * stub-decoder face be DuckDB-oracle-checked end to end
  * (q_image_dedup), while the SAME code runs real JDK-decoded pixels
  * in production (MultimodalSpec proves near-identical PNGs land
  * within hamming 3 of each other).
  *
  * Scale shape: hashing is a batched mapPartitions projection (one
  * 64-bit long per image); pair discovery reuses the SimHash
  * chunk-pigeonhole join ([[graft.operators.Dedup.hammingDupPairs]]) —
  * shuffle by 16-bit chunk key, exact bit_count verification, never
  * an all-pairs join.
  */
object PerceptualHash {

  /** dHash (difference hash, 9×8 grid): bit y*8+x is set iff the cell
    * to the right is strictly brighter — gradient structure, robust to
    * re-encoding and global brightness shifts (Krawetz's classic
    * construction, public domain).
    */
  def dHash64(grid9x8: Array[Long]): Long = {
    require(grid9x8.length == 72, s"need 9x8 grid, got ${grid9x8.length}")
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (grid9x8(y * 9 + x + 1) > grid9x8(y * 9 + x))
          h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** aHash (average hash, 8×8 grid): bit i set iff cell i is brighter
    * than the grid mean. Compared as g[i]*64 > sum — exact integer
    * arithmetic; callers must supply bounded luma grids (ImageIo's
    * 0..255000 leaves 2^63 / 64 / 255000 ≈ 5.6e11 of headroom).
    */
  def aHash64(grid8x8: Array[Long]): Long = {
    require(grid8x8.length == 64, s"need 8x8 grid, got ${grid8x8.length}")
    var sum = 0L
    var i = 0
    while (i < 64) { sum += grid8x8(i); i += 1 }
    var h = 0L
    i = 0
    while (i < 64) {
      if (grid8x8(i) * 64 > sum) h |= 1L << i
      i += 1
    }
    h
  }

  /** Per-image hashes: (…input columns…, dhash LONG, ahash LONG).
    * Null for null / oversized / undecodable payloads — such rows take
    * no part in pair discovery (hammingDupPairs drops null hashes).
    */
  def imageHashes(df: DataFrame, binCol: String,
      decoder: MediaDecoder = StubDecoder,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("dhash", LongType, nullable = true),
      StructField("ahash", LongType, nullable = true)))
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val bytes = if (r.isNullAt(idx)) null
            else r.getAs[Array[Byte]](idx)
          val (d, a) =
            if (bytes == null || bytes.length > MaxMediaBytes) (null, null)
            else decoder.hashGrids(bytes) match {
              // one decode serves both grids (ImageIoDecoder would
              // otherwise fully decode the compressed payload twice)
              case Some((gd, ga)) =>
                (java.lang.Long.valueOf(dHash64(gd)),
                  java.lang.Long.valueOf(aHash64(ga)))
              case None => (null, null)
            }
          Row.fromSeq(r.toSeq ++ Seq(d, a))
        }
      }
    }(Encoders.row(schema))
  }

  /** Near-duplicate image pairs (i < j, dHash hamming <= maxHamming)
    * over a BINARY media column. maxHamming <= 3 is complete under the
    * 4-chunk pigeonhole; the classic dup threshold for dHash.
    */
  def imageDupPairs(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3, decoder: MediaDecoder = StubDecoder)
      : DataFrame = {
    val hashes = imageHashes(
      df.select(col(idCol).as("id"), col(binCol)), binCol, decoder)
    graft.operators.Dedup.hammingDupPairs(hashes, "id", "dhash",
      maxHamming)
  }
}
