package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join: all ordered pairs (a, b) on the same key with
  * 0 < b.ts - a.ts <= window. A naive formulation is a key-equi join
  * with a range predicate — Spark plans the predicate as a post-join
  * filter, so a hot key degenerates to its full O(n²) cross product.
  *
  * The scalable shape is bucket banding: quantize time into
  * window-sized buckets, replicate the PROBE side into the two buckets
  * it can possibly match (its own and the previous one), and equi-join
  * on (key, bucket). Every candidate pair is produced exactly once
  * (each a-row has one bucket; the b-row probe that hits it is unique),
  * the join is a plain hash/sort-merge equi-join Catalyst can shuffle,
  * broadcast, or AQE-skew-split, and per-task work is bounded by bucket
  * density, not key cardinality.
  */
object RangeJoin {

  /** Pairs (idCol_a, idCol_b, gap_us) with 0 < b.ts - a.ts <= windowUs.
    * Left/build side `a` and probe side `b` may be different filtered
    * views of the same table.
    */
  def pairsWithin(a: DataFrame, b: DataFrame, keyCol: String,
      tsCol: String, idCol: String, windowUs: Long): DataFrame = {
    val au = a.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("a_us"),
      col(idCol).as("i"))
      .withColumn("bkt", expr(s"a_us div ${windowUs}L"))
    val bu = b.select(col(keyCol).as("k"), unix_micros(col(tsCol)).as("b_us"),
      col(idCol).as("j"))
      .withColumn("bkt", explode(array(
        expr(s"b_us div ${windowUs}L"), expr(s"b_us div ${windowUs}L - 1"))))
    au.join(bu, Seq("k", "bkt"))
      .where(col("b_us") > col("a_us") &&
        col("b_us") - col("a_us") <= windowUs)
      .select(col("i"), col("j"), (col("b_us") - col("a_us")).as("gap_us"))
  }
}
