package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for the 100 TB posture:
  *
  *  - `saltedJoin`: equi-join where one side has heavy key skew. The
  *    skewed (big) side gets a random salt in [0, salts); the small
  *    side is exploded across all salt values; joining on (key, salt)
  *    spreads a hot key over `salts` tasks. Semantically identical to
  *    the plain join.
  *  - Bucketing: co-located joins come from writing both sides with
  *    `bucketBy` on the join key (see ScaleJoinsSpec — Spark then
  *    plans a SortMergeJoin with NO Exchange on either side). That is
  *    a write-time layout choice, not an operator, so only the spec
  *    demonstrates it.
  *
  * AQE (enabled in GraftSession) already handles moderate skew via
  * skew-join splitting; saltedJoin is for the pathological keys AQE's
  * per-partition thresholds miss.
  */
object ScaleJoins {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // right/full outer would duplicate unmatched small-side rows
    // (the small side is replicated per salt)
    require(Set("inner", "left", "left_outer", "leftouter")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(key) === saltedSmall(key) &&
          saltedBig("__salt") === saltedSmall("__salt"), joinType)
      .drop(saltedSmall(key))
      .drop("__salt")
  }
}
