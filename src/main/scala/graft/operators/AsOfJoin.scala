package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single right row with
  * the greatest timestamp <= the left row's timestamp, per key. Spark
  * has no native as-of operator; the idiomatic distributed shape is a
  * union + one window pass:
  *
  *   union(left, right) → shuffle by key → sort by (ts, side, tie)
  *   → last_value(right payload, ignoreNulls) carries the most recent
  *     right row forward into every subsequent left row.
  *
  * That is exactly the per-key merge a dedicated as-of join performs,
  * expressed with operators Catalyst already knows how to plan: ONE
  * exchange on the key, ONE sort — the same cost as the sort-merge join
  * it replaces, with no range-explosion. Both inputs stream through the
  * window; nothing is collected.
  *
  * Semantics: inclusive (right.ts == left.ts matches; right rows sort
  * before left rows at equal ts). Right rows should be unique per
  * (key, ts) — pre-aggregate if not, or ties resolve by the optional
  * `tieBreak` column (largest wins, matching "latest write").
  */
object AsOfJoin {

  /** @param rightCols right-side payload columns carried to the output
    *                   (emitted as-is, null when no match)
    * @param tieBreak   right-side column ordering equal-ts right rows
    *                   (the largest value wins)
    * @param toleranceUs max left.ts - right.ts in microseconds; older
    *                   matches become null (no-match), like pandas
    *                   merge_asof's `tolerance`
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightCols: Seq[String],
      tieBreak: Option[String] = None,
      toleranceUs: Option[Long] = None): DataFrame = {
    val payload = struct(
      (col(tsCol).as("_rts") +: rightCols.map(col)): _*)
    val rightU = right.select(
      col(keyCol) +: col(tsCol) +: lit(0).as("_side") +:
        tieBreak.map(col).getOrElse(lit(0L)).as("_tie") +:
        payload.as("_asof") +: Nil: _*)
    val leftU = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(0L))
      .withColumn("_asof", lit(null).cast(rightU.schema("_asof").dataType))
    // right rows first at equal ts (inclusive), larger tieBreak later so
    // last_value picks it
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("_asof"), ignoreNulls = true).over(w)
    val matched = toleranceUs match {
      case Some(tol) => when(
        unix_micros(col(tsCol)) - unix_micros(matchedRaw("_rts")) <= tol,
        matchedRaw)
      case None => matchedRaw
    }
    val out = leftU.unionByName(rightU, allowMissingColumns = true)
      .withColumn("_m", matched)
      .where(col("_side") === 1)
    val leftOut = left.columns.map(col)
    val rightOut = col("_m")("_rts").as("asof_ts") +:
      rightCols.map(c => col("_m")(c).as(c))
    out.select((leftOut ++ rightOut).toIndexedSeq: _*)
  }
}
