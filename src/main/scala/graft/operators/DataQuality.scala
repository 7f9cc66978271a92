package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality gates for large-scale pipelines: column profiling and
  * declarative constraint validation — the pre-flight check a 100 TB
  * ingest runs before anything downstream trusts the data (the shape
  * popularized by AWS Deequ / Great Expectations, re-expressed as
  * plain Spark aggregates so the metrics are engine-checkable).
  *
  * Reference scope: lantern_extras has no profiling surface; this
  * extends the engine's pipeline family (quality scoring, adaptive
  * gates) from per-document heuristics to per-dataset contracts.
  *
  * Scale shape: every row-local check folds into ONE aggregate pass
  * over the table (a single scan regardless of check count);
  * uniqueness adds one groupBy shuffle per key set and referential
  * checks one anti-join each (the dim side is distinct-ed and left to
  * Catalyst/AQE to broadcast when small). Nothing collects to the
  * driver; results are one tiny row per check.
  */
object DataQuality {

  /** A declarative constraint. `name` keys the result row. */
  sealed trait Check { def name: String }

  /** Column must be non-null on every row. */
  final case class NotNull(column: String) extends Check {
    val name = s"not_null($column)"
  }

  /** The key formed by `columns` must identify at most one row; a
    * violation counts every ROW that shares its key with another.
    */
  final case class Unique(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "Unique needs at least one column")
    val name = s"unique(${columns.mkString(",")})"
  }

  /** Every row must satisfy `predicateSql` (a boolean SQL
    * expression over the table's columns). A NULL predicate result
    * counts as a violation — contracts are strict.
    */
  final case class Satisfies(label: String, predicateSql: String)
      extends Check {
    val name = s"satisfies($label)"
  }

  /** Column values must come from the fixed `values` set (NULLs
    * violate; pair with [[NotNull]] semantics by construction).
    */
  final case class InSet(column: String, values: Seq[String])
      extends Check {
    require(values.nonEmpty, "InSet needs at least one value")
    val name = s"in_set($column)"
  }

  /** Non-null values of `column` must exist in `dim.dimColumn` —
    * referential integrity into a dimension.
    */
  final case class RefIn(column: String, dim: DataFrame,
      dimColumn: String) extends Check {
    val name = s"ref_in($column)"
  }

  /** Evaluate `checks` against `df`. Returns one row per check:
    * (check_name, total, violations, pass), `pass` = zero
    * violations. Row-local checks (NotNull / Satisfies / InSet)
    * share a single aggregate scan; each Unique adds one groupBy and
    * each RefIn one left join against the distinct dim keys — both
    * compute total and violations in the SAME pass, so no check ever
    * costs a second COUNT(*) scan of the fact table.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "check names must be unique")
    val spark = df.sparkSession
    def violatedExpr(c: Check): Option[(String, org.apache.spark.sql.Column)] =
      c match {
        case NotNull(column) => Some(c.name -> col(column).isNull)
        case Satisfies(_, p) =>
          Some(c.name -> !coalesce(expr(p), lit(false)))
        case InSet(column, vs) =>
          Some(c.name ->
            !coalesce(col(column).isin(vs: _*), lit(false)))
        case _ => None
      }
    val rowChecks = checks.flatMap(violatedExpr)
    val rowResults: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        // one scan: count(*) plus one conditional sum per check
        val aggs = count(lit(1)).as("_total") +:
          rowChecks.zipWithIndex.map { case ((_, v), i) =>
            sum(when(v, 1L).otherwise(0L)).as(s"_v$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(one.select(explode(array(
            rowChecks.zipWithIndex.map { case ((n, _), i) =>
              struct(lit(n).as("check_name"), col("_total").as("total"),
                coalesce(col(s"_v$i"), lit(0L)).as("violations"))
            }: _*)).as("r"))
          .select(col("r.*")))
      }
    // structural checks derive total AND violations from one pass —
    // never a second COUNT(*) scan of the fact table
    val otherResults: Seq[DataFrame] = checks.collect {
      case u @ Unique(cols) =>
        // total = Σ group sizes; violations = Σ sizes of groups > 1
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
          .groupBy().agg(
            coalesce(sum(col("c")), lit(0L)).as("total"),
            coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
              .as("violations"))
          .select(lit(u.name).as("check_name"), col("total"),
            col("violations"))
      case r @ RefIn(column, dim, dimColumn) =>
        // left join against the distinct (broadcast-ready) dim keys,
        // then count rows and non-null misses in the same aggregate
        val dimKeys = dim.select(col(dimColumn).as("_k")).distinct()
          .withColumn("_hit", lit(1))
        df.select(col(column).as("_k"))
          .join(dimKeys, Seq("_k"), "left")
          .groupBy().agg(count(lit(1)).as("total"),
            coalesce(sum(when(col("_k").isNotNull && col("_hit").isNull,
              1L).otherwise(0L)), lit(0L)).as("violations"))
          .select(lit(r.name).as("check_name"), col("total"),
            col("violations"))
    }
    val all = (rowResults.toSeq ++ otherResults).reduce(_ union _)
    all.select(col("check_name"), col("total"), col("violations"),
      (col("violations") === 0L).as("pass"))
  }

  /** Per-column profile of `columns` in one aggregate pass:
    * (col_name, n_rows, n_nulls, n_distinct, min_str, max_str) with
    * min/max cast to string so heterogeneous column types share one
    * schema. `approxDistinct` swaps exact COUNT(DISTINCT) (an
    * Expand-based plan — one shuffle carrying k copies of the scan)
    * for HLL approx_count_distinct — the 100 TB default; exact is
    * kept for oracle-checkable profiles. Avoid float columns when
    * string-hashing profiles across engines (formatting differs).
    */
  def profile(df: DataFrame, columns: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    require(columns.distinct.size == columns.size,
      s"duplicate columns: ${columns.diff(columns.distinct).mkString(", ")}")
    val aggs = count(lit(1)).as("_n") +: columns.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(columns.map { c =>
        struct(lit(c).as("col_name"), col("_n").as("n_rows"),
          (col("_n") - col(s"_nn_$c")).as("n_nulls"),
          col(s"_nd_$c").as("n_distinct"),
          col(s"_mn_$c").as("min_str"), col(s"_mx_$c").as("max_str"))
      }: _*)).as("p"))
      .select(col("p.*"))
  }
}
