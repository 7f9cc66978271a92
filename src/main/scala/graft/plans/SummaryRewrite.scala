package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Alias, AttributeReference, Cast, Coalesce, Expression, Literal,
  NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max, min, sum}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Materialized-rollup aggregate rewrite: queries that group a
  * registered base table by (a subset of) the rollup's dimension
  * columns are transparently re-planned to re-aggregate the rollup
  * instead of scanning the base — the classic OLAP summary-table /
  * materialized-view matching optimization (Calcite-style aggregate
  * matching; the reference's analog is Postgres-side rollup views its
  * README pipelines build over embedding usage), re-expressed as a
  * Catalyst `Rule[LogicalPlan]`.
  *
  * At 100 TB this is the difference between scanning the fact table
  * and scanning a date-grain rollup ~10^5× smaller: the rollup's row
  * count is bounded by dimension cardinality (days × flags), not data
  * volume, so the rewritten plan's cost stays constant as the base
  * grows. Correctness contract (spec-pinned, hash-oracled by
  * q_mv_agg/q_mv_agg_filtered against DuckDB running on the RAW
  * table):
  *
  *  - COUNT(*)/count(1) → coalesce(SUM(cnt), 0)
  *  - SUM(m) and SUM(CAST(m AS DECIMAL)) → CAST(SUM(s_m) AS <orig>)
  *    where s_m is the rollup's exact DECIMAL(38,6) partial sum —
  *    value-identical whenever the base sum is itself exact
  *    (integral doubles, or the decimal-cast spelling every oracled
  *    face already uses; a float-fraction SUM(double) is
  *    order-nondeterministic in ANY distributed plan, so the rewrite
  *    never changes a well-defined result)
  *  - MIN/MAX(m) → MIN(mn_m)/MAX(mx_m)
  *  - grouping keys and filters must reference dimension columns only;
  *    DISTINCT aggregates, filtered aggregates, and anything not in
  *    the table above abort the rewrite (the query runs on the base
  *    unchanged)
  */
object SummaryRewrite {

  case class Entry(summaryDir: String, dims: Seq[String],
      measures: Seq[String])

  private val registry = TrieMap[String, Entry]()

  private def qualify(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.makeQualified(p).toString
  }

  /** The partial-rollup aggregation of `base`: cnt + per-measure exact
    * decimal sum / min / max, one row per dim group. The serve-side
    * rewrite re-aggregates rollup rows with the SAME combiners
    * (SUM of sums, MIN of mins...), so the rollup table may hold
    * MULTIPLE rows per group — which is exactly what makes incremental
    * maintenance trivial: appended batches land as extra partial rows
    * (see [[graft.streaming.SummaryStream]]), no merge step required.
    */
  def partialRollup(base: DataFrame, dims: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs = (count(lit(1)).as("cnt") +:
      measures.flatMap(m => Seq(
        sum(col(m).cast("decimal(38,6)")).as(s"s_$m"),
        min(col(m)).as(s"mn_$m"),
        max(col(m)).as(s"mx_$m"))))
    base.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Build (or rebuild) the rollup parquet for `basePath` grouped by
    * `dims`. Laid out partitioned by `chunk` (the base build is chunk
    * -1; streamed delta batches write chunk=<batchId>) so a streaming
    * replay can overwrite exactly its own partition — idempotent
    * exactly-once maintenance with no read-modify-write.
    */
  def buildSummary(spark: SparkSession, basePath: String,
      summaryDir: String, dims: Seq[String],
      measures: Seq[String]): Unit = {
    partialRollup(spark.read.parquet(basePath), dims, measures)
      .withColumn("chunk", lit(-1L))
      .coalesce(8)
      .write.mode("overwrite").partitionBy("chunk").parquet(summaryDir)
  }

  /** Register `summaryDir` as the rollup of the parquet table at
    * `dataPath`, building it first if absent, and install the rewrite
    * rule. Idempotent; re-registering after a base append without
    * `refresh = true` serves STALE aggregates — freshness is the
    * caller's contract, exactly as with any materialized view.
    */
  def register(spark: SparkSession, dataPath: String, summaryDir: String,
      dims: Seq[String], measures: Seq[String],
      refresh: Boolean = false): Unit = {
    val marker = new org.apache.hadoop.fs.Path(summaryDir, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    val key = qualify(spark, dataPath)
    if (refresh || !fs.exists(marker)) {
      // the rebuild's own aggregate matches this very rule (dims ⊆
      // dims, measure sums), so a registered entry would replan the
      // rebuild onto the STALE rollup it is meant to replace —
      // deregister for the build's duration. Also drop cached file
      // listings: a refresh usually follows a base append, and the
      // shared FileStatusCache would list the pre-append files.
      registry.remove(key)
      spark.catalog.refreshByPath(dataPath)
      buildSummary(spark, dataPath, summaryDir, dims, measures)
      spark.catalog.refreshByPath(summaryDir)
    }
    registry.put(key, Entry(summaryDir, dims, measures))
    ensureRule(spark)
  }

  def unregister(spark: SparkSession, dataPath: String): Unit = {
    registry.remove(qualify(spark, dataPath)); ()
  }

  def clear(): Unit = registry.clear()

  private[plans] def isEmpty: Boolean = registry.isEmpty

  private[plans] def lookup(paths: Seq[String]): Option[Entry] =
    paths.flatMap(registry.get).headOption

  def ensureRule(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(SummaryRewriteRule))
      spark.experimental.extraOptimizations = cur :+ SummaryRewriteRule
  }
}

object SummaryRewriteRule extends Rule[LogicalPlan] {

  import SummaryRewrite._

  /** Latch: optimizing the rollup-scan subplan re-enters the
    * optimizer; the inner pass must not attempt matching.
    */
  private val rewriting = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** Rewrites performed (spec observability). */
  private[plans] val fireCount =
    new java.util.concurrent.atomic.AtomicInteger()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SummaryRewrite.isEmpty || rewriting.get()) plan
    else plan.transformDown {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        try rewrite(agg, groups, aggExprs, child).getOrElse(agg)
        catch {
          case scala.util.control.NonFatal(e) =>
            if (sys.props.contains("graft.mv.debug")) e.printStackTrace()
            agg
        }
    }

  /** Strip Projects and collect Filter conditions down to a bare scan.
    * Projects may carry computed aliases (PullOutGroupingExpressions
    * parks derived group keys like `weekofyear(day) AS
    * _groupingexpression` in a child Project); those are returned as a
    * substitution map so the caller can inline them back and see the
    * expression over relation columns.
    */
  private def unwrap(p: LogicalPlan): Option[(Seq[Expression],
      Map[org.apache.spark.sql.catalyst.expressions.ExprId, Expression],
      LogicalRelation)] = p match {
    case rel: LogicalRelation => Some((Nil, Map.empty, rel))
    case Filter(c, u) =>
      unwrap(u).map { case (cs, subs, r) => (c +: cs, subs, r) }
    case Project(pl, u) if pl.forall(e =>
        e.isInstanceOf[AttributeReference] || e.isInstanceOf[Alias]) =>
      unwrap(u).map { case (cs, subs, r) =>
        val inlined = pl.collect { case al: Alias =>
          al.exprId -> al.child.transformUp {
            case ar: AttributeReference if subs.contains(ar.exprId) =>
              subs(ar.exprId)
          }
        }
        (cs, subs ++ inlined, r)
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate, groups: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      child: LogicalPlan): Option[LogicalPlan] = {
    def dbg(m: => String): Unit =
      if (sys.props.contains("graft.mv.debug"))
        System.err.println(s"[mv-debug] $m")
    val (conds0, subs, rel) = unwrap(child) match {
      case Some(x) => x
      case None => dbg("unwrap failed: " + child.nodeName); return None
    }
    def inline(e: Expression): Expression = e.transformUp {
      case ar: AttributeReference if subs.contains(ar.exprId) =>
        subs(ar.exprId)
    }
    val conds = conds0.map(inline)
    val entry = rel.relation match {
      case fs: HadoopFsRelation =>
        lookup(fs.location.rootPaths.map(_.toString))
      case _ => None
    }
    entry.flatMap { e =>
      val dimSet = e.dims.toSet
      def dimAttr(a: org.apache.spark.sql.catalyst.expressions.Attribute)
          : Boolean =
        dimSet.contains(a.name) && rel.output.exists(_.exprId == a.exprId)
      // grouping keys: expressions over dim attributes only — plain
      // dims, or DERIVED dims (month(day), substr(flag, ...)). A
      // derived key groups the rollup coarser than its grain; the
      // re-aggregation stays exact because every combiner is
      // associative (sum of sums, min of mins), so rollup groups merge
      // exactly as base rows would.
      val groupsI = groups.map(inline)
      if (!groupsI.forall(_.references.forall(dimAttr))) {
        dbg("group not dim-derived: " + groupsI); return None
      }
      // filters: every referenced column must be a dimension
      if (!conds.forall(_.references.forall(dimAttr))) {
        dbg("filter touches non-dim: " + conds); return None
      }

      // the rollup scan subplan (fresh attribute ids)
      val spark = SparkSession.active
      rewriting.set(true)
      val scan = try {
        spark.read.parquet(e.summaryDir).queryExecution.optimizedPlan
      } finally rewriting.set(false)
      def sOut(name: String): AttributeReference =
        scan.output.collectFirst {
          case a: AttributeReference if a.name == name => a
        }.getOrElse(throw new IllegalStateException(
          s"rollup at ${e.summaryDir} lacks column $name"))

      // translate one base-side aggregate call to its rollup re-agg
      def reAgg(ae: AggregateExpression): Option[Expression] = {
        if (ae.isDistinct || ae.filter.isDefined) return None
        def sum2(a: AttributeReference): Expression =
          new Sum(a).toAggregateExpression()
        ae.aggregateFunction match {
          case c: Count if c.children.forall(x =>
              x.foldable && x.eval() != null) =>
            Some(Coalesce(Seq(sum2(sOut("cnt")).asInstanceOf[Expression],
              Literal(0L, LongType))))
          case s: Sum => measureOf(s.child, dimSet, e).map { m =>
            Cast(sum2(sOut(s"s_$m")), ae.dataType)
          }
          case mn: Min => measureOf(mn.child, dimSet, e).map { m =>
            Cast(new Min(sOut(s"mn_$m")).toAggregateExpression(),
              ae.dataType)
          }
          case mx: Max => measureOf(mx.child, dimSet, e).map { m =>
            Cast(new Max(sOut(s"mx_$m")).toAggregateExpression(),
              ae.dataType)
          }
          case _ => None
        }
      }

      // translate every output expression; bail out if any node can't.
      // Manual recursion, NOT transformDown: a transform would descend
      // into the freshly built replacement (whose sum(cnt)/sum(s_m)
      // aggregates are not base measures) and wrongly reject it.
      var ok = true
      def translate(expr: Expression): Expression = expr match {
        case ae: AggregateExpression =>
          reAgg(ae) match {
            case Some(x) => x
            case None => ok = false; ae
          }
        case ar: AttributeReference if dimAttr(ar) =>
          sOut(ar.name)
        case other => other.mapChildren(translate)
      }
      val newAggExprs = aggExprs.map { ne =>
        val translated = ne match {
          case ar: AttributeReference if dimAttr(ar) =>
            Alias(sOut(ar.name), ar.name)(exprId = ar.exprId)
          case ar: AttributeReference if subs.contains(ar.exprId) =>
            Alias(translate(inline(ar)), ar.name)(exprId = ar.exprId)
          case al: Alias =>
            Alias(translate(inline(al.child)), al.name)(exprId = al.exprId)
          case _ => ok = false; ne
        }
        translated
      }
      if (!ok) { dbg("agg expr not translatable: " + aggExprs); return None }
      // a translated tree must reference only rollup attributes
      val scanAttrIds = scan.outputSet
      if (!newAggExprs.forall(_.references.subsetOf(scanAttrIds))) {
        dbg("translated refs escape rollup: " + newAggExprs); return None
      }

      val newGroups = groupsI.map(translate)
      if (!ok) { dbg("group expr not translatable: " + groupsI); return None }
      val newConds = conds.map(_.transformDown {
        case ar: AttributeReference => sOut(ar.name)
      })
      val filtered = newConds.foldLeft(scan)((p, c) => Filter(c, p))
      fireCount.incrementAndGet()
      Some(Aggregate(newGroups, newAggExprs, filtered))
    }
  }

  /** The measure column a base aggregate reads: the bare attribute, or
    * a decimal cast of it (the exact-sum spelling).
    */
  private def measureOf(child: Expression, dims: Set[String],
      e: Entry): Option[String] = {
    val attr = child match {
      case ar: AttributeReference => Some(ar.name)
      case Cast(ar: AttributeReference, _: DecimalType, _, _) =>
        Some(ar.name)
      case _ => None
    }
    attr.filter(e.measures.contains)
  }
}
