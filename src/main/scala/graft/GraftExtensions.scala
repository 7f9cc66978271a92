package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Cluster-deployment entry point: install every graft SQL expression
  * and the planner-transparent ANN rule on a STOCK Spark distribution
  * with one configuration line —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions \
  *   --jars graft.jar ...
  * }}}
  *
  * — no driver-side `GraftSession.register` call required, which is
  * what makes the library usable from SQL-only surfaces (Thrift
  * server, notebooks with a managed session, `spark-sql`). The same
  * (name → builder) tables back `GraftSession.register`, so the two
  * installation paths can never drift.
  *
  * Scope: every expression-backed function (distances, BQ, hashes,
  * sketch aggregates) plus [[graft.plans.IndexedKnnRule]] and
  * [[graft.plans.SummaryRewriteRule]] (both rules are no-ops until a
  * table is registered, so injecting them unconditionally costs
  * nothing). The model-registry-backed UDFs (`text_embedding`,
  * `clip_text`) stay on `GraftSession.register` — they close over
  * runtime state that a config-line install has no way to construct.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.IndexedKnnRule)
    ext.injectOptimizerRule(_ => graft.plans.SummaryRewriteRule)
    (graft.functions.VectorFunctions.builders ++
        graft.functions.TextFunctions.builders).foreach {
      case (name, builder) =>
        ext.injectFunction((FunctionIdentifier(name),
          new ExpressionInfo("graft", name), builder))
    }
  }
}
