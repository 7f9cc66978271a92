package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Registry-wide analysis smoke: every `SparkEntry.queries` entry must
  * BUILD and ANALYZE against the current testdata. This is the
  * minutes-not-round-end tripwire for environment drift — when a
  * regenerated table changes schema (as events.ts did between rounds 7
  * and 8: TIMESTAMP(NANOS) → TIMESTAMP_MICROS), the failure surfaces
  * here with the query's name instead of as silently missing rows in
  * the driver's correctness artifact.
  *
  * One ScalaTest test per registry entry, so a drift report reads as
  * "analyze q_asof_join" failing. Planning only (`queryExecution
  * .sparkPlan`) — no jobs are triggered by the check itself; a handful
  * of composite entries run bounded driver-side work while CONSTRUCTING
  * their DataFrame (sketch candidate passes, k-means fits), which
  * sf0.001 keeps to seconds.
  *
  * Beyond analysis, every face's STATIC physical plan is swept for
  * scale tripwires:
  *   - no `CartesianProductExec` anywhere (an unconditioned shuffled
  *     join is never the intended plan — crossJoin against a
  *     broadcast side plans as BroadcastNestedLoopJoin and stays
  *     allowed);
  *   - every broadcast()-hinted join must actually PLAN as a
  *     broadcast join (a silently dropped hint means the pinned scan
  *     path regressed to a shuffle);
  *   - every parquet scan must prune: reading EVERY column of a wide
  *     (> 8 col) source is the read-amplification smell — no current
  *     face needs one.
  * Runtime AQE re-plans (the r11 triangles sort-merge flip) cannot be
  * seen in a static plan; those stay pinned by the executed-plan
  * census tests (GraphOpsSpec, PlanSpec) on the pinned faces.
  */
class RegistrySmokeSpec extends SparkSuite {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.FileSourceScanExec
  import org.apache.spark.sql.execution.joins.{
    BroadcastHashJoinExec, BroadcastNestedLoopJoinExec,
    CartesianProductExec}
  import org.apache.spark.sql.catalyst.plans.logical.Join
  import org.apache.spark.sql.catalyst.plans.logical.{
    HintInfo, BROADCAST}

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"analyze $name") {
      val df = fn(spark, sf0001)
      assert(df.queryExecution.analyzed != null)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")

      val plan: SparkPlan = df.queryExecution.sparkPlan
      val all = plan.collect { case p => p }

      val cart = all.collect { case c: CartesianProductExec => c }
      assert(cart.isEmpty,
        s"$name: CartesianProduct in the physical plan — an " +
          s"unconditioned shuffled join never survives scale")

      // every author-pinned broadcast must be honored by the planner
      val hintedJoins = df.queryExecution.optimizedPlan
        .collectWithSubqueries {
          case j: Join if Seq(j.hint.leftHint, j.hint.rightHint)
            .flatten.exists(_.strategy.contains(BROADCAST)) => j
        }
      if (hintedJoins.nonEmpty) {
        val broadcastJoins = all.collect {
          case b: BroadcastHashJoinExec => b
          case b: BroadcastNestedLoopJoinExec => b
        }
        assert(broadcastJoins.size >= hintedJoins.size,
          s"$name: ${hintedJoins.size} broadcast-hinted join(s) but " +
            s"only ${broadcastJoins.size} planned as broadcast — a " +
            s"pinned hint was dropped")
      }

      // scan pruning: a face reading EVERY column of a wide source
      // is the read-amplification smell at 100 TB
      all.collect { case s: FileSourceScanExec => s }.foreach { s =>
        val tableWidth = s.relation.dataSchema.size
        val readWidth = s.requiredSchema.size
        assert(tableWidth <= 8 || readWidth < tableWidth,
          s"$name: scan of ${s.relation.location.rootPaths.headOption
            .getOrElse("?")} reads all $tableWidth columns")
      }
    }
  }
}
