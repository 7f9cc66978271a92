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
  * "analyze q_asof_join" failing. Analysis only (`queryExecution
  * .analyzed`) — no jobs are triggered by the check itself; a handful
  * of composite entries run bounded driver-side work while CONSTRUCTING
  * their DataFrame (sketch candidate passes, k-means fits), which
  * sf0.001 keeps to seconds.
  */
class RegistrySmokeSpec extends SparkSuite {
  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"analyze $name") {
      val df = fn(spark, sf0001)
      assert(df.queryExecution.analyzed != null)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
    }
  }
}
