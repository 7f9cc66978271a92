package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Partitioning hygiene shared by the corpus operators. */
private[graft] object Repartitioning {

  // scan-only plans: projections/filters/aliases over a leaf relation
  private def shuffleFree(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode => true
    case p: Project => shuffleFree(p.child)
    case f: Filter => shuffleFree(f.child)
    case s: SubqueryAlias => shuffleFree(s.child)
    case _ => false
  }

  /** Spread a small scan across cores. A one-file parquet input
    * arrives as a single partition, which would serialize any
    * per-row-expensive downstream stage on one core. Only scan-shaped
    * plans are probed: `Dataset.rdd` under AQE executes upstream
    * shuffle stages just to expose partitioning, and any plan WITH a
    * shuffle already has `spark.sql.shuffle.partitions` partitions —
    * repartitioning it would only add cost. At scale the scan has
    * >= cores partitions and this is a no-op.
    */
  def spreadSmallScan(df: DataFrame): DataFrame = {
    if (!shuffleFree(df.queryExecution.analyzed)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
