package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  * Spark 4 made the conversion `private[sql]`; custom expression libraries
  * (this one) need exactly these two calls, so we expose them from within
  * the sql package namespace.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Hadoop Configuration is not Serializable; Spark's wrapper for
    * shipping it to tasks is private[spark], so expose it here for the
    * vecs split reader.
    */
  def serializableConf(conf: org.apache.hadoop.conf.Configuration)
      : java.io.Serializable =
    new org.apache.spark.util.SerializableConfiguration(conf)
  def confOf(s: java.io.Serializable)
      : org.apache.hadoop.conf.Configuration =
    s.asInstanceOf[org.apache.spark.util.SerializableConfiguration].value

  /** Wrap a LogicalPlan as a DataFrame (`Dataset.ofRows` went
    * `private[sql]`): the IndexedKnn payload fetch-back needs to join
    * the probe result against the MATCHED relation, not a re-read.
    */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)

  /** SparkSessionExtensions introspection (`private[sql]` builders) so
    * GraftExtensionsSpec can assert what a `spark.sql.extensions`
    * install would inject without constructing a second SparkContext.
    */
  def extensionOptimizerRules(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      session: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)

  /** Names the extensions would register, resolved through a CLONE of
    * the builtin registry — the session's own registry is untouched.
    */
  def extensionFunctionNames(
      ext: org.apache.spark.sql.SparkSessionExtensions): Seq[String] = {
    val reg = org.apache.spark.sql.catalyst.analysis
      .FunctionRegistry.builtin.clone()
    val before = reg.listFunction().toSet
    ext.registerFunctions(reg)
    reg.listFunction().filterNot(before).map(_.funcName)
  }
}
