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
}
