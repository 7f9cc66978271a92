package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `hash_embedding(text, dim)` — the deterministic hash bag-of-words
  * embedding as a direct Catalyst expression. Produces bit-identical
  * output to `HashEmbeddingRuntime.embedOne` (it delegates to it) but
  * runs inside the projection with no Row round-trip, which makes
  * embed-everything queries ~2x cheaper than the mapPartitions
  * pipeline path. The pipeline path remains the API-parity surface
  * (batching, usage accounting, pluggable runtimes).
  */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def prettyName: String = "hash_embedding"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_embedding requires STRING, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(graft.embed.HashEmbeddingRuntime
      .embedOne(v.asInstanceOf[UTF8String].toString, dim))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
