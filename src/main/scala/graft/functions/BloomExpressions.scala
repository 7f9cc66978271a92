package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a BROADCAST bloom filter — the runtime
  * row-level-filtering primitive: when one join side's row set is
  * data-sized but its key set summarizes into a few MB of bloom bits,
  * the other side can be pruned to probable matches BEFORE its
  * shuffle. False positives survive the prefilter and are dropped by
  * the exact join that follows, so composed results stay exact.
  *
  * The filter rides as a broadcast reference, not a plan literal —
  * plan size stays independent of the filter's bit count (the same
  * rule PlanSpec enforces for SemDeDup's anchors), and the generated
  * code stays inside whole-stage codegen: one virtual call into the
  * broadcast value per row.
  */
case class BloomMightContain(child: Expression,
    bf: Broadcast[BloomFilter]) extends UnaryExpression {
  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key (hash the value first), " +
          s"got ${t.simpleString}")
    }
  override def nullSafeEval(v: Any): Any =
    bf.value.mightContainLong(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("graftBloomBc", bf,
        "org.apache.spark.broadcast.Broadcast")
      s"${ev.value} = ((org.apache.spark.util.sketch.BloomFilter) " +
        s"$ref.value()).mightContainLong($c);"
    })
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object BloomFunctions {

  /** Distributed build of a bloom filter over a BIGINT key column;
    * returned broadcast so probes ship once per executor. Size is set
    * by (expectedItems, fpp) — parameters, not data — so the driver
    * holds a bounded sketch, never the key set.
    */
  def build(df: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Broadcast[BloomFilter] = {
    val bf = df.stat.bloomFilter(keyCol, math.max(expectedItems, 1L), fpp)
    df.sparkSession.sparkContext.broadcast(bf)
  }

  def mightContain(key: Column, bf: Broadcast[BloomFilter]): Column =
    VectorFunctions.col(BloomMightContain(VectorFunctions.expr(key), bf))
}
