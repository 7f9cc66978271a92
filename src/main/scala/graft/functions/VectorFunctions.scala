package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType}

import graft.operators.MgSketch

/** Column-level API over the Catalyst vector expressions, mirroring the
  * reference's SQL surface (`l2sq_dist`, `cos_dist`, `hamming_dist` and
  * the `<->`/`<=>`/`<+>` operators listed in
  * `/root/reference/lantern_cli/src/external_index/cli.rs:97-123`).
  */
object VectorFunctions {
  private[graft] def col(e: Expression): Column =
    org.apache.spark.sql.graftshim.GraftShims.column(e)
  private[graft] def expr(c: Column): Expression =
    org.apache.spark.sql.graftshim.GraftShims.expression(c)

  /** Cast to ARRAY<FLOAT> so integer/double array literals are accepted;
    * a float→float cast is eliminated by Catalyst's SimplifyCasts.
    */
  private def f(c: Column): Expression = Cast(expr(c), ArrayType(FloatType))
  private def i(c: Column): Expression = Cast(expr(c), ArrayType(IntegerType))

  def l2sq_dist(a: Column, b: Column): Column = col(L2SqDistance(f(a), f(b)))
  def cos_dist(a: Column, b: Column): Column = col(CosineDistance(f(a), f(b)))
  def inner_product(a: Column, b: Column): Column =
    col(InnerProduct(f(a), f(b)))
  def l1_dist(a: Column, b: Column): Column = col(L1Distance(f(a), f(b)))
  def hamming_dist(a: Column, b: Column): Column =
    col(HammingDistance(i(a), i(b)))
  def vector_norm(a: Column): Column = col(VectorNorm(f(a)))
  def vector_normalize(a: Column): Column = col(NormalizeVector(f(a)))
  def bq_encode(a: Column): Column = col(BqEncode(f(a)))
  def bq_hamming(a: Column, b: Column): Column =
    col(BqHamming(expr(a), expr(b)))

  /** Register all functions for SQL use (`SELECT l2sq_dist(a, b) ...`). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    def cf(e: Expression): Expression = Cast(e, ArrayType(FloatType))
    def ci(e: Expression): Expression = Cast(e, ArrayType(IntegerType))
    one("l2sq_dist", e => L2SqDistance(cf(e(0)), cf(e(1))))
    one("cos_dist", e => CosineDistance(cf(e(0)), cf(e(1))))
    one("inner_product", e => InnerProduct(cf(e(0)), cf(e(1))))
    one("l1_dist", e => L1Distance(cf(e(0)), cf(e(1))))
    one("hamming_dist", e => HammingDistance(ci(e(0)), ci(e(1))))
    one("vector_norm", e => VectorNorm(cf(e.head)))
    one("vector_normalize", e => NormalizeVector(cf(e.head)))
    one("bq_encode", e => BqEncode(cf(e.head)))
    one("bq_hamming", e => BqHamming(e(0), e(1)))
    // Misra–Gries frequent-items aggregates (ResolveFunctions wraps a
    // returned AggregateFunction in its AggregateExpression). k and
    // capacity parameterize the sketch itself, so they must be literals.
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an INT literal, got: ${other.sql}")
    }
    one("mg_sketch", e => MgSketch(e(0), lit(e(1), "capacity")))
    one("sketch_topk", e => MgSketch(e(0), lit(e(2), "capacity"),
      topK = Some(lit(e(1), "k"))))
    // bounded top-k-by-score aggregate on the SQL surface: per group,
    // the k (id, score) pairs with the smallest scores, map-side
    // bounded — the SQL spelling of the kNN result aggregation, usable
    // for any "cheapest k per group" without a window sort. The
    // buffer is (double, long) typed, so inputs are cast up front.
    one("topk_by_score", e =>
      graft.operators.TopKByScore(
        Cast(e(0), org.apache.spark.sql.types.DoubleType),
        Cast(e(1), org.apache.spark.sql.types.LongType),
        lit(e(2), "k")))
  }
}
