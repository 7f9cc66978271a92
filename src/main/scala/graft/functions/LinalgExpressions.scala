package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense linear-algebra projections over embedding columns — the
  * per-row map side of PCA and Johnson–Lindenstrauss reduction. Both
  * are pure projections: zero shuffle, the small matrix rides inside
  * the expression (broadcast with the serialized plan), and codegen
  * delegates through [[EvalDelegatingCodegen]] so the surrounding
  * scan/filter stage stays whole-stage compiled.
  */

/** y = M (x - center): coordinates of `child` in a k x d row basis.
  * Model arrays are IndexedSeq so structural equality (and therefore
  * Catalyst semanticEquals / subexpression elimination) works.
  */
case class MatVecProject(
    child: Expression,
    center: IndexedSeq[Double],
    matrix: IndexedSeq[IndexedSeq[Double]])
  extends UnaryExpression with EvalDelegatingCodegen {

  override def prettyName: String = "matvec_project"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  private lazy val isF64: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private lazy val c: Array[Double] = center.toArray
  private lazy val m: Array[Array[Double]] = matrix.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (matrix.exists(_.length != center.length))
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: matrix rows must have length ${center.length}")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got " +
        t.simpleString)
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val d = math.min(a.numElements(), c.length)
    val x = new Array[Double](d)
    var j = 0
    while (j < d) {
      val raw = if (isF64) a.getDouble(j) else a.getFloat(j).toDouble
      x(j) = raw - c(j)
      j += 1
    }
    val out = new Array[Double](m.length)
    var r = 0
    while (r < m.length) {
      val row = m(r)
      var acc = 0.0
      j = 0
      while (j < d) { acc += row(j) * x(j); j += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    delegatedGenCode(ctx, ev)
  override protected def withNewChildInternal(c2: Expression): Expression =
    copy(child = c2)
}

/** Seeded Achlioptas sparse random projection (Johnson–Lindenstrauss):
  * y_c = sqrt(3/k) * sum_j r(c,j) * x_j with r(c,j) in {+1, 0, -1}
  * at probabilities {~1/6, ~2/3, ~1/6}, decided by the SQL-portable
  * integer mixer h = v^3 mod 101 mod 6 over v = (c+1)*12345 + (j+1)
  * (0 -> +1, 1 -> -1, else 0). Cubing is a bijection mod 101 (3 is
  * coprime to 100), so consecutive v walk a pseudo-random permutation
  * — unlike a linear-congruential mod 6, whose sign would depend only
  * on (c+j) mod 6 and make every row a shift of one 6-periodic
  * pattern (measured: distance-ratio median 0.70 vs 0.94 for this
  * mixer on the test embeddings). The matrix is never materialized —
  * each output cell derives its signs from the hash — so the
  * projection is a pure stateless map any engine reproduces exactly:
  * the oracle restates the same hash and the same index-ordered fold
  * in SQL. v^3 stays below 2^63 for k <= 128 at any practical d,
  * enforced at analysis (DuckDB BIGINT overflow would error, not
  * wrap).
  *
  * Why it matters at 100 TB: JL reduction cuts per-vector bytes
  * k/d-fold ahead of LSH bucketing / coarse clustering while
  * preserving pairwise distances within (1 +- eps), and needs no
  * training pass at all — the data-independent sibling of [[
  * graft.operators.Pca]] (reference capability analog: the
  * quantization family of `lantern_extras/src/pq.rs`, which also
  * trades precision for bytes ahead of search).
  */
case class RandomProject(child: Expression, k: Int)
  extends UnaryExpression with EvalDelegatingCodegen {

  override def prettyName: String = "rand_project"
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  private lazy val isF64: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private lazy val scale: Double = math.sqrt(3.0 / k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (k < 1 || k > 128) TypeCheckResult.TypeCheckFailure(
        s"$prettyName: k must be in [1, 128], got $k")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got " +
        t.simpleString)
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val d = a.numElements()
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      var j = 0
      while (j < d) {
        val v = (c + 1).toLong * 12345L + (j + 1).toLong
        val h = (v * v * v) % 101L % 6L
        val s = if (h == 0L) 1.0 else if (h == 1L) -1.0 else 0.0
        val x = if (isF64) a.getDouble(j) else a.getFloat(j).toDouble
        // x * s (not a skip): the fold adds every term exactly as the
        // SQL restatement's list_sum does, signed zeros included
        acc += x * s
        j += 1
      }
      out(c) = scale * acc
      c += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    delegatedGenCode(ctx, ev)
  override protected def withNewChildInternal(c2: Expression): Expression =
    copy(child = c2)
}
