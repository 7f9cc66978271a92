package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count–min sketch (Cormode–Muthukrishnan 2005) over integer keys —
  * the POINT-FREQUENCY sketch completing the rollup's mergeable-sketch
  * family: HLL answers "how many distinct", Misra–Gries "which items
  * are frequent", KMV "how much do two sets overlap", the histogram /
  * HDR pair "what is the quantile" — CMS answers "how often does THIS
  * key occur" for any key, in d·w longs per group, with one-sided
  * error: estimate >= true count always, and exceeds it by more than
  * 2N/w with probability at most 2^-d.
  *
  * The d hash rows use affine hashes modulo the Mersenne prime
  * 2^31-1 with FIXED published constants:
  *
  *   slot_r(x) = ((A_r * ((x mod P + P) mod P) + B_r) mod P) mod w
  *
  * — pairwise-independent per row (Carter–Wegman), and every operand
  * stays below 2^62, so the arithmetic is exact BIGINT in any engine:
  * the DuckDB oracle restates the registers and the min-over-rows
  * estimate bit for bit, the same oracle-able-approximation stance as
  * [[HllSketch]]/[[Hdr]]. Registers live in a dense d·w long array
  * (row-major), so partials merge by elementwise sum — the
  * associative rollup-combiner contract — and persisted sketches fold
  * with [[HistMerge]], making CMS a valid rollup measure
  * ([[graft.plans.SummaryRewrite.CmsSpec]]): per-day / per-source
  * frequency sketches over a 100 TB corpus are persisted at dim
  * cardinality and any key's frequency in any dim slice is served
  * without touching the fact table.
  */
object Cms {
  /** 2^31 - 1, the Mersenne prime classically used for Carter–Wegman
    * affine hashing: products of two sub-2^31 operands stay below
    * 2^62, exact in 64-bit integers everywhere.
    */
  val P: Long = 2147483647L

  /** Fixed per-row hash constants (a_r in [1, P), b_r in [0, P)) —
    * published so the DuckDB restatement and any later reader agree.
    * Depth is capped at the constants available.
    */
  val A: Array[Long] = Array(1103515245L, 1679979167L, 1534285569L,
    987654321L, 1412316763L, 1862270413L)
  val B: Array[Long] = Array(12345L, 1013904223L, 998244353L,
    543219876L, 777767777L, 321456987L)

  val maxDepth: Int = A.length

  /** Row-r slot for key x — pure integer ops, the public contract the
    * oracle mirrors token for token.
    */
  def slot(x: Long, r: Int, w: Int): Int = {
    val xm = ((x % P) + P) % P
    (((A(r) * xm + B(r)) % P) % w).toInt
  }

  /** Point estimate: min over rows of the key's register. */
  def estimate(counts: Array[Long], x: Long, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = counts(r * w + slot(x, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }
}

/** `cms_sketch(x, d, w)` — aggregate over integral keys returning the
  * d·w count-min registers as ARRAY<BIGINT> (row-major). Nulls are
  * skipped.
  */
case class CmsSketch(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= Cms.maxDepth,
    s"depth d must be in [1, ${Cms.maxDepth}], got $d")
  require(w >= 2 && w <= (1 << 20),
    s"width w must be in [2, 2^20], got $w")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral key, got ${other.simpleString}")
    }

  @transient private lazy val toLong: Any => Long =
    child.dataType match {
      case ByteType => v => v.asInstanceOf[Byte].toLong
      case ShortType => v => v.asInstanceOf[Short].toLong
      case IntegerType => v => v.asInstanceOf[Int].toLong
      case LongType => v => v.asInstanceOf[Long]
      case other => throw new IllegalStateException(
        s"unreachable: checkInputDataTypes admitted $other")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = toLong(v)
      var r = 0
      while (r < d) { buf(r * w + Cms.slot(x, r, w)) += 1L; r += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < b1.length) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var j = 0
    while (j < buf.length) { bb.putLong(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var j = 0
    while (j < buf.length) { buf(j) = bb.getLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "cms_sketch"
}

/** `cms_estimate(counts, x, d, w)` — scalar companion reading the
  * min-over-rows point estimate for key x off registers from
  * [[CmsSketch]] or a [[HistMerge]] fold. Null if either side is
  * null. Delegated codegen (the [[KmvIntersect]] binary stance) keeps
  * containing stages whole-stage compiled.
  */
case class CmsEstimate(left: Expression, right: Expression, d: Int,
    w: Int)
    extends BinaryExpression {
  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _),
          ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT> counts, integral key), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  @transient private lazy val keyToLong: Any => Long =
    right.dataType match {
      case ByteType => v => v.asInstanceOf[Byte].toLong
      case ShortType => v => v.asInstanceOf[Short].toLong
      case IntegerType => v => v.asInstanceOf[Int].toLong
      case LongType => v => v.asInstanceOf[Long]
      case other => throw new IllegalStateException(
        s"unreachable: checkInputDataTypes admitted $other")
    }

  /** Public bridge for the generated call. */
  final def compute(cv: Any, kv: Any): Long = {
    val counts = cv.asInstanceOf[ArrayData].toLongArray()
    require(counts.length == d * w,
      s"$prettyName: register array length ${counts.length} does not " +
        s"match d*w = ${d * w}")
    Cms.estimate(counts, keyToLong(kv), d, w)
  }

  override protected def nullSafeEval(cv: Any, kv: Any): Any =
    compute(cv, kv)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ref = ctx.addReferenceObj("graftCms", this)
      s"${ev.value} = $ref.compute($a, $b);"
    })

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CmsEstimate = copy(left = l, right = r)
}
