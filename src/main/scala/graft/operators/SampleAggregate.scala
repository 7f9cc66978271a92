package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KMV-style BOTTOM-k uniform row sample (Cohen & Kaplan, PODC 2007
  * "Summarizing data using bottom-k sketches"): the k rows whose KEY
  * hashes are smallest, each carrying one VALUE — the distribution
  * sketch the fixed-bin histogram ([[Hist]]) cannot be: range-free
  * (no declared [lo, hi)), and its quantile read is an actual data
  * value, not a bin interpolation.
  *
  * Where [[Kmv]] keeps the k smallest hashes of a key set (a distinct
  * sketch), this keeps (hash(id), value) PAIRS for a unique row id —
  * a uniform sample of ROWS, because a 64-bit avalanche hash of a
  * unique id is a uniform permutation of the rows. The properties the
  * rollup family needs all follow:
  *
  *  - merge(A, B) = k smallest-by-hash of A ∪ B (equal hashes combine
  *    by MIN value) — associative, commutative, idempotent, so sample
  *    columns ride in [[graft.plans.SummaryRewrite]] rollups and fold
  *    per chunk exactly like HLL registers and KMV arrays, and any
  *    partitioning / chunk order yields the IDENTICAL sketch;
  *  - the sample membership is a pure function of the id hashes, so
  *    unlike reservoir sampling the sketch is DETERMINISTIC: both the
  *    unsaturated regime (sample = all rows) and the saturated one
  *    (sample = the k hash-smallest rows) are restatable in plain SQL
  *    and hash-oracled bit for bit — a stronger gate than the HLL /
  *    histogram faces, whose estimators are only exact-regime-oracled;
  *  - quantile(q) = the lower order statistic of the sample's values:
  *    sort ascending, take index floor(q * (m-1)). Exact below
  *    saturation; at saturation it is the classic bottom-k estimator
  *    with error O(1/sqrt(k)) independent of data size — k longs +
  *    k doubles per group answer "p99 latency per region" over a
  *    100 TB fact table.
  *
  * Hashing reuses [[Hll.hash64]] on the same key typing as HLL / KMV
  * (integral value, FNV-1a for strings), so the DuckDB oracle
  * restates membership with the same HUGEINT pipeline as the HLL
  * faces. Two ids colliding on 64 bits would merge (keeping the
  * smaller value) — the standard vanishing-probability caveat, made
  * deterministic so both engines agree even then.
  *
  * Reference tie-in: the reference exposes only exact aggregate reads
  * (lantern_extras' SQL surface); the sketch family is the
  * beyond-reference 100 TB path, sibling to `hll_*` / `kmv_*` /
  * `hist_*`.
  */
object Smp {
  final val MaxK = 1 << 20

  /** Sketch wire/SQL shape: hashes (sorted unsigned ascending) zipped
    * with their row values.
    */
  val dataType: StructType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("vs", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  def newBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double](Kmv.cmp)

  /** Insert (h, v) keeping the k smallest-by-unsigned-hash entries;
    * equal hashes combine by MIN value (order-independent, and what
    * the oracle's `min(val) GROUP BY hash` restates).
    */
  def put(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      k: Int, h: Long, v: Double): Unit = {
    val key = java.lang.Long.valueOf(h)
    val existing = buf.get(key)
    if (existing != null) {
      if (v < existing.doubleValue()) buf.put(key, v)
    } else if (buf.size < k ||
        java.lang.Long.compareUnsigned(h, buf.lastKey()) < 0) {
      buf.put(key, v)
      if (buf.size > k) buf.pollLastEntry()
    }
  }

  def mergeInto(b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
      b2: java.util.TreeMap[java.lang.Long, java.lang.Double],
      k: Int): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      put(b1, k, e.getKey.longValue(), e.getValue.doubleValue())
    }
    b1
  }

  def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey.longValue()); bb.putDouble(e.getValue.doubleValue())
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte])
      : java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val out = newBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) out.put(bb.getLong, bb.getDouble)
    out
  }

  /** Evaluate a buffer to the struct (null for the empty "no rows"
    * sentinel, matching KmvMerge / HllMerge).
    */
  def toStruct(buf: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : Any =
    if (buf.isEmpty) null
    else {
      val hs = new Array[Long](buf.size)
      val vs = new Array[Double](buf.size)
      val it = buf.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        hs(i) = e.getKey.longValue(); vs(i) = e.getValue.doubleValue()
        i += 1
      }
      new GenericInternalRow(Array[Any](
        new GenericArrayData(hs), new GenericArrayData(vs)))
    }

  /** Rebuild a buffer from a stored struct (sorted arrays round-trip
    * through the tree in one pass).
    */
  def fromStruct(row: InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val hs = row.getArray(0).toLongArray()
    val vs = row.getArray(1).toDoubleArray()
    val out = newBuffer()
    var i = 0
    while (i < hs.length) { out.put(hs(i), vs(i)); i += 1 }
    out
  }

  /** Lower order statistic of the sample's values: sort ascending,
    * index floor(q * (m-1)) — a value that OCCURS in the data, which
    * is what makes the read restatable (and ties harmless: any of the
    * tied rows yields the same value).
    */
  def quantile(vs: Array[Double], q: Double): Double = {
    val sorted = vs.clone()
    java.util.Arrays.sort(sorted)
    sorted(math.floor(q * (sorted.length - 1)).toInt)
  }

  def structTypeOk(dt: DataType): Boolean = dt match {
    case StructType(Array(
      StructField(_, ArrayType(LongType, _), _, _),
      StructField(_, ArrayType(DoubleType, _), _, _))) => true
    case _ => false
  }

  def checkK(k: Int, name: String): Unit =
    require(k >= 2 && k <= MaxK, s"$name: k must be in [2, $MaxK], got $k")
}

/** `sample_sketch(id, value, k)` — aggregate keeping the k rows with
  * the smallest unsigned id hashes as STRUCT(hs ARRAY<BIGINT>,
  * vs ARRAY<DOUBLE>). `id` must be a unique row key (integral or
  * string); rows with a null id or null value are skipped (SQL
  * aggregates ignore nulls). See [[Smp]].
  */
case class SampleSketch(
    id: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    java.util.TreeMap[java.lang.Long, java.lang.Double]] {

  Smp.checkK(k, "sample_sketch")

  override def children: Seq[Expression] = Seq(id, value)
  override def nullable: Boolean = true
  override def dataType: DataType = Smp.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Kmv.keyTypeOk(id.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral or string id, got " +
          id.dataType.simpleString)
    else if (value.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE value, got " +
          value.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val toU64 = Kmv.toU64(id.dataType)

  override def createAggregationBuffer()
      : java.util.TreeMap[java.lang.Long, java.lang.Double] =
    Smp.newBuffer()

  override def update(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      input: InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val i = id.eval(input)
    val v = value.eval(input)
    if (i != null && v != null)
      Smp.put(buf, k, Hll.hash64(toU64(i)), v.asInstanceOf[Double])
    buf
  }

  override def merge(
      b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
      b2: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : java.util.TreeMap[java.lang.Long, java.lang.Double] =
    Smp.mergeInto(b1, b2, k)

  override def eval(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any =
    Smp.toStruct(buf)

  override def serialize(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : Array[Byte] = Smp.serialize(buf)
  override def deserialize(bytes: Array[Byte])
      : java.util.TreeMap[java.lang.Long, java.lang.Double] =
    Smp.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SampleSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SampleSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(id = c(0), value = c(1))
  override def prettyName: String = "sample_sketch"
}

/** `sample_merge(sketch, k)` — aggregate folding persisted sample
  * sketches (one per partition / day / rollup chunk) into the k
  * hash-smallest of their union: the re-aggregation face of
  * [[SampleSketch]], used by the rollup serve path and the chunk
  * compact fold. Null rows are skipped; an all-null group yields null.
  */
case class SampleMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    java.util.TreeMap[java.lang.Long, java.lang.Double]] {

  Smp.checkK(k, "sample_merge")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = Smp.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (Smp.structTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRUCT(hs ARRAY<BIGINT>, vs " +
        s"ARRAY<DOUBLE>) sketch, got ${child.dataType.simpleString}")

  override def createAggregationBuffer()
      : java.util.TreeMap[java.lang.Long, java.lang.Double] =
    Smp.newBuffer()

  override def update(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      input: InternalRow)
      : java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val row = v.asInstanceOf[InternalRow]
      val hs = row.getArray(0).toLongArray()
      val vs = row.getArray(1).toDoubleArray()
      var i = 0
      while (i < hs.length) { Smp.put(buf, k, hs(i), vs(i)); i += 1 }
      buf
    }
  }

  override def merge(
      b1: java.util.TreeMap[java.lang.Long, java.lang.Double],
      b2: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : java.util.TreeMap[java.lang.Long, java.lang.Double] =
    Smp.mergeInto(b1, b2, k)

  override def eval(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any =
    Smp.toStruct(buf)

  override def serialize(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double])
      : Array[Byte] = Smp.serialize(buf)
  override def deserialize(bytes: Array[Byte])
      : java.util.TreeMap[java.lang.Long, java.lang.Double] =
    Smp.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SampleMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SampleMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "sample_merge"
}

/** `sample_quantile(sketch, q)` — scalar quantile read of a sample
  * sketch: the lower order statistic (index floor(q * (m-1))) of the
  * sampled values. Exact below saturation; the bottom-k estimator at
  * it. Always a value that occurs in the data.
  */
case class SampleQuantile(child: Expression, q: Double)
    extends UnaryExpression with graft.functions.EvalDelegatingCodegen {
  require(q >= 0.0 && q <= 1.0, s"sample_quantile: q must be in [0, 1], got $q")
  override def prettyName: String = "sample_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (Smp.structTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRUCT(hs ARRAY<BIGINT>, vs " +
        s"ARRAY<DOUBLE>) sketch, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any = {
    val vs = v.asInstanceOf[InternalRow].getArray(1).toDoubleArray()
    // a stored sketch is never empty ([[Smp.toStruct]] nulls the
    // empty sentinel), but a hand-built struct could be
    if (vs.isEmpty) null else Smp.quantile(vs, q)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = delegatedGenCode(ctx, ev)
  override protected def withNewChildInternal(c: Expression): SampleQuantile =
    copy(child = c)
}

/** `sample_n(sketch)` — scalar sample-size read: the number of rows
  * the sketch holds (= min(rows, k); below saturation this is the
  * exact non-null row count).
  */
case class SampleSize(child: Expression)
    extends UnaryExpression with graft.functions.EvalDelegatingCodegen {
  override def prettyName: String = "sample_n"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (Smp.structTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRUCT(hs ARRAY<BIGINT>, vs " +
        s"ARRAY<DOUBLE>) sketch, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    v.asInstanceOf[InternalRow].getArray(0).numElements()

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = delegatedGenCode(ctx, ev)
  override protected def withNewChildInternal(c: Expression): SampleSize =
    copy(child = c)
}
