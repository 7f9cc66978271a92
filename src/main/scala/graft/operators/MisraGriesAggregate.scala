package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded frequent-items summary (Misra–Gries 1982), mergeable per
  * Agarwal et al., "Mergeable Summaries" (PODS 2012, §3): at most
  * `capacity` counters; an unmatched item either takes a free slot or
  * decrements every counter (dropping zeros). Merging sums counters
  * and, if over capacity, subtracts the (capacity+1)-th largest count
  * from all and drops non-positives — the same error bound as the
  * streaming path.
  *
  * Guarantee (both paths): every item's estimate undercounts its true
  * frequency by at most N/(capacity+1) over N total updates, so any
  * item with true frequency > N/(capacity+1) is GUARANTEED present in
  * the final summary. That makes this the candidate pass of an exact
  * two-pass heavy-hitters at 100 TB: the full corpus is never
  * grouped-by — the shuffle carries at most `capacity` rows per
  * partition — and a second exact count over only the ≤`capacity`
  * candidates turns the sketch into an exact top-k.
  */
final class MgBuffer(val capacity: Int) {
  val counts = new mutable.HashMap[String, Long]()

  def update(item: String): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + 1)
      case None if counts.size < capacity => counts.update(item, 1L)
      case None =>
        // decrement-all; each such step destroys capacity+1 units of
        // count (the arriving item's included), bounding total loss
        val dead = mutable.ArrayBuffer[String]()
        counts.mapValuesInPlace { (_, c) => c - 1 }
        counts.foreach { case (k, c) => if (c <= 0) dead += k }
        dead.foreach(counts.remove)
    }
  }

  def mergeFrom(o: MgBuffer): Unit = {
    o.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from every counter
      val vs = counts.values.toArray
      java.util.Arrays.sort(vs)
      val cut = vs(vs.length - capacity - 1)
      val dead = mutable.ArrayBuffer[String]()
      counts.mapValuesInPlace { (_, c) => c - cut }
      counts.foreach { case (k, c) => if (c <= 0) dead += k }
      dead.foreach(counts.remove)
    }
  }

  /** (item, estimate) sorted by (estimate desc, item) — deterministic. */
  def sorted: Array[(String, Long)] =
    counts.toArray.sortBy { case (k, c) => (-c, k) }
}

/** `mg_sketch(item, capacity)` — aggregate returning the Misra–Gries
  * summary as `ARRAY<STRUCT<item: STRING, est: BIGINT>>`, ordered by
  * (est DESC, item). A real Catalyst aggregate, so Spark plans the
  * partial before the shuffle: each partition emits one ≤capacity-entry
  * summary instead of its full item stream.
  *
  * `topK` (the SQL surface's `sketch_topk(item, k, capacity)`) keeps
  * only the first k summary entries at eval — the sketch itself still
  * runs at full `capacity`, so the N/(capacity+1) undercount bound is
  * unchanged; the slice only trims the returned array.
  */
case class MgSketch(
    itemExpr: Expression,
    capacity: Int,
    topK: Option[Int] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  require(capacity > 0, "capacity must be positive")
  require(topK.forall(_ > 0), "k must be positive")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = MgSketch.resultType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    itemExpr.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires a STRING item (cast first), got " +
              other.simpleString)
    }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = itemExpr.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = topK.fold(buf.sorted)(buf.sorted.take)
    val rows = entries.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity); out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MgSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(itemExpr = c(0))
  override def prettyName: String =
    if (topK.isDefined) "sketch_topk" else "mg_sketch"
}

object MgSketch {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
}

/** `mg_merge(entries, capacity)` — aggregate folding PERSISTED
  * Misra–Gries summaries (the `ARRAY<STRUCT<item, est>>` rows
  * [[MgSketch]] emits) back into one summary: counters sum, then the
  * standard over-capacity cut (Agarwal et al., PODS 2012) — the same
  * mergeable-summaries step the in-flight partial merge uses, so
  * summaries persisted per day / partition / rollup chunk fold with
  * the identical N/(capacity+1) undercount bound. Pass the capacity
  * the source sketches were built at. `topK` trims the returned
  * array only (the fold still runs at full capacity).
  */
case class MgMerge(
    child: Expression,
    capacity: Int,
    topK: Option[Int] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  require(capacity > 0, "capacity must be positive")
  require(topK.forall(_ > 0), "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MgSketch.resultType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 &&
          s(0).dataType == StringType && s(1).dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName requires ARRAY<STRUCT<item: STRING, " +
              s"est: BIGINT>> summaries, got ${other.simpleString}")
    }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val tmp = new MgBuffer(capacity)
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 2)
        tmp.counts.update(row.getUTF8String(0).toString, row.getLong(1))
        i += 1
      }
      buf.mergeFrom(tmp)
    }
    buf
  }

  override def merge(b1: MgBuffer, b2: MgBuffer): MgBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = topK.fold(buf.sorted)(buf.sorted.take)
    val rows = entries.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity); out.writeInt(buf.counts.size)
    buf.counts.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MgBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MgMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
  override def prettyName: String = "mg_merge"
}
