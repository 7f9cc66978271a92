package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashing primitives for the dedup suite
  * (MinHash, SimHash, rolling fingerprints). Everything is seed-stable
  * and executor-independent so results are reproducible across runs and
  * cluster sizes. Hash family: FNV-1a base hash + a murmur-style avalanche
  * mix keyed by the hash index — standard MinHash construction
  * (Broder 1997, "On the resemblance and containment of documents").
  */
object TextHash {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a over UTF-8 bytes. */
  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1
    }
    h
  }

  /** splitmix64 finalizer — decorrelates hash functions per index. */
  def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashWithSeed(base: Long, seed: Long): Long = mix64(base ^ mix64(seed))
}

/** `minhash_signature(tokens, numHashes, seed)` → ARRAY<BIGINT>.
  * One pass over the token array per row; k decorrelated min-hashes.
  * Accepts ARRAY<STRING> tokens (FNV-1a hashed here) or ARRAY<BIGINT>
  * of pre-computed FNV-1a token hashes (e.g. from
  * `Dedup.hashedShingleSets`) — both produce identical signatures.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def prettyName: String = "minhash_signature"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val preHashed = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires ARRAY<STRING> or ARRAY<BIGINT>, " +
        s"got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val base =
          if (preHashed) arr.getLong(i)
          else TextHash.fnv1a(arr.getUTF8String(i))
        var j = 0
        while (j < numHashes) {
          val h = TextHash.hashWithSeed(base, seed * 0x51_7c_c1_b7L + j)
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `simhash64(tokens)` → BIGINT. Charikar 2002 similarity hash: sum of
  * +/-1 per bit over token hashes; near-identical token multisets give
  * near-identical bit patterns (small hamming distance).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def prettyName: String = "simhash64"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = TextHash.fnv1a(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `rolling_fingerprint(text, window)` → BIGINT. Minimum of a polynomial
  * rolling hash over all `window`-byte substrings (Rabin-Karp style;
  * the reference's document-fingerprinting analog). Whole-text hash when
  * text is shorter than the window.
  */
case class RollingFingerprint(child: Expression, window: Int)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def prettyName: String = "rolling_fingerprint"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint requires STRING, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val B = 257L
    if (bytes.length <= window) {
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * B + (bytes(i) & 0xffL); i += 1 }
      TextHash.mix64(h)
    } else {
      // B^(window-1) for the roll-off term
      var pow = 1L
      var i = 0
      while (i < window - 1) { pow *= B; i += 1 }
      var h = 0L
      i = 0
      while (i < window) { h = h * B + (bytes(i) & 0xffL); i += 1 }
      var min = TextHash.mix64(h)
      i = window
      while (i < bytes.length) {
        h = (h - (bytes(i - window) & 0xffL) * pow) * B + (bytes(i) & 0xffL)
        val m = TextHash.mix64(h)
        if (java.lang.Long.compareUnsigned(m, min) < 0) min = m
        i += 1
      }
      min
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `cosine_lsh_bucket(vec, numBits, seed)` → BIGINT. Random-hyperplane
  * LSH (Charikar 2002): bit j = sign of <vec, plane_j> where plane_j is a
  * deterministic pseudo-random +/-1 vector derived from (seed, j, i).
  * Vectors with low cosine distance collide with high probability; used
  * to bucket candidates before exact verification at scale.
  */
case class CosineLshBucket(child: Expression, numBits: Int, seed: Long)
    extends UnaryExpression with EvalDelegatingCodegen {
  require(numBits > 0 && numBits <= 63, "numBits in [1, 63]")
  override def prettyName: String = "cosine_lsh_bucket"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cosine_lsh_bucket requires ARRAY<FLOAT>, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0L
    var j = 0
    while (j < numBits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        val sign = if ((TextHash.hashWithSeed(j.toLong << 32 | i, seed) & 1L) == 1L) 1.0 else -1.0
        dot += arr.getFloat(i) * sign
        i += 1
      }
      if (dot >= 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `shingle_hashes(text, n)` → ARRAY<BIGINT>: distinct FNV-1a hashes of
  * the text's word n-grams, in first-occurrence order. Byte-exact to
  * splitting on single spaces (java String.split parity: interior empty
  * words kept, trailing empties dropped) and hashing each space-joined
  * n-gram — but computed directly over the UTF-8 bytes: rejoining a
  * single-space split reproduces the original byte sequence, so each
  * n-gram's hash is one FNV fold over the byte range
  * [wordStart(i), wordEnd(i+n-1)) with zero string allocation. 0x20
  * never occurs inside a multi-byte UTF-8 sequence, so byte-level
  * splitting equals char-level. Replaces the Scala UDF on the dedup
  * hot path (no Row conversion, no per-word arrays).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with EvalDelegatingCodegen {
  require(n >= 1, "shingle size must be >= 1")
  override def prettyName: String = "shingle_hashes"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires STRING, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    // word boundaries: segments between single spaces (= spaces+1
    // segments), then String.split parity: drop trailing empties, but
    // "" still counts as one empty word
    var wc = 0
    var starts = new Array[Int](math.max(8, bytes.length / 4 + 1))
    var ends = new Array[Int](starts.length)
    def push(s: Int, e: Int): Unit = {
      if (wc == starts.length) {
        starts = java.util.Arrays.copyOf(starts, wc * 2)
        ends = java.util.Arrays.copyOf(ends, wc * 2)
      }
      starts(wc) = s; ends(wc) = e; wc += 1
    }
    var segStart = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20.toByte) { push(segStart, i); segStart = i + 1 }
      i += 1
    }
    push(segStart, bytes.length)
    while (wc > 0 && starts(wc - 1) == ends(wc - 1)) wc -= 1
    if (bytes.length == 0) wc = 1 // "".split(' ') == [""]
    val numWin = wc - n + 1
    if (numWin <= 0) return new GenericArrayData(Array.emptyLongArray)
    // open-addressed dedup set (no boxing), first-occurrence order out
    var cap = 8
    while (cap < numWin * 2) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](numWin)
    var outN = 0
    var w = 0
    while (w < numWin) {
      var h = TextHash.FnvOffset
      var b = starts(w)
      val end = ends(w + n - 1)
      while (b < end) {
        h ^= (bytes(b) & 0xffL); h *= TextHash.FnvPrime; b += 1
      }
      var idx = (TextHash.mix64(h) & (cap - 1)).toInt
      var fresh = false
      var done = false
      while (!done) {
        if (!used(idx)) { used(idx) = true; table(idx) = h
          fresh = true; done = true }
        else if (table(idx) == h) done = true
        else idx = (idx + 1) & (cap - 1)
      }
      if (fresh) { out(outN) = h; outN += 1 }
      w += 1
    }
    new GenericArrayData(
      if (outN == numWin) out else java.util.Arrays.copyOf(out, outN))
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `gram_hashes(text, n)` → ARRAY<BIGINT>: FNV-1a hashes of the text's
  * word n-grams IN POSITION ORDER, duplicates kept — the positional
  * sibling of [[ShingleHashes]] (same single-space word parity, same
  * zero-allocation byte-range fold) for algorithms where gram position
  * matters (winnowing, span alignment). Element i is the hash of the
  * gram starting at word i.
  */
case class GramHashes(child: Expression, n: Int)
    extends UnaryExpression with EvalDelegatingCodegen {
  require(n >= 1, "gram size must be >= 1")
  override def prettyName: String = "gram_hashes"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_hashes requires STRING, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var wc = 0
    var starts = new Array[Int](math.max(8, bytes.length / 4 + 1))
    var ends = new Array[Int](starts.length)
    def push(s: Int, e: Int): Unit = {
      if (wc == starts.length) {
        starts = java.util.Arrays.copyOf(starts, wc * 2)
        ends = java.util.Arrays.copyOf(ends, wc * 2)
      }
      starts(wc) = s; ends(wc) = e; wc += 1
    }
    var segStart = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20.toByte) { push(segStart, i); segStart = i + 1 }
      i += 1
    }
    push(segStart, bytes.length)
    while (wc > 0 && starts(wc - 1) == ends(wc - 1)) wc -= 1
    if (bytes.length == 0) wc = 1 // "".split(' ') == [""]
    val numWin = wc - n + 1
    if (numWin <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](numWin)
    var w = 0
    while (w < numWin) {
      var h = TextHash.FnvOffset
      var b = starts(w)
      val end = ends(w + n - 1)
      while (b < end) {
        h ^= (bytes(b) & 0xffL); h *= TextHash.FnvPrime; b += 1
      }
      out(w) = h
      w += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `winnow(gramHashes, w)` → ARRAY<STRUCT<pos INT, fp BIGINT>>: robust
  * winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the
  * MOSS scheme). From each window of `w` consecutive gram hashes,
  * select the minimum; on ties, the RIGHTMOST minimum. Each selected
  * (pos, hash) is emitted once, in position order (0-based gram
  * position). Guarantees: at least one fingerprint per w consecutive
  * grams (detection of any match of length >= w+n-1 words), yet only
  * ~2/(w+1) of grams are kept. Comparison is SIGNED 64-bit — the same
  * total order a BIGINT-based SQL restatement uses, so an independent
  * engine reproduces the selection bit-for-bit. Inputs shorter than
  * one full window yield no fingerprints. Per-row projection: the
  * selection is document-local, so the operator is shuffle-free at
  * any corpus size.
  */
case class Winnow(child: Expression, w: Int)
    extends UnaryExpression with EvalDelegatingCodegen {
  require(w >= 1, "window must be >= 1")
  override def prettyName: String = "winnow"
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow requires ARRAY<BIGINT>, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var lastPos = -1
    var s = 0
    while (s + w <= n) {
      // rightmost minimum of hashes[s, s+w): scan right-to-left,
      // strict < keeps the rightmost among ties
      var minPos = s + w - 1
      var minH = arr.getLong(minPos)
      var j = s + w - 2
      while (j >= s) {
        val h = arr.getLong(j)
        if (h < minH) { minH = h; minPos = j }
        j -= 1
      }
      if (minPos != lastPos) {
        out += InternalRow(minPos, minH)
        lastPos = minPos
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `fnv_hash(text)` → BIGINT: the suite's shared FNV-1a over UTF-8
  * bytes ([[TextHash.fnv1a]]) as a standalone scalar — the term-id
  * hash of the sparse-retrieval postings (SparseSearch). Exposed so
  * hand-written SQL can derive the same hashed vocabulary ids the
  * operators use; restatable in DuckDB via the byte-fold the simhash
  * and sparse oracles carry.
  */
case class FnvHash(child: Expression)
    extends UnaryExpression with EvalDelegatingCodegen {
  override def prettyName: String = "fnv_hash"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${t.simpleString}")
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    delegatedGenCode(ctx, ev)
  override def nullSafeEval(v: Any): Any =
    TextHash.fnv1a(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `sparse_dot(ia, va, ib, vb)` → BIGINT: dot product of two sparse
  * vectors given as (sorted-ascending index array, parallel value
  * array) pairs with integer (impact-quantized) values — the pairwise
  * scoring primitive of learned-sparse retrieval. A single merge pass
  * over the two index arrays; requires each (idx, val) pair to have
  * equal lengths and strictly ascending indices (the shape
  * SparseSearch.sparseVectors emits).
  */
case class SparseDot(ia: Expression, va: Expression, ib: Expression,
    vb: Expression) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def prettyName: String = "sparse_dot"
  override def children: Seq[Expression] = Seq(ia, va, ib, vb)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def checkInputDataTypes(): TypeCheckResult = {
    val idxOk = Seq(ia, ib).forall(_.dataType match {
      case ArrayType(IntegerType, _) => true; case _ => false })
    val valOk = Seq(va, vb).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false })
    if (idxOk && valOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<INT>, ARRAY<BIGINT>) x 2, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def eval(input: InternalRow): Any = {
    val iaV = ia.eval(input); val vaV = va.eval(input)
    val ibV = ib.eval(input); val vbV = vb.eval(input)
    if (iaV == null || vaV == null || ibV == null || vbV == null) null
    else {
      val ai = iaV.asInstanceOf[ArrayData]; val av = vaV.asInstanceOf[ArrayData]
      val bi = ibV.asInstanceOf[ArrayData]; val bv = vbV.asInstanceOf[ArrayData]
      if (ai.numElements() != av.numElements() ||
          bi.numElements() != bv.numElements())
        throw new IllegalArgumentException(
          "sparse_dot: index/value arrays differ in length")
      var i = 0; var j = 0; var acc = 0L
      while (i < ai.numElements() && j < bi.numElements()) {
        val x = ai.getInt(i); val y = bi.getInt(j)
        if (x == y) { acc += av.getLong(i) * bv.getLong(j); i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      acc
    }
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression =
    copy(ia = cs(0), va = cs(1), ib = cs(2), vb = cs(3))
}
