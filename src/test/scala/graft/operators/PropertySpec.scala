package graft.operators

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextHash
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants (seeded data → operator → invariant, the
  * reference's own test pattern, SURVEY §5) for the pure kernels that
  * everything else builds on.
  */
class PropertySpec extends SparkSuite {

  // deterministic sampler (the scalatest-scalacheck bridge isn't in
  // the offline dependency set; raw Gen + fixed seed is sufficient)
  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val vecGen: Gen[Array[Float]] =
    Gen.choose(2, 32).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0f, 10.0f)).map(_.toArray))

  test("TopKBuffer returns the k smallest, sorted, with id tie-break") {
    forAll(Gen.listOf(Gen.zip(Gen.choose(0.0, 100.0),
        Gen.choose(0L, 50L))), Gen.choose(1, 10)) {
      (xs: List[(Double, Long)], k: Int) =>
        val buf = new TopKBuffer(k)
        xs.foreach { case (s, id) => buf.insert(s, id) }
        val got = buf.sorted.toSeq
        val want = xs.sorted.distinct.take(k)
        // buffer keeps duplicates; compare against plain sort take k
        val wantDup = xs.sorted.take(k)
        assert(got === wantDup)
    }
  }

  test("TopKBuffer merge equals single-buffer inserts") {
    forAll(Gen.listOf(Gen.zip(Gen.choose(0.0, 9.0), Gen.choose(0L, 9L))),
        Gen.listOf(Gen.zip(Gen.choose(0.0, 9.0), Gen.choose(0L, 9L)))) {
      (a: List[(Double, Long)], b: List[(Double, Long)]) =>
        val one = new TopKBuffer(5)
        (a ++ b).foreach { case (s, id) => one.insert(s, id) }
        val left = new TopKBuffer(5)
        a.foreach { case (s, id) => left.insert(s, id) }
        val right = new TopKBuffer(5)
        b.foreach { case (s, id) => right.insert(s, id) }
        left.mergeFrom(right)
        assert(left.sorted.toSeq === one.sorted.toSeq)
    }
  }

  test("nearestCentroid is argmin with lowest-index tie-break") {
    forAll(Gen.listOfN(5, Gen.listOfN(4, Gen.choose(-5.0f, 5.0f))),
        Gen.listOfN(4, Gen.choose(-5.0f, 5.0f))) {
      (cents: List[List[Float]], v: List[Float]) =>
        val centroids = cents.map(_.toArray).toArray
        val got = ProductQuantizer.nearestCentroid(centroids, v.toArray)
        def d(c: Array[Float]) =
          c.zip(v).map { case (a, b) =>
            (a.toDouble - b) * (a.toDouble - b) }.sum
        val dists = centroids.map(d)
        assert(dists(got) === dists.min)
        assert(!dists.take(got).exists(_ == dists.min)) // first wins
    }
  }

  test("splitLayout covers [0, dim) exactly once for any valid split") {
    forAll(Gen.choose(1, 256), Gen.choose(1, 64)) { (dim: Int, s0: Int) =>
      val splits = math.min(s0, dim)
      val layout = ProductQuantizer.splitLayout(dim, splits)
      val covered = layout.flatMap(sp => sp.start until (sp.start + sp.len))
      assert(covered === (0 until dim))
    }
  }

  test("fnv1a/mix64 are deterministic; minhash similarity tracks overlap") {
    forAll(Gen.alphaNumStr) { s: String =>
      val u = UTF8String.fromString(s)
      assert(TextHash.fnv1a(u) === TextHash.fnv1a(u))
      assert(TextHash.mix64(TextHash.fnv1a(u)) ===
        TextHash.mix64(TextHash.fnv1a(u)))
    }
  }

  test("Tokenizer.groupByTokenBudget never splits an input, keeps order") {
    forAll(Gen.listOf(Gen.choose(1, 6).map(n =>
        Seq.fill(n)("w").mkString(" "))), Gen.choose(2, 10)) {
      (inputs: List[String], budget: Int) =>
        val groups = graft.embed.Tokenizer.groupByTokenBudget(inputs, budget)
        assert(groups.flatten === inputs) // order & completeness
        // every group except possibly singletons fits the budget
        groups.foreach { g =>
          val t = g.map(graft.embed.Tokenizer.countTokens).sum
          assert(t <= budget || g.size === 1)
        }
    }
  }

  test("rolling fingerprint: equal strings equal; window ≤ length safe") {
    forAll(Gen.alphaNumStr, Gen.choose(1, 32)) { (s: String, w: Int) =>
      val fp = graft.functions.RollingFingerprint(
        org.apache.spark.sql.catalyst.expressions.Literal(s), w)
      assert(fp.eval(null) === fp.eval(null))
    }
  }

  // mixed-content text: words, runs of spaces, newlines, digits,
  // punctuation, multi-byte unicode — the shapes that break tokenizers
  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumStr.map(_.take(8)),
    3 -> Gen.const(" "),
    1 -> Gen.const("  "),
    1 -> Gen.const("\n"),
    1 -> Gen.oneOf("é", "ü", "λ", "中", "🙂", "'s", ",", "!", "12345")
  )).map(_.mkString)

  test("BPE: decode inverts encode on arbitrary mixed text") {
    val lines = (0 until 256).map { b =>
      java.util.Base64.getEncoder.encodeToString(Array(b.toByte)) + " " + b
    } ++ Seq("aGU= 256", "dGhl 258", "IHRo 259") // "he", "the", " th"
    val f = java.nio.file.Files.createTempFile("prop", ".tiktoken")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    val tok = graft.embed.BpeTokenizer.fromRanksFile(f.toString)
    forAll(textGen, n = 200) { s: String =>
      assert(tok.decode(tok.encodeOrdinary(s)) === s)
      // truncation never exceeds the budget and is a character prefix
      // (mid-piece cuts back off to clean code-point boundaries)
      val (t, n) = tok.truncateWithCount(s, 5)
      assert(n <= 5 && s.startsWith(t))
    }
  }

  test("shingle expression matches String.split semantics on random text") {
    import spark.implicits._
    val samples = {
      val buf = List.newBuilder[String]
      forAll(textGen, n = 200)(s => buf += s)
      buf.result()
    }
    for (n <- Seq(1, 2, 3)) {
      val got = samples.toDF("t")
        .select(graft.functions.TextFunctions.shingle_hashes($"t", n))
        .collect().map(_.getSeq[Long](0)).toSeq
      val want = samples.map { t =>
        val w = t.split(' ')
        if (w.length < n) Seq.empty[Long]
        else {
          val set = new scala.collection.mutable.LinkedHashSet[Long]
          for (i <- 0 to w.length - n)
            set += TextHash.fnv1a(
              UTF8String.fromString(w.slice(i, i + n).mkString(" ")))
          set.toSeq
        }
      }
      assert(got === want, s"n=$n")
    }
  }

  test("chunk windows tile any token count: starts at stride multiples, " +
      "full coverage, declared lengths") {
    forAll(Gen.choose(1, 500), Gen.choose(2, 64)) { (nTok, stride) =>
      val chunkSize = stride + stride / 2 // overlap = stride/2
      val nChunks = (nTok - 1) / stride + 1
      val spans = (0 until nChunks).map { c =>
        val start = c * stride
        (start, math.min(chunkSize, nTok - start))
      }
      // every span non-empty and inside the doc
      spans.foreach { case (s, len) =>
        assert(len >= 1 && s + len <= nTok)
      }
      // coverage: union of spans is [0, nTok)
      val covered = spans.flatMap { case (s, l) => s until (s + l) }.toSet
      assert(covered === (0 until nTok).toSet, s"nTok=$nTok stride=$stride")
    }
  }

  test("Morton interleave is a bijection on 16-bit pairs") {
    forAll(Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))) {
      case (a, b) =>
        val z = (0 until 16).map(i =>
          (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).sum
        // deinterleave recovers both halves exactly
        val ra = (0 until 16).map(i => ((z >> (2 * i)) & 1) << i).sum
        val rb = (0 until 16).map(i => ((z >> (2 * i + 1)) & 1) << i).sum
        assert(ra == a && rb == b, s"($a,$b) -> $z -> ($ra,$rb)")
        assert(z >= 0 && z < (1L << 32))
    }
  }

  test("distance expressions: codegen (DataFrame), interpreted " +
      "(nullSafeEval), and a plain-Scala fold agree bit-for-bit") {
    import spark.implicits._
    import graft.functions.{VectorFunctions => V}
    // the reference folds: index-ordered double accumulation — the
    // contract every oracle restatement relies on
    def l2sq(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((s, i) =>
        s + (a(i).toDouble - b(i).toDouble) * (a(i).toDouble - b(i).toDouble))
    def dot(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    def cos(a: Array[Float], b: Array[Float]) =
      1.0 - dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    def l1(a: Array[Float], b: Array[Float]) =
      a.indices.foldLeft(0.0)((s, i) =>
        s + math.abs(a(i).toDouble - b(i).toDouble))
    val pairGen = vecGen.flatMap(a =>
      Gen.listOfN(a.length, Gen.choose(-10.0f, 10.0f))
        .map(b => (a, b.toArray)))
    val pairs = scala.collection.mutable.ArrayBuffer[
      (Array[Float], Array[Float])]()
    forAll(pairGen, 60)(p => pairs += p)
    // round-trip through parquet so Catalyst can't constant-fold the
    // projection away — the scan + project is the real codegen path
    val tmp = java.nio.file.Files
      .createTempDirectory("distprop").toString + "/pairs"
    pairs.toSeq.zipWithIndex
      .map { case ((a, b), i) => (i, a.toSeq, b.toSeq) }
      .toDF("i", "a", "b").write.parquet(tmp)
    val df = spark.read.parquet(tmp).orderBy($"i")
      .select(V.l2sq_dist($"a", $"b"), -V.inner_product($"a", $"b"),
        V.cos_dist($"a", $"b"), V.l1_dist($"a", $"b"))
    val rows = df.collect()
    // WSCG must actually be compiling this projection (the '*(n)'
    // prefix marks a whole-stage-codegen'd operator)
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project .*l2sq_dist".r.findFirstIn(plan)
      .isDefined, s"distance project not codegen'd:\n$plan")
    pairs.zip(rows).foreach { case ((a, b), r) =>
      assert(r.getDouble(0) === l2sq(a, b), "l2sq codegen diverges")
      assert(r.getDouble(1) === -dot(a, b), "dot codegen diverges")
      assert(r.getDouble(2) === cos(a, b), "cos codegen diverges")
      assert(r.getDouble(3) === l1(a, b), "l1 codegen diverges")
    }
    // interpreted path (nullSafeEval) — what Verify/filters hit when a
    // stage falls out of codegen — must match the same folds
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit(v: Array[Float]) =
      Literal(ArrayData.toArrayData(v), ArrayType(FloatType))
    pairs.foreach { case (a, b) =>
      assert(graft.functions.L2SqDistance(lit(a), lit(b)).eval(null)
        === l2sq(a, b), "l2sq interpreted diverges")
      assert(graft.functions.CosineDistance(lit(a), lit(b)).eval(null)
        === cos(a, b), "cos interpreted diverges")
      assert(graft.functions.L1Distance(lit(a), lit(b)).eval(null)
        === l1(a, b), "l1 interpreted diverges")
    }
  }

  test("BqEncode/BqHamming: packed-word hamming equals the unpacked " +
      "sign-disagreement count for any dim, including exact zeros and " +
      "word boundaries") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit(v: Array[Float]) =
      Literal(ArrayData.toArrayData(v), ArrayType(FloatType))
    // zeros appear with real probability: the x > 0 convention makes
    // 0 and negatives agree, which the reference count must mirror
    val elem = Gen.frequency(
      (1, Gen.const(0.0f)), (4, Gen.choose(-1.0f, 1.0f)))
    // dims straddle the 64-bit word boundary (63..66) plus small/large
    val dimGen = Gen.oneOf(Gen.choose(1, 8), Gen.choose(63, 66),
      Gen.choose(120, 200))
    forAll(dimGen.flatMap(n =>
        Gen.zip(Gen.listOfN(n, elem), Gen.listOfN(n, elem))), n = 60) {
      case (al, bl) =>
        val a = al.toArray; val b = bl.toArray
        val want = a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }
        val got = graft.functions.BqHamming(
          graft.functions.BqEncode(lit(a)),
          graft.functions.BqEncode(lit(b))).eval(null)
        assert(got === want.toLong, s"dim ${a.length}")
    }
  }

  test("90/5/5 split draw stays ~90/5/5 WITHIN the mix-survivor set " +
      "(the decorrelation that actually matters)") {
    // emulate both SQL draws over a dense id range, condition on the
    // mixing keep-interval, and require the split fractions to survive
    // the conditioning — a constant-shift draw fails this utterly
    // (every mix survivor would land in 'train')
    val ids = 0L until 200000L
    def uMix(id: Long) = ((id % 1000000L) * 2654435761L) % 1000000L
    def uSplit(id: Long) = ((id % 1000000L) * 2246822519L + 40503L) % 1000000L
    val kept = ids.filter(id => uMix(id) < 800000L)
    assert(kept.nonEmpty)
    val splits = kept.groupBy { id =>
      val u = uSplit(id)
      if (u < 900000L) "train" else if (u < 950000L) "val" else "test"
    }.view.mapValues(_.size.toDouble / kept.size).toMap
    assert(math.abs(splits.getOrElse("train", 0.0) - 0.90) < 0.02, splits)
    assert(math.abs(splits.getOrElse("val", 0.0) - 0.05) < 0.01, splits)
    assert(math.abs(splits.getOrElse("test", 0.0) - 0.05) < 0.01, splits)
  }
}
