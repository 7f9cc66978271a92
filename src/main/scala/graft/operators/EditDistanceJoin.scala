package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One segment-signature emission: candidate partner length, segment
  * ordinal, and the segment/substring text. Top-level and public so
  * Spark's encoder CODEGEN can call the accessors — as a private
  * nested class Janino fails to resolve them and every serializer in
  * the join falls back to the interpreted path.
  */
case class SegEmit(len: Int, seg: Int, sub: String)

/** One deletion-neighborhood emission for the k=1 fast path: the
  * variant text and the deleted position (-1 = the string itself).
  * Top-level and public for the same Janino-codegen reason as
  * [[SegEmit]].
  */
case class DelEmit(tag: Int, key: String)

/** Edit-distance similarity join — all unordered pairs of distinct
  * strings within Levenshtein distance k — via PASS-JOIN-style
  * segment signatures (Li/Deng/Feng's partition scheme, a published
  * exact-filtering algorithm): never all-pairs.
  *
  * Why it is complete: split every string s into k+1 contiguous
  * segments of near-even length. Any ≤ k edits transforming s into t
  * leave at least one segment UNTOUCHED (pigeonhole over k+1
  * segments), and an untouched segment appears verbatim in t at a
  * position shifted by at most the net indel count, i.e. ≤ k. So the
  * index side emits each string's k+1 (length, segment-ordinal,
  * segment) keys, the probe side emits every substring of t that
  * could be a partner's untouched segment — for each candidate
  * partner length L in [|t|-k, |t|+k], each ordinal's substring
  * window — and an equi-join on (L, ordinal, substring) yields a
  * candidate superset, verified by the engine's codegen Levenshtein.
  *
  * The probe window is the paper's MULTI-MATCH-AWARE selection, not
  * the naive ±k shift: a substring of t starting at position p can
  * be segment i's (1-based) untouched match only if
  * p ∈ [p_i-(i-1), p_i+(i-1)] ∩ [p_i+Δ-(k+1-i), p_i+Δ+(k+1-i)]
  * with Δ = |t|-L. Left bound: a shift of more than i-1 before
  * segment i needs ≥ i edits there, leaving ≤ k-i for the k+1-i
  * later segments — pigeonhole hands the pair to one of THOSE
  * ordinals instead, so dropping this emission loses nothing.
  * Right bound is the mirror argument over the suffix (the remaining
  * length difference must be absorbed by ≤ k+1-i trailing edits).
  * Fan-out per string drops from (2k+1)·(k+1)·(2k+1) = 75 at k=2 to
  * Σ over (Δ, i) of the intersected window = 19 — ~4× fewer probe
  * emissions, join keys, and candidate verifications, still exact
  * (the completeness property test pins it against brute force).
  *
  * Strings shorter than k+1 characters have empty segments (the
  * pigeonhole argument degenerates), so they pair all-against-all
  * within the ≤ 2k-character population — bounded in any natural
  * corpus, and the only non-signature path.
  *
  * 100 TB posture: both join sides are corpus-sized, so this is a
  * plain shuffle equi-join on (len, seg, sub) — partition-parallel,
  * no broadcast needed, map-side-distinct on the probe's window
  * emits. Candidate volume (and segment-key skew) is data-dependent:
  * corpora of near-identical strings (shared long prefixes) inflate
  * one segment key's bucket, which is the true quadratic core of the
  * problem — the verify stays per-pair-bounded either way. The
  * reference's fuzzy story stops at embedding distance
  * (lantern_extras/README.md vector search); string-edit near-dup is
  * the training-pipeline extension (typo/OCR variant collapse).
  */
object EditDistanceJoin {

  /** Near-even PassJoin segmentation: k+1 segments, longer ones
    * first; total = s.length.
    */
  private[operators] def segments(s: String, k: Int): Seq[(Int, String)] = {
    val L = s.length
    val base = L / (k + 1)
    val extra = L % (k + 1)
    var start = 0
    (0 to k).map { i =>
      val len = base + (if (i < extra) 1 else 0)
      val sub = s.substring(start, start + len)
      start += len
      (i, sub)
    }
  }

  /** All unordered pairs (a < b) of distinct non-null values of
    * `strCol` with 1 <= levenshtein <= k, as (a, b, ed).
    *
    * Skew guard (`saltDfCap`/`saltBuckets`): a corpus of
    * near-identical strings (a shared prefix like "Customer#…") makes
    * ONE segment key carry the whole population, and since both join
    * inputs are small Spark broadcasts the join — the quadratic
    * candidate explosion then runs in a SINGLE task (AQE cannot see
    * it: the skew is in the join OUTPUT, not the shuffle blocks).
    * So the index side counts its keys first; any key whose string
    * count exceeds `saltDfCap` joins on an extra salt column —
    * hash(a) % saltBuckets on the index side, exploded 0..buckets-1
    * on the probe side (replicate-one-side salting, exact) — which
    * spreads the hot bucket's pairs across `saltBuckets` tasks. Cold
    * keys pay one extra literal column, nothing else; probe
    * replication is confined to the (broadcast, capped) hot-key set.
    */
  def pairs(df: DataFrame, strCol: String, k: Int,
      saltDfCap: Int = 256, saltBuckets: Int = 32): DataFrame = {
    require(k >= 1 && k <= 4, s"k must be in [1, 4], got $k")
    require(saltDfCap >= 1, s"saltDfCap must be >= 1, got $saltDfCap")
    require(saltBuckets >= 1 && saltBuckets <= 4096,
      s"saltBuckets must be in [1, 4096], got $saltBuckets")
    val spark = df.sparkSession
    import spark.implicits._
    val strs = df.select(col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull).distinct()

    val minSeg = k + 1
    // k=1 fast path: FastSS deletion neighborhoods (Bocek et al. 2007,
    // "Fast Similarity Search in Large Dictionaries"). ed(a,b)=1 iff
    // the pair shares a SAME-POSITION single-deletion variant (one
    // substitution) or one string IS a single-deletion variant of the
    // other (one indel) — so an equi-join on near-full-length variant
    // keys finds exactly the true pairs, with NO false positives and
    // no hot segment bucket: a corpus sharing a long literal prefix
    // ("Customer#…") degenerates PassJoin's prefix segment to an
    // all-pairs bucket, while deletion keys keep every discriminative
    // character. Emission is (L+1) keys of ~L chars per string, so the
    // path is gated to short-string corpora (names, titles, typo
    // vocabularies); longer strings take the O(k²)-emission PassJoin
    // path below.
    if (k == 1) {
      val maxLen = strs.agg(coalesce(max(length($"s")), lit(0)))
        .head.getInt(0)
      if (maxLen <= 128)
        return deletionCandidates(strs, saltDfCap, saltBuckets)
          .union(shortPairs(strs, k))
          .distinct()
    }
    val idxEmit = udf((s: String) =>
      if (s.length < minSeg) Seq.empty[SegEmit]
      else segments(s, k).map { case (i, sub) => SegEmit(s.length, i, sub) })
    val probeEmit = udf((t: String) => {
      val m = t.length
      val out = scala.collection.mutable.LinkedHashSet[SegEmit]()
      var pl = math.max(minSeg, m - k)
      while (pl <= m + k) {
        val delta = m - pl
        val base = pl / (k + 1)
        val extra = pl % (k + 1)
        var start = 0
        var i = 0 // 0-based ordinal; the paper's i-1 is this i
        while (i <= k) {
          val len = base + (if (i < extra) 1 else 0)
          // multi-match-aware window: shift ∈ [-i, i] from prefix
          // edits AND ∈ [Δ-(k-i), Δ+(k-i)] from suffix edits
          var pos = math.max(0,
            math.max(start - i, start + delta - (k - i)))
          val hi = math.min(m - len,
            math.min(start + i, start + delta + (k - i)))
          while (pos <= hi) {
            out += SegEmit(pl, i, t.substring(pos, pos + len))
            pos += 1
          }
          start += len
          i += 1
        }
        pl += 1
      }
      out.toSeq
    })

    val idxRaw = strs
      .select($"s".as("a"), explode(idxEmit($"s")).as("e"))
      .select($"a", $"e.len", $"e.seg", $"e.sub")
    val probeRaw = strs
      .select($"s".as("b"), explode(probeEmit($"s")).as("e"))
      .select($"b", $"e.len", $"e.seg", $"e.sub")
    // hot-key census on the (cheaper) index side: segment keys whose
    // string count exceeds the cap get salted. The collect is bounded:
    // emission volume is (k+1)·|corpus| and only keys above the cap
    // survive, so the hot set has at most (k+1)·|corpus|/cap entries
    // — and near-identical corpora concentrate it into a handful.
    val hotKeys = idxRaw.groupBy($"len", $"seg", $"sub")
      .agg(count(lit(1)).as("df"))
      .where($"df" > saltDfCap)
      .select($"len", $"seg", $"sub")
    // Both sides get a FIXED-COUNT repartition on the full salted key
    // and the join is pinned to a SHUFFLED hash join. Left to itself,
    // Spark broadcasts one tiny side and AQE coalesces the other's
    // exchanges down to one partition (every input here is small
    // BEFORE the join — the explosion only exists in the join
    // OUTPUT, which neither broadcast sizing nor AQE skew handling
    // can see), putting the whole candidate flood in a single task.
    // User-numbered repartitions satisfy the SHJ's distribution
    // as-is, AQE leaves their count alone, and the hot key's salt
    // spread puts each bucket's pairs in its own task.
    val idx = idxRaw
      .join(broadcast(hotKeys.withColumn("hot", lit(true))),
        Seq("len", "seg", "sub"), "left")
      .withColumn("salt",
        when($"hot", pmod(hash($"a"), lit(saltBuckets)))
          .otherwise(lit(0)))
      .select($"a", $"len", $"seg", $"sub", $"salt")
      .repartition(saltBuckets, $"len", $"seg", $"sub", $"salt")
    val probe = probeRaw
      .join(broadcast(hotKeys.withColumn("hot", lit(true))),
        Seq("len", "seg", "sub"), "left")
      .withColumn("salt", explode(
        when($"hot", sequence(lit(0), lit(saltBuckets - 1)))
          .otherwise(array(lit(0)))))
      .select($"b", $"len", $"seg", $"sub", $"salt")
      .repartition(saltBuckets, $"len", $"seg", $"sub", $"salt")
    // the pigeonhole guarantees the (index = x, probe = y) direction
    // for EVERY qualifying pair, so a<b loses nothing and drops self
    // pairs and mirror duplicates in one move. Verify BEFORE the
    // dedup: the thresholded (banded O(k·n)) levenshtein prunes the
    // candidate flood down to true pairs, so the distinct shuffles
    // survivors, not candidates.
    val candidates = idx.hint("shuffle_hash").join(probe,
        Seq("len", "seg", "sub", "salt"))
      .where($"a" < $"b")
      .withColumn("ed", levenshtein($"a", $"b", k))
      .where($"ed".between(1, k))
      .select($"a", $"b", $"ed")

    // survivors only: true pairs are output-sized, so the dedup of
    // multi-segment matches shuffles thousands of rows, not the
    // candidate flood
    candidates.union(shortPairs(strs, k)).distinct()
  }

  /** Degenerate-length path: a string shorter than k+1 cannot carry
    * k+1 nonempty segments (nor, at k=1, a nonempty deletion key);
    * its partners are at most 2k chars, so the all-pairs block is
    * confined to the <= 2k-char population.
    */
  private def shortPairs(strs: DataFrame, k: Int): DataFrame = {
    val spark = strs.sparkSession
    import spark.implicits._
    val shortSide = strs.where(length($"s") < k + 1)
    val shortPop = strs.where(length($"s") <= 2 * k)
    shortSide.select($"s".as("x"))
      .crossJoin(shortPop.select($"s".as("y")))
      .where($"x" =!= $"y")
      .select(least($"x", $"y").as("a"), greatest($"x", $"y").as("b"))
      .withColumn("ed", levenshtein($"a", $"b", k))
      .where($"ed".between(1, k))
  }

  /** k=1 candidates via position-tagged deletion neighborhoods.
    *
    * Every string of length >= 2 emits itself (tag -1) and its L
    * single-deletion variants (tag = deleted position). Two distinct
    * strings are within edit distance 1 iff they share a key with
    * compatible tags: equal tags >= 0 is a substitution at that
    * position; a tag -1 meeting a deletion tag is an indel. Matching
    * keys with equal non-negative tags force equality everywhere but
    * that position, and a self key equal to a deletion variant IS the
    * indel — so survivors are true pairs by construction; the
    * levenshtein verify is kept as a uniform belt-and-braces filter
    * over output-sized rows.
    *
    * Skew: a hot deletion key means MANY strings differing only at
    * one position — genuinely quadratic OUTPUT, not scheme slop — so
    * the same replicate-one-side salting as the PassJoin path spreads
    * each hot key's pair block across `saltBuckets` tasks.
    */
  private def deletionCandidates(strs: DataFrame, saltDfCap: Int,
      saltBuckets: Int): DataFrame = {
    val spark = strs.sparkSession
    import spark.implicits._
    val emit = udf((s: String) => {
      val out = new scala.collection.mutable.ArrayBuffer[DelEmit](s.length + 1)
      out += DelEmit(-1, s)
      var i = 0
      while (i < s.length) {
        out += DelEmit(i, s.substring(0, i) + s.substring(i + 1))
        i += 1
      }
      out.toSeq
    })
    val eligible = strs.where(length($"s") >= 2)
    val idxRaw = eligible
      .select($"s".as("a"), explode(emit($"s")).as("e"))
      .select($"a", $"e.tag".as("ta"), $"e.key")
    val probeRaw = eligible
      .select($"s".as("b"), explode(emit($"s")).as("e"))
      .select($"b", $"e.tag".as("tb"), $"e.key")
    val hotKeys = idxRaw.groupBy($"key")
      .agg(count(lit(1)).as("df"))
      .where($"df" > saltDfCap)
      .select($"key")
    // same single-task-flood reasoning as the PassJoin path: pin a
    // shuffled hash join on fixed-count repartitions so the hot key's
    // (true-pair) output block parallelizes instead of broadcasting
    val idx = idxRaw
      .join(broadcast(hotKeys.withColumn("hot", lit(true))),
        Seq("key"), "left")
      .withColumn("salt",
        when($"hot", pmod(hash($"a"), lit(saltBuckets)))
          .otherwise(lit(0)))
      .select($"a", $"ta", $"key", $"salt")
      .repartition(saltBuckets, $"key", $"salt")
    val probe = probeRaw
      .join(broadcast(hotKeys.withColumn("hot", lit(true))),
        Seq("key"), "left")
      .withColumn("salt", explode(
        when($"hot", sequence(lit(0), lit(saltBuckets - 1)))
          .otherwise(array(lit(0)))))
      .select($"b", $"tb", $"key", $"salt")
      .repartition(saltBuckets, $"key", $"salt")
    idx.hint("shuffle_hash").join(probe, Seq("key", "salt"))
      .where($"a" < $"b" &&
        ($"ta" === $"tb" || $"ta" === -1 || $"tb" === -1))
      .withColumn("ed", levenshtein($"a", $"b", 1))
      .where($"ed" === 1)
      .select($"a", $"b", $"ed")
  }
}
