package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** PassJoin-style edit-distance similarity join: segmentation
  * arithmetic, completeness against a brute-force oracle (the property
  * the signature scheme must not lose), short-string degenerate path,
  * and the no-all-pairs plan shape.
  */
class EditDistanceJoinSpec extends SparkSuite {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("segments: k+1 parts, near-even, concatenation restores") {
    for (s <- Seq("abcdefgh", "abc", "abcdefghijk"); k <- 1 to 3
         if s.length >= k + 1) {
      val segs = EditDistanceJoin.segments(s, k)
      assert(segs.size === k + 1)
      assert(segs.map(_._2).mkString === s)
      val lens = segs.map(_._2.length)
      assert(lens.max - lens.min <= 1)
      assert(lens.sorted.reverse === lens) // longer segments first
    }
  }

  test("complete vs brute force on a typo-dense vocabulary") {
    val vocab = Seq("spark", "spank", "spurk", "sprk", "sparkle",
      "shark", "stark", "start", "smart", "chart", "charts", "chard",
      "a", "ab", "ba", "b", "abc", "xyz", "spark", "park", "dark",
      "darkness", "bark", "barks", "marks", "sparks")
    for (k <- 1 to 2) {
      val expected = vocab.distinct.combinations(2).map(_.sorted)
        .map { case Seq(a, b) => (a, b, lev(a, b)) }
        .filter { case (_, _, e) => e >= 1 && e <= k }
        .toSet
      val got = EditDistanceJoin.pairs(vocab.toDF("s"), "s", k)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getInt(2))).toSet
      assert(got === expected, s"k=$k")
    }
  }

  test("multi-match-aware window stays complete on random strings") {
    // the tightened probe window ([p_i-(i-1), p_i+(i-1)] ∩
    // [p_i+Δ-(k+1-i), p_i+Δ+(k+1-i)]) must lose NO pair; stress it
    // with a seeded random corpus dense in near-misses across a
    // range of lengths, for every supported k
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd" // tiny alphabet → lots of close pairs
    val vocab = (1 to 180).map { _ =>
      val n = 1 + rnd.nextInt(12)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    for (k <- 1 to 3) {
      val expected = vocab.combinations(2).map(_.sorted)
        .map { case Seq(a, b) => (a, b, lev(a, b)) }
        .filter { case (_, _, e) => e >= 1 && e <= k }
        .toSet
      val got = EditDistanceJoin.pairs(vocab.toDF("s"), "s", k)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getInt(2))).toSet
      assert(got === expected, s"k=$k")
    }
  }

  test("short strings (below k+1 chars) pair through the short path") {
    val vocab = Seq("a", "b", "ab", "xy", "x", "")
    val got = EditDistanceJoin.pairs(vocab.toDF("s"), "s", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = vocab.distinct.combinations(2).map(_.sorted)
      .collect { case Seq(a, b) if lev(a, b) == 1 => (a, b) }.toSet
    assert(got === expected)
  }

  test("part-name face finds the known 24 pairs at sf0.001") {
    val part = spark.read.parquet(s"$sf001/part.parquet")
    val pairs = EditDistanceJoin.pairs(part, "p_name", 2).collect()
    assert(pairs.length === 24)
    pairs.foreach { r =>
      assert(lev(r.getString(0), r.getString(1)) === r.getInt(2))
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 2)
    }
  }

  test("plan: signature equi-join, not a cartesian of the corpus") {
    val part = spark.read.parquet(s"$sf001/part.parquet")
    val plan = EditDistanceJoin.pairs(part, "p_name", 2)
      .queryExecution.executedPlan.toString
    // the only cartesian allowed is the bounded <=2k-char short block
    // (empty here: every part name is longer), never the corpus join
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"expected an equi-join on segment keys in:\n$plan")
  }
}
