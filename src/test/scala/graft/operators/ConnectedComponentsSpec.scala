package graft.operators

import graft.SparkSuite

class ConnectedComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("clique, chain, and isolated pair all label to component min") {
    // clique {1,2,3}, chain 10-11-12-13-14 (diameter 4), pair {20,21}
    val got = cc(Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("long chain converges past many rounds (label travels end to end)") {
    // 0-1-2-...-15: min label 0 must reach vertex 15 (diameter 15)
    val got = cc((0L until 15L).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L))
  }

  test("merging bridges: two cliques joined by one edge form one component") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (7L, 8L), (8L, 9L), (3L, 7L)))
    assert(got.values.toSet == Set(1L))
  }

  test("vertices appear exactly once and only graph vertices appear") {
    val pairs = Seq((5L, 9L), (9L, 5L), (2L, 4L))
    val rows = Dedup.connectedComponents(pairs.toDF("i", "j")).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L, 5L, 9L))
  }

  private def ccAlt(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponentsAlternating(pairs.toDF("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alternating: clique, chain, and pair match the propagation labels") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (20L, 21L))
    assert(ccAlt(pairs) == cc(pairs))
  }

  test("alternating: 200-vertex path needs far fewer than diameter rounds") {
    // Diameter 200: propagation needs ~200 rounds; large-star/small-star
    // is O(log² n). maxRounds=12 would leave propagation wrong but must
    // suffice here.
    val pairs = (0L until 200L).map(i => (i, i + 1))
    val got = Dedup.connectedComponentsAlternating(
      pairs.toDF("i", "j"), maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 201 && got.values.toSet == Set(0L))
  }

  test("alternating: seeded random graphs agree with propagation") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 60
      val pairs = (1 to 80).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(ccAlt(pairs) == cc(pairs))
    }
  }

  test("alternating: self-pair-only vertex labels to itself") {
    val got = ccAlt(Seq((7L, 7L), (1L, 2L)))
    assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("corpus pairs roll up consistently with pair-level removal") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ps = pairs.select("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // every pair is within one component; a representative (component
    // min) can never be any pair's j — its i is smaller and connected
    assert(ps.forall { case (i, j) => comp(i) == comp(j) })
    assert(comp.values.toSet.intersect(ps.map(_._2).toSet).isEmpty)
  }
}
