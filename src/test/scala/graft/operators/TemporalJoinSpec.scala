package graft.operators

import java.sql.Timestamp

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(sec: Int): Timestamp =
    new Timestamp(1700000000000L + sec * 1000L)

  // left: lookups at t=5, 10, 30 for key 1; t=5 for key 2 (no rights)
  private def left = Seq(
    (1L, ts(5), 100L), (1L, ts(10), 101L), (1L, ts(30), 102L),
    (2L, ts(5), 200L)
  ).toDF("k", "ts", "lid")

  // right for key 1 at t=3, 10, 20 (t=10 equal to a left ts)
  private def right = Seq(
    (1L, ts(3), 900L), (1L, ts(10), 901L), (1L, ts(20), 902L)
  ).toDF("k", "ts", "rid")

  test("backward as-of picks greatest right ts <= left ts, inclusive") {
    val r = AsOfJoin.backward(left, right, "k", "ts", Seq("rid"))
      .select($"lid", $"rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(r(100L) === 900L) // t=5 → right t=3
    assert(r(101L) === 901L) // t=10 → inclusive equal match
    assert(r(102L) === 902L) // t=30 → right t=20
    assert(r(200L) === -1L)  // key 2 has no rights → null
  }

  test("equal-ts right rows resolve to largest tieBreak") {
    val dupRight = Seq((1L, ts(3), 900L), (1L, ts(3), 950L))
      .toDF("k", "ts", "rid")
    val r = AsOfJoin.backward(left, dupRight, "k", "ts", Seq("rid"),
        tieBreak = Some("rid"))
      .where($"lid" === 100L).select($"rid").as[Long].head()
    assert(r === 950L)
  }

  test("tolerance nulls out matches older than the horizon") {
    val r = AsOfJoin.backward(left, right, "k", "ts", Seq("rid"),
        toleranceUs = Some(3L * 1000000))
      .select($"lid", $"rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toMap
    assert(r(100L) === 900L) // gap 2s <= 3s
    assert(r(101L) === 901L) // gap 0
    assert(r(102L) === -1L)  // gap 10s > 3s → no match
  }

  test("range join emits pairs in (0, window], exactly once") {
    val a = Seq((1L, ts(0), 1L), (1L, ts(100), 2L)).toDF("k", "ts", "id")
    val b = Seq(
      (1L, ts(0), 10L),   // gap 0 → excluded (strict lower bound)
      (1L, ts(60), 11L),  // gap 60 from a1 (== window, included)
      (1L, ts(61), 12L),  // gap 61 from a1 → excluded; not near a2
      (1L, ts(160), 13L)  // gap 60 from a2 (cross-bucket probe)
    ).toDF("k", "ts", "id")
    val pairs = RangeJoin.pairsWithin(a, b, "k", "ts", "id",
        windowUs = 60L * 1000000)
      .select($"i", $"j", $"gap_us").as[(Long, Long, Long)]
      .collect().toSet
    assert(pairs === Set((1L, 11L, 60000000L), (2L, 13L, 60000000L)))
  }

  test("range join handles a hot key without duplicates") {
    val rows = (0 until 200).map(i => (7L, ts(i), i.toLong))
    val df = rows.toDF("k", "ts", "id")
    val pairs = RangeJoin.pairsWithin(df, df, "k", "ts", "id",
        windowUs = 10L * 1000000)
      .select($"i", $"j").as[(Long, Long)].collect()
    // each of 200 rows pairs forward with up to 10 successors
    val expected = (for {
      i <- 0 until 200; j <- (i + 1) to math.min(i + 10, 199)
    } yield (i.toLong, j.toLong)).toSet
    assert(pairs.toSet === expected)
    assert(pairs.length === expected.size) // exactly-once, no dup probes
  }
}
