package graft.operators

import graft.SparkSuite
import graft.operators.DataQuality._
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSuite {
  import spark.implicits._

  // 5 rows: one null id, one duplicated (k, seq) key, one value out
  // of range, one flag outside {A, B}, one orphan ref
  private lazy val t = Seq(
    (Option(1L), 1, 10.0, "A", Option(100L)),
    (Option(2L), 1, 10.0, "B", Option(100L)),
    (Option(2L), 1, 99.0, "A", Option(200L)),   // dup key + range
    (Option(3L), 2, 10.0, "X", Option(999L)),   // bad flag + orphan
    (None, 3, 10.0, "A", None))                 // null id, null ref
    .toDF("id", "seq", "v", "flag", "fk")
  private lazy val dim = Seq(100L, 200L).toDF("pk")

  private def result(): Map[String, (Long, Long, Boolean)] =
    DataQuality.validate(t, Seq(
        NotNull("id"),
        Unique(Seq("id", "seq")),
        Satisfies("v_range", "v >= 0 AND v <= 50"),
        InSet("flag", Seq("A", "B")),
        RefIn("fk", dim, "pk")))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap

  test("each check type counts its violations over one table") {
    val r = result()
    assert(r("not_null(id)") == ((5L, 1L, false)))
    // rows 2 and 3 share key (2, 1): both rows count
    assert(r("unique(id,seq)") == ((5L, 2L, false)))
    assert(r("satisfies(v_range)") == ((5L, 1L, false)))
    assert(r("in_set(flag)") == ((5L, 1L, false)))
    // the NULL fk is skipped; 999 is the one orphan
    assert(r("ref_in(fk)") == ((5L, 1L, false)))
  }

  test("a clean table passes every check") {
    val clean = Seq((1L, 1, 10.0, "A", 100L), (2L, 1, 20.0, "B", 200L))
      .toDF("id", "seq", "v", "flag", "fk")
    val out = DataQuality.validate(clean, Seq(
        NotNull("id"), Unique(Seq("id")),
        Satisfies("v", "v < 100"), InSet("flag", Seq("A", "B")),
        RefIn("fk", dim, "pk")))
      .collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(2) == 0L && r.getBoolean(3)))
  }

  test("NULL predicate results are strict violations") {
    val d = Seq((Option(5.0)), (None)).toDF("v")
    val out = DataQuality.validate(d,
      Seq(Satisfies("pos", "v > 0"))).collect()(0)
    assert(out.getLong(2) == 1L)
  }

  test("profile reports nulls, distinct, and string min/max per column") {
    val d = Seq((Option(3L), "b"), (Option(1L), "a"), (None, "b"))
      .toDF("x", "s")
    val p = DataQuality.profile(d, Seq("x", "s"))
      .orderBy($"col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5)))
    assert(p.toSeq == Seq(
      ("s", 3L, 0L, 2L, "a", "b"),
      ("x", 3L, 1L, 2L, "1", "3")))
  }

  test("guards: empty checks, duplicate names, empty profile") {
    intercept[IllegalArgumentException] {
      DataQuality.validate(t, Nil)
    }
    intercept[IllegalArgumentException] {
      DataQuality.validate(t, Seq(NotNull("id"), NotNull("id")))
    }
    intercept[IllegalArgumentException] {
      DataQuality.profile(t, Nil)
    }
  }
}
