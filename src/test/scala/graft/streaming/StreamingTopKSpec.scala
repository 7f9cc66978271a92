package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingTopKSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("streamtopk").toString

  test("snapshot tracks exact cumulative counts across micro-batches " +
      "when capacity exceeds the item domain") {
    implicit val sqlCtx = spark.sqlContext
    val (out, ckp) = (tmp(), tmp())
    val mem = MemoryStream[String]
    val q = StreamingTopK.start(mem.toDF().toDF("item"), "item",
      k = 3, capacity = 256, out, ckp)
    mem.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
    q.processAllAvailable()
    def snap() = spark.read.parquet(out)
      .orderBy($"est".desc, $"item").as[(String, Long)].collect().toSeq
    assert(snap() === Seq(("a", 5L), ("b", 3L), ("c", 1L)))
    // batch 2 flips the order: counts must be CUMULATIVE over the
    // whole prefix (the merged buffer is the state), not per-batch
    mem.addData(Seq.fill(6)("b") ++ Seq.fill(2)("c"): _*)
    q.processAllAvailable()
    q.stop()
    assert(snap() === Seq(("b", 9L), ("a", 5L), ("c", 3L)))
  }

  test("under eviction the planted heavy item survives the whole " +
      "stream and state stays bounded by capacity") {
    implicit val sqlCtx = spark.sqlContext
    val (out, ckp) = (tmp(), tmp())
    val mem = MemoryStream[String]
    // capacity 32 ≪ 2000-item tail domain: constant eviction. The
    // heavy item holds ~20% of the mass — far above N/(capacity+1) —
    // so the mergeable bound guarantees it in every snapshot.
    val q = StreamingTopK.start(mem.toDF().toDF("item"), "item",
      k = 5, capacity = 32, out, ckp)
    val rnd = new scala.util.Random(3)
    (0 until 3).foreach { _ =>
      val batch = Seq.fill(400)("HEAVY") ++
        (0 until 1600).map(_ => s"t_${rnd.nextInt(2000)}")
      mem.addData(rnd.shuffle(batch): _*)
      q.processAllAvailable()
      val top = spark.read.parquet(out)
        .orderBy(org.apache.spark.sql.functions.col("est").desc)
        .as[(String, Long)].collect()
      assert(top.head._1 === "HEAVY", top.mkString(", "))
      assert(top.length <= 5)
    }
    q.stop()
  }

  test("restart from the checkpoint resumes the merged sketch instead " +
      "of starting over") {
    implicit val sqlCtx = spark.sqlContext
    val (out, ckp) = (tmp(), tmp())
    val mem = MemoryStream[String]
    val df = mem.toDF().toDF("item")
    val q1 = StreamingTopK.start(df, "item", k = 2, capacity = 64,
      out, ckp)
    mem.addData(Seq.fill(4)("x") ++ Seq.fill(2)("y"): _*)
    q1.processAllAvailable()
    q1.stop()
    // new query, same checkpoint: the buffer must carry the old counts
    val q2 = StreamingTopK.start(df, "item", k = 2, capacity = 64,
      out, ckp)
    mem.addData(Seq.fill(3)("y"): _*)
    q2.processAllAvailable()
    q2.stop()
    val top = spark.read.parquet(out)
      .orderBy($"est".desc, $"item").as[(String, Long)].collect().toSeq
    assert(top === Seq(("y", 5L), ("x", 4L)))
  }
}
