package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScalarQuantizerSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("codes stay in [0, 255]; corpus min/max hit the rails") {
    val model = ScalarQuantizer.fit(emb, "embedding")
    val q = ScalarQuantizer.quantize(emb, "embedding", "sq", model)
      .select(explode($"sq").as("c"))
    val mm = q.agg(min($"c"), max($"c")).head()
    assert(mm.getShort(0) === 0)
    assert(mm.getShort(1) === 255)
    assert(q.where($"c" < 0 || $"c" > 255).count() === 0)
  }

  test("dequantize bounds the per-dimension error by half a step") {
    val model = ScalarQuantizer.fit(emb, "embedding")
    val q = ScalarQuantizer.quantize(emb, "embedding", "sq", model)
    val d = ScalarQuantizer.dequantize(q, "sq", "back", model)
    // max |x - x̂| per dim <= (mx - mn) / 255 / 2 (+ float cast slop)
    val spans = model.select(max($"mx" - $"mn")).head().getDouble(0)
    val maxErr = d.select(explode(
        zip_with($"embedding", $"back",
          (a, b) => abs(a.cast("double") - b.cast("double")))).as("e"))
      .agg(max($"e")).head().getDouble(0)
    assert(maxErr <= spans / 255.0 / 2.0 + 1e-6,
      s"maxErr $maxErr vs bound ${spans / 255.0 / 2.0}")
  }

  test("degenerate (constant) dimension codes to 0 and reconstructs " +
      "the constant") {
    val df = Seq((1L, Seq(1.0f, 7.5f)), (2L, Seq(2.0f, 7.5f)))
      .toDF("id", "v")
    val model = ScalarQuantizer.fit(df, "v")
    val q = ScalarQuantizer.quantize(df, "v", "sq", model)
    assert(q.select($"sq"(1)).as[Short].collect().toSet === Set(0.toShort))
    val back = ScalarQuantizer.dequantize(q, "sq", "b", model)
      .select($"b"(1)).as[Float].collect().toSet
    assert(back === Set(7.5f))
  }

  test("encode saturates out-of-range inputs to [0,255] instead of " +
      "wrapping (mismatched df/model is public API)") {
    val fitOn = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("id", "v")
    val model = ScalarQuantizer.fit(fitOn, "v")
    val outside = Seq((3L, Seq(-5.0f, 9.0f))).toDF("id", "v")
    val codes = ScalarQuantizer.quantize(outside, "v", "sq", model)
      .select($"sq").as[Seq[Short]].head()
    assert(codes === Seq(0.toShort, 255.toShort), s"wrapped: $codes")
  }

  test("kNN over SQ8 codes keeps recall >= 0.9 vs exact kNN (sf0.01)") {
    // The compression/recall trade the operator exists for: 8-bit
    // per-dim codes must not visibly degrade top-10 neighbor quality.
    val recalls = graft.SparkEntry.queries("q_sq_recall")(spark, sf001)
      .select($"recall").as[Double].collect()
    assert(recalls.length === 10)
    assert(recalls.forall(_ >= 0.9), s"low SQ8 recall: ${recalls.toSeq}")
  }

  test("quantization is a codegen'd projection: no shuffle after the " +
      "model fit, stage stays in whole-stage codegen") {
    val model = ScalarQuantizer.fit(emb, "embedding")
    model.count() // fit's exchange happens here, not in quantize
    val q = ScalarQuantizer.quantize(emb, "embedding", "sq", model)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"quantize must be shuffle-free:\n$p")
    // the '*' marks a WholeStageCodegen'd operator; an array HOF (or a
    // CodegenFallback expression) would de-compile the whole stage
    assert("\\*\\(\\d+\\) Project .*sq8_encode".r.findFirstIn(p).isDefined,
      s"sq8_encode must ride a compiled Project:\n$p")
  }
}
