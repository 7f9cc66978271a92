package graft

import graft.SparkSuite
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftshim.GraftShims

/** The `spark.sql.extensions=graft.GraftExtensions` install path: what
  * a stock cluster's session would get from the config line alone.
  * (The end-to-end spark-shell drive of the same config is part of the
  * verify recipe; here the injections are asserted directly through
  * the extensions object.)
  */
class GraftExtensionsSpec extends SparkSuite {

  private def applied(): SparkSessionExtensions = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    ext
  }

  test("injects the planner-transparent ANN rule and the rollup " +
      "rewrite rule") {
    val rules = GraftShims.extensionOptimizerRules(applied(), spark)
    assert(rules.contains(graft.plans.IndexedKnnRule))
    assert(rules.contains(graft.plans.SummaryRewriteRule))
  }

  test("injects every expression-backed SQL function, and only those") {
    val names = GraftShims.extensionFunctionNames(applied()).toSet
    val expected =
      (graft.functions.VectorFunctions.builders ++
        graft.functions.TextFunctions.builders).map(_._1).toSet
    assert(names === expected)
    // the headline surfaces really are on the list
    for (n <- Seq("l2sq_dist", "bq_encode", "bq_hamming", "sketch_topk",
        "topk_by_score", "simhash64", "winnow"))
      assert(names.contains(n), s"missing $n")
    // UDF-backed model functions are documented as GraftSession-only
    assert(!names.contains("text_embedding"))
  }

  test("an injected builder constructs a working expression") {
    // resolve through the same builder tuple the extension injects:
    // the function value must build an evaluable Catalyst expression
    val b = graft.functions.VectorFunctions.builders.toMap
      .apply("bq_hamming")
    val enc = graft.functions.VectorFunctions.builders.toMap
      .apply("bq_encode")
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    def lit(v: Array[Float]) =
      Literal(ArrayData.toArrayData(v), ArrayType(FloatType))
    val hd = b(Seq(enc(Seq(lit(Array(1f, -2f, 3f)))),
      enc(Seq(lit(Array(-1f, -2f, 3f)))))).eval(null)
    assert(hd === 1L)
  }
}
