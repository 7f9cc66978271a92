package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension int8) vector quantization — the storage
  * compression an embedding corpus needs at 100 TB: 4x less scan I/O
  * than float32 with a per-dimension affine model, the standard SQ8
  * scheme vector stores pair with coarse indexes (reference capability
  * analog: the PQ/quantize_vector surface, `lantern_extras/src/pq.rs`;
  * SQ8 is its codebook-free sibling for when recall must stay near
  * exact).
  *
  * Model = per-dimension (min, max) over the corpus — DIM rows, a
  * bounded model like the PQ codebook, NEVER data-sized. Fitting is
  * one partial-aggregated pass (posexplode → groupBy(pos) min/max:
  * map-side combine reduces every partition to DIM rows before the
  * one exchange). Quantization/dequantization are pure projections
  * against the broadcast model — zero shuffle, whole-stage codegen
  * (built-in `transform`/`zip_with` lambdas, no UDFs).
  *
  * Exactness: code = floor((x - mn) * 255 / (mx - mn) + 0.5) computed
  * in double — IEEE -, *, /, floor are correctly rounded, so any
  * engine reproduces the codes bit-for-bit (the q_vec_scalar_quant
  * oracle does). Degenerate dimensions (mx == mn) code to 0.
  */
object ScalarQuantizer {

  /** Per-dimension model: (pos INT, mn DOUBLE, mx DOUBLE). */
  def fit(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))

  /** Collect the DIM-row model into literal arrays (bounded by vector
    * dimension, not corpus size).
    */
  private def localize(model: DataFrame): (Array[Double], Array[Double]) = {
    val rows = model.select(col("pos"), col("mn"), col("mx"))
      .collect().sortBy(_.getInt(0))
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Add `outCol` = ARRAY<SMALLINT> of per-dim codes in [0, 255].
    * Native codegen-friendly expression (not an array HOF, which would
    * drop the whole stage out of whole-stage codegen).
    */
  def quantize(df: DataFrame, vecCol: String, outCol: String,
      model: DataFrame): DataFrame = {
    val (mn, mx) = localize(model)
    df.withColumn(outCol, graft.functions.VectorFunctions.col(
      graft.functions.Sq8Encode(
        graft.functions.VectorFunctions.expr(col(vecCol)),
        new graft.functions.DoubleVecParam(mn),
        new graft.functions.DoubleVecParam(mx))))
  }

  /** Reconstruct float vectors from codes: x̂ = mn + code/255 * (mx-mn). */
  def dequantize(df: DataFrame, codeCol: String, outCol: String,
      model: DataFrame): DataFrame = {
    val (mn, mx) = localize(model)
    df.withColumn(outCol, graft.functions.VectorFunctions.col(
      graft.functions.Sq8Decode(
        graft.functions.VectorFunctions.expr(col(codeCol)),
        new graft.functions.DoubleVecParam(mn),
        new graft.functions.DoubleVecParam(mx))))
  }
}
