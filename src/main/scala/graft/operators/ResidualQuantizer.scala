package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Residual (multi-stage) vector quantization — the additive
  * complement of [[ProductQuantizer]]'s slicing: instead of splitting
  * the vector and coding each slice, RVQ codes the WHOLE vector
  * against a level-0 codebook, then codes the residual
  * `v - c[code0]` against a level-1 codebook, and so on — L codes of
  * log2(K) bits whose decoded sum approximates v. The same code
  * budget as PQ but additive structure: each level halves-ish the
  * error the previous level left, which favors distributions with a
  * dominant direction (PQ favors independent subspaces; a complete
  * engine offers both, as the reference's PQ pipeline
  * (lantern_cli/src/pq/quantization.rs) is the slicing half only).
  *
  * Distances use an INTEGER micro-grid — per-dim squared error
  * `floor(d*d * 1e6 + 0.5)` summed as BIGINT — so the argmin is
  * associativity-proof and engine-exact: DuckDB restates the whole
  * two-level assignment bit for bit (the q_pq_reconstruction stance
  * extended to the codebook scan itself; a double-accumulated sum
  * would be re-association-sensitive at 64 dims). Ties break to the
  * smallest centroid_id, mirroring [[ProductQuantizer
  * .nearestCentroid]].
  *
  * 100 TB posture: codebooks are L×K small rows — broadcast; encoding
  * is embarrassingly parallel (L·K grid distances per row, no
  * shuffle); codes are L ints per vector. Fitting (k-means per level
  * over residuals) reuses the PQ fitter per level on materialized
  * residuals — each level is one bounded Spark job.
  */
object ResidualQuantizer {

  /** Integer micro-grid squared L2 — the engine-exact distance. */
  def gridL2(a: Array[Double], b: Array[Double]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) {
      val d = a(i) - b(i)
      s += math.floor(d * d * 1000000.0 + 0.5).toLong
      i += 1
    }
    s
  }

  /** Smallest-id argmin over grid distances. */
  def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val d = gridL2(centroids(c), v)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Encode one vector against per-level codebooks: code the vector,
    * subtract the chosen centroid, recurse on the residual.
    */
  def encode(levels: Array[Array[Array[Double]]],
      v: Array[Double]): Array[Int] = {
    val out = new Array[Int](levels.length)
    var r = v
    var l = 0
    while (l < levels.length) {
      val c = nearest(levels(l), r)
      out(l) = c
      val cen = levels(l)(c)
      val nr = new Array[Double](r.length)
      var i = 0
      while (i < r.length) { nr(i) = r(i) - cen(i); i += 1 }
      r = nr
      l += 1
    }
    out
  }

  /** Collect a (level INT, centroid_id INT, c ARRAY<FLOAT|DOUBLE>)
    * codebook frame to nested local arrays, centroids ordered by id
    * per level (the tie-break order). Codebooks are small by
    * contract — L×K rows.
    */
  def localize(codebooks: DataFrame): Array[Array[Array[Double]]] = {
    val rows = codebooks.select(col("level").cast("int"),
        col("centroid_id").cast("int"),
        col("c").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cs) =>
      cs.sortBy(_._2).map(_._3)
    }.toArray
  }

  /** Level codebooks → expression param (structural equality with a
    * cached hash — see FloatCubeParam's scaladoc).
    */
  private def localIndexed(lv: Array[Array[Array[Double]]])
      : graft.functions.DoubleCubeParam =
    new graft.functions.DoubleCubeParam(lv)

  /** Append `outCol` = ARRAY<INT> of one code per level. Codegen
    * expression (RvqEncode): the encode touches every corpus row, so
    * the former boxed-Seq UDF both copied each vector and dropped the
    * stage out of whole-stage codegen.
    */
  def quantizeColumn(df: DataFrame, vecCol: String, outCol: String,
      codebooks: DataFrame): DataFrame =
    df.withColumn(outCol, graft.functions.VectorFunctions.col(
      graft.functions.RvqEncode(
        graft.functions.VectorFunctions.expr(
          col(vecCol).cast("array<double>")),
        localIndexed(localize(codebooks)))))

  /** Fit per-level codebooks: k-means the vectors (level 0), assign,
    * subtract, k-means the residuals (level 1), and so on — each
    * level one bounded reuse of [[ProductQuantizer.fitCodebook]] at
    * splits=1 (the full-vector special case of its seeded
    * deterministic fitter). Returns (level, centroid_id,
    * c ARRAY<DOUBLE>). L is small by contract (2-4); the per-level
    * residual frame is a plain projection, so lineage stays L plans
    * deep.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, clusters: Int,
      levels: Int, maxIter: Int = 10): DataFrame = {
    require(levels >= 1 && levels <= 8,
      s"levels must be in [1, 8], got $levels")
    var cur = df.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
    val parts = (0 until levels).map { l =>
      val cb = ProductQuantizer.fitCodebook(
        cur.select(col(idCol), col("__v").cast("array<float>")
          .as("__vf")), idCol, "__vf", clusters, splits = 1,
        maxIter = maxIter)
      val cbl = cb.select(lit(l).as("level"), col("centroid_id"),
        col("c").cast("array<double>").as("c"))
      if (l < levels - 1) {
        val coded = quantizeColumn(cur, "__v", "__codes", cbl)
        cur = reconstructColumn(coded, "__codes", "__rec", cbl)
          .select(col(idCol),
            expr("zip_with(__v, __rec, (a, b) -> a - b)").as("__v"))
      }
      cbl
    }
    parts.reduce(_ unionByName _)
  }

  /** Append `outCol` = the decoded approximation (elementwise sum of
    * the selected centroid per level) as ARRAY<DOUBLE>.
    */
  def reconstructColumn(df: DataFrame, codesCol: String,
      outCol: String, codebooks: DataFrame): DataFrame =
    df.withColumn(outCol, graft.functions.VectorFunctions.col(
      graft.functions.RvqDecode(
        graft.functions.VectorFunctions.expr(col(codesCol)),
        localIndexed(localize(codebooks)))))
}
