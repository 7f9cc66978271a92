package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}
import graft.operators.ProductQuantizer

/** Product-quantization coverage (SURVEY §2.10 Q1-Q9).
  *
  * `q_pq_assign_fixed` pins the codebook to a deterministic non-fitted
  * construction (slices of the first 16 vectors) so the argmin
  * assignment operator itself is DuckDB-oracle-checkable; the fitted
  * k-means queries are rows-only (no k-means in the oracle engine) and
  * their invariants live in PqSpec.
  */
object PqQueries {
  private implicit class ColName(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column = col(sc.s(args: _*))
  }
  import OracleFrag.dkL2sq

  private val Splits = 8
  private val FixedCentroids = 16

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** The frozen OPQ face's rotation: a Hadamard-style butterfly
    * pairing dimension i with i+32 — orthonormal (hence an isometry),
    * two double ops per output dim, restatable token for token in any
    * engine. Computed in double, stored as float (the PQ pipeline's
    * storage type; IEEE round-to-nearest in both engines).
    */
  private def opqButterfly(v: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val inv = lit(0.7071067811865476)
    array((0 until 64).map { i =>
      if (i < 32)
        (element_at(v, i + 1).cast("double") +
          element_at(v, i + 33).cast("double")) * inv
      else
        (element_at(v, i - 31).cast("double") -
          element_at(v, i + 1).cast("double")) * inv
    }: _*).cast("array<float>")
  }

  /** Codebook from the first FixedCentroids vectors' slices. Shared
    * with VectorQueries' q_ivfpq_adc_fixed, which scores ADC against
    * the same deterministic construction.
    */
  private[queries] def fixedCodebook(s: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val sub = dim / Splits
    val splitCols = (0 until Splits).map(sp =>
      struct(lit(sp).as("subvector_id"), $"vec_id".cast("int").as("centroid_id"),
        slice($"embedding", sp * sub + 1, sub).as("c")))
    emb(s, dir).where($"vec_id" < FixedCentroids)
      .select(explode(array(splitCols: _*)).as("r"))
      .select($"r.subvector_id", $"r.centroid_id", $"r.c")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q7 argmin assignment against the fixed codebook (oracle-checked).
    // Codes exploded to (vec_id, pos, code): the gate comparator can't
    // hash array cells.
    "q_pq_assign_fixed" -> ((s, dir) =>
      ProductQuantizer.quantizeColumn(
        emb(s, dir).select($"vec_id", $"embedding"),
        "embedding", "codes", fixedCodebook(s, dir))
        .select($"vec_id", posexplode($"codes".cast("array<int>")))
        .toDF("vec_id", "pos", "code")
        .orderBy($"vec_id", $"pos")),

    // OPQ pipeline under a FROZEN rotation: rotate -> slice -> argmin,
    // the exact operator chain an OPQ index runs per row, with the
    // rotation pinned to a deterministic orthonormal butterfly
    // (y_i = (x_i + x_{i+32})/sqrt2, y_{i+32} = (x_i - x_{i+32})/sqrt2)
    // so DuckDB restates every double op token for token (the LEARNED
    // rotation — PCA + eigenvalue allocation, Opq.fitRotation — is
    // iterative float math no independent engine reproduces; its
    // improvement invariant lives in PqSpec). Codebook = slices of the
    // first 16 ROTATED vectors, mirroring q_pq_assign_fixed.
    "q_pq_opq_fixed" -> ((s, dir) => {
      val e = emb(s, dir).select($"vec_id",
        opqButterfly($"embedding").as("r"))
      val sub = 64 / Splits
      val splitCols = (0 until Splits).map(sp =>
        struct(lit(sp).as("subvector_id"),
          $"vec_id".cast("int").as("centroid_id"),
          slice($"r", sp * sub + 1, sub).as("c")))
      val cb = e.where($"vec_id" < FixedCentroids)
        .select(explode(array(splitCols: _*)).as("x"))
        .select($"x.subvector_id", $"x.centroid_id", $"x.c")
      ProductQuantizer.quantizeColumn(e, "r", "codes", cb)
        .select($"vec_id", posexplode($"codes".cast("array<int>")))
        .toDF("vec_id", "pos", "code")
        .orderBy($"vec_id", $"pos")
    }),

    // Residual (two-stage) quantization under FROZEN codebooks: code
    // the whole vector against level-0 (the first 8 embeddings), then
    // code the residual against level-1 (the same centroids scaled by
    // 0.125 — a fixed derivation both engines restate exactly). The
    // additive complement of PQ's slicing; distances run on the
    // integer micro-grid (floor(d*d*1e6 + 0.5) summed as BIGINT) so
    // the argmin is associativity-proof and the WHOLE two-level
    // assignment hash-matches. Fitted codebooks (k-means per level on
    // residuals) are invariant-tested in ResidualQuantizerSpec.
    "q_rvq_assign_fixed" -> ((s, dir) => {
      val e = emb(s, dir)
      val cb0 = e.where($"vec_id" < 8)
        .select(lit(0).as("level"),
          $"vec_id".cast("int").as("centroid_id"),
          $"embedding".cast("array<double>").as("c"))
      val cb1 = e.where($"vec_id" < 8)
        .select(lit(1).as("level"),
          $"vec_id".cast("int").as("centroid_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE) * 0.125)")
            .as("c"))
      graft.operators.ResidualQuantizer.quantizeColumn(
          e.select($"vec_id", $"embedding"), "embedding", "codes",
          cb0.unionByName(cb1))
        .select($"vec_id", posexplode($"codes"))
        .toDF("vec_id", "level", "code")
        .orderBy($"vec_id", $"level")
    }),

    // Q5 fitted codebook (rows-only; shape checked in PqSpec too).
    "q_pq_codebook" -> ((s, dir) =>
      ProductQuantizer.fitCodebook(emb(s, dir), "vec_id", "embedding",
        clusters = 16, splits = Splits, maxIter = 10)
        .select($"subvector_id", $"centroid_id", posexplode($"c"))
        .toDF("subvector_id", "centroid_id", "pos", "val")
        .orderBy($"subvector_id", $"centroid_id", $"pos")),

    // Q7/Q8 quantize against the fixed codebook, emitting the packed
    // PQ code WORD per vector (codes 0..15 in 4 bits × 8 splits = one
    // 32-bit word) — the byte string a PQ index actually stores, and a
    // pure-integer value DuckDB restates exactly. The fitted-codebook
    // pipeline stays covered by q_pq_codebook (rows-only) + PqSpec.
    "q_pq_quantize" -> ((s, dir) => {
      val e = emb(s, dir).select($"vec_id", $"embedding")
      ProductQuantizer.quantizeColumn(e, "embedding", "v_pq",
        fixedCodebook(s, dir))
        .select($"vec_id",
          (0 until Splits).map(i =>
            shiftleft(element_at($"v_pq".cast("array<bigint>"), i + 1),
              i * 4))
            .reduce(_ + _).as("packed_code"))
    }),

    // Q8 reconstruction error per vector, quantize → dequantize against
    // the fixed codebook. Each dimension's squared error is floored to
    // an integer number of 1e-6 units BEFORE summation, so the
    // aggregate is exact integer arithmetic in any engine (raw double
    // sums would hash-diverge on summation order). Vectors that ARE
    // codebook rows (vec_id < 16) reconstruct exactly → err_q = 0.
    "q_pq_reconstruction" -> ((s, dir) => {
      val e = emb(s, dir).select($"vec_id", $"embedding")
      val cb = fixedCodebook(s, dir)
      val q = ProductQuantizer.quantizeColumn(e, "embedding", "v_pq", cb)
      val d = ProductQuantizer.dequantizeColumn(q, "v_pq", "v_hat", cb)
      d.select($"vec_id",
        aggregate(
          zip_with($"embedding", $"v_hat", (x, y) =>
            floor(((x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))) * lit(1000000.0)
              + lit(0.5)).cast("bigint")),
          lit(0L), (acc, t) => acc + t).as("err_q"))
    })
  )

  // Shared restatement of the fixed codebook + argmin assignment; the
  // oracles here (and q_ivfpq_adc_fixed in VectorQueries) differ only
  // in what they emit from the rn=1 rows.
  private val SubDim = 8
  private[queries] lazy val fixedAssignBase: String =
    s"""WITH sp AS (SELECT unnest(range(0, $Splits)) AS split_id),
       |cb AS (
       |  SELECT sp.split_id, CAST(vec_id AS INT) AS centroid_id,
       |         embedding[sp.split_id*$SubDim+1 : sp.split_id*$SubDim+$SubDim] AS b_c
       |  FROM embeddings, sp WHERE vec_id < $FixedCentroids),
       |sub AS (
       |  SELECT e.vec_id, sp.split_id,
       |         embedding[sp.split_id*$SubDim+1 : sp.split_id*$SubDim+$SubDim] AS a_sv
       |  FROM embeddings e, sp),
       |scored AS (
       |  SELECT sub.vec_id, sub.split_id, cb.centroid_id, a_sv, b_c,
       |    row_number() OVER (PARTITION BY sub.vec_id, sub.split_id
       |      ORDER BY ${dkL2sq("a_sv", "b_c")}, cb.centroid_id) AS rn
       |  FROM sub JOIN cb ON sub.split_id = cb.split_id)""".stripMargin

  val oracleSql: Map[String, String] = {
    val svA = "a_sv"
    val svB = "b_c"
    val base = fixedAssignBase
    // per-dim squared error in exact-multiply form (never ^2: the two
    // engines' pow() may differ in the last ulp; IEEE * cannot)
    val sqTerm =
      s"(CAST($svA[i] AS DOUBLE) - CAST($svB[i] AS DOUBLE)) * " +
        s"(CAST($svA[i] AS DOUBLE) - CAST($svB[i] AS DOUBLE))"
    Map(
      "q_pq_assign_fixed" ->
        s"""$base
           |SELECT vec_id, CAST(split_id AS INT) AS pos,
           |  CAST(centroid_id AS INT) AS code
           |FROM scored WHERE rn = 1 ORDER BY vec_id, pos""".stripMargin,

      "q_pq_quantize" ->
        s"""$base
           |SELECT vec_id,
           |  CAST(sum(CAST(centroid_id AS BIGINT)
           |    << (CAST(split_id AS INT) * 4)) AS BIGINT) AS packed_code
           |FROM scored WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

      // the frozen-rotation face: identical assignment pipeline over
      // the butterfly-rotated embedding — (x_i + x_{i+32})/sqrt2 in
      // DOUBLE then rounded to REAL, token for token what the Spark
      // side computes
      "q_pq_opq_fixed" ->
        s"""WITH r0 AS (
           |  SELECT vec_id, list_transform(range(0, 64), i -> CASE
           |    WHEN i < 32 THEN CAST((CAST(embedding[i+1] AS DOUBLE)
           |      + CAST(embedding[i+33] AS DOUBLE))
           |      * 0.7071067811865476 AS REAL)
           |    ELSE CAST((CAST(embedding[i-31] AS DOUBLE)
           |      - CAST(embedding[i+1] AS DOUBLE))
           |      * 0.7071067811865476 AS REAL) END) AS r
           |  FROM embeddings),
           |sp AS (SELECT unnest(range(0, $Splits)) AS split_id),
           |cb AS (
           |  SELECT sp.split_id, CAST(vec_id AS INT) AS centroid_id,
           |         r[sp.split_id*$SubDim+1 : sp.split_id*$SubDim+$SubDim] AS b_c
           |  FROM r0, sp WHERE vec_id < $FixedCentroids),
           |sub AS (
           |  SELECT e.vec_id, sp.split_id,
           |         r[sp.split_id*$SubDim+1 : sp.split_id*$SubDim+$SubDim] AS a_sv
           |  FROM r0 e, sp),
           |scored AS (
           |  SELECT sub.vec_id, sub.split_id, cb.centroid_id,
           |    row_number() OVER (PARTITION BY sub.vec_id, sub.split_id
           |      ORDER BY ${dkL2sq("a_sv", "b_c")}, cb.centroid_id) AS rn
           |  FROM sub JOIN cb ON sub.split_id = cb.split_id)
           |SELECT vec_id, CAST(split_id AS INT) AS pos,
           |  CAST(centroid_id AS INT) AS code
           |FROM scored WHERE rn = 1 ORDER BY vec_id, pos""".stripMargin,

      "q_pq_reconstruction" ->
        s"""$base
           |SELECT vec_id, CAST(sum(e) AS BIGINT) AS err_q
           |FROM (
           |  SELECT vec_id, list_sum(list_transform(range(1, len($svA)+1),
           |    i -> CAST(floor($sqTerm * 1000000 + 0.5) AS BIGINT))) AS e
           |  FROM scored WHERE rn = 1) _t
           |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

      // the residual-quantizer restatement: exact-double residuals,
      // integer micro-grid distances (associativity-proof), smallest
      // centroid_id on ties — every step the Scala encoder takes
      "q_rvq_assign_fixed" ->
        """WITH cb0 AS (
          |  SELECT CAST(vec_id AS INT) AS cid,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS c
          |  FROM embeddings WHERE vec_id < 8),
          |cb1 AS (SELECT cid,
          |    list_transform(c, x -> x * 0.125) AS c FROM cb0),
          |v AS (SELECT vec_id,
          |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          |  FROM embeddings),
          |s0 AS (SELECT v.vec_id, cb0.cid,
          |    list_sum(list_transform(range(1, 65),
          |      i -> CAST(floor((v.v[i] - cb0.c[i]) * (v.v[i] - cb0.c[i])
          |        * 1000000 + 0.5) AS BIGINT))) AS d
          |  FROM v, cb0),
          |a0 AS (SELECT vec_id, cid AS c0 FROM s0
          |  QUALIFY row_number() OVER (PARTITION BY vec_id
          |    ORDER BY d, cid) = 1),
          |r AS (SELECT v.vec_id, a0.c0,
          |    list_transform(range(1, 65), i -> v.v[i] - k.c[i]) AS res
          |  FROM v JOIN a0 ON a0.vec_id = v.vec_id
          |  JOIN cb0 k ON k.cid = a0.c0),
          |s1 AS (SELECT r.vec_id, r.c0, cb1.cid,
          |    list_sum(list_transform(range(1, 65),
          |      i -> CAST(floor((res[i] - cb1.c[i]) * (res[i] - cb1.c[i])
          |        * 1000000 + 0.5) AS BIGINT))) AS d
          |  FROM r, cb1),
          |a1 AS (SELECT vec_id, c0, cid AS c1 FROM s1
          |  QUALIFY row_number() OVER (PARTITION BY vec_id
          |    ORDER BY d, cid) = 1)
          |SELECT vec_id, CAST(0 AS INT) AS level, c0 AS code FROM a1
          |UNION ALL
          |SELECT vec_id, CAST(1 AS INT) AS level, c1 AS code FROM a1
          |ORDER BY vec_id, level""".stripMargin
    )
  }
}
