package graft.operators

/** HNSW-style index parameter surface (F9,
  * `lantern_extras/src/external_index.rs:12-101`). The online index
  * itself is out of scope (north star: exact kNN + offline artifacts),
  * but the parameter contract — names, defaults, validation ranges —
  * is preserved so job specs round-trip and a future ANN backend keeps
  * the same API.
  */
case class IndexParams(
    metric: String = "l2sq",
    dim: Int = 0,
    m: Int = 16,
    efConstruction: Int = 16,
    ef: Int = 16,
    pq: Boolean = false) {

  /** Validation mirrors `external_index.rs`: m in [2,128], ef/efc in
    * [1,400], dim in [1,2000] (0 = infer), metric one of
    * l2sq/cos/hamming.
    */
  def validate(): IndexParams = {
    require(m >= 2 && m <= 128, s"m must be in [2, 128], got $m")
    require(efConstruction >= 1 && efConstruction <= 400,
      s"ef_construction must be in [1, 400], got $efConstruction")
    require(ef >= 1 && ef <= 400, s"ef must be in [1, 400], got $ef")
    require(dim >= 0 && dim <= 2000,
      s"dim must be in [1, 2000] (0 = infer), got $dim")
    require(Seq("l2sq", "cos", "hamming").contains(metric),
      s"metric must be l2sq|cos|hamming, got $metric")
    this
  }
}
