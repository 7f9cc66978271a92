package graft.embed

/** Pooling math over raw transformer outputs, re-implemented faithfully
  * from the reference (these define output semantics — SURVEY §2.8):
  *  - CLS pooling: first-token hidden state (`ort_runtime.rs:72-84`)
  *  - mean-with-attention-mask (`ort_runtime.rs:86-114`)
  *  - SPLADE relu→log1p→max over sequence (`ort_runtime.rs:37-70`)
  * Shapes: output(batch)(seq)(hidden); mask(batch)(seq) in {0,1}.
  */
object Pooling {
  def cls(output: Array[Array[Array[Float]]]): Seq[Array[Float]] =
    output.toSeq.map(seq => seq(0).clone())

  def meanWithMask(output: Array[Array[Array[Float]]],
      mask: Array[Array[Int]]): Seq[Array[Float]] =
    output.indices.map { b =>
      val seq = output(b)
      val m = mask(b)
      val hidden = seq(0).length
      val acc = new Array[Double](hidden)
      var valid = 0
      var t = 0
      while (t < seq.length) {
        if (m(t) == 1) {
          valid += 1
          var h = 0
          while (h < hidden) { acc(h) += seq(t)(h); h += 1 }
        }
        t += 1
      }
      val denom = math.max(valid, 1).toDouble
      acc.map(x => (x / denom).toFloat)
    }

  /** relu → log1p → max over sequence positions (masked). */
  def spladeReluLogMax(output: Array[Array[Array[Float]]],
      mask: Array[Array[Int]]): Seq[Array[Float]] =
    output.indices.map { b =>
      val seq = output(b)
      val m = mask(b)
      val hidden = seq(0).length
      val acc = new Array[Float](hidden)
      var t = 0
      while (t < seq.length) {
        if (m(t) == 1) {
          var h = 0
          while (h < hidden) {
            val relu = math.max(seq(t)(h), 0.0f)
            val v = math.log1p(relu.toDouble).toFloat
            if (v > acc(h)) acc(h) = v
            h += 1
          }
        }
        t += 1
      }
      acc
    }
}
