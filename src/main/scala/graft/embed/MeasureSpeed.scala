package graft.embed

/** Embedding throughput harness mirroring `measure-model-speed`
  * (`lantern_cli/src/embeddings/measure_speed.rs:18-171`, BASELINE.md):
  *  - emb/s (max): embed a short 4-word text, doubling the row limit
  *    until a run takes >= 1500 ms wall; speed = rows/elapsed-sec;
  *    the FIRST run is discarded (cold start).
  *  - emb/s (min): same over ~maxTokens lorem-style text.
  *  - emb/s (avg) = (min + max) / 2.
  */
object MeasureSpeed {
  case class Speed(maxEmbPerSec: Double, minEmbPerSec: Double) {
    def avgEmbPerSec: Double = (maxEmbPerSec + minEmbPerSec) / 2.0
  }

  private val shortText = "lorem ipsum dolor sit"

  private def longText(maxTokens: Int): String =
    Iterator.continually(Seq("lorem", "ipsum", "dolor", "sit", "amet",
      "consectetur", "adipiscing", "elit")).flatten
      .take(maxTokens).mkString(" ")

  private def measure(runtime: EmbeddingRuntime, model: String,
      text: String, initialLimit: Int, minWallMs: Long): Double = {
    var limit = initialLimit
    var first = true
    while (true) {
      val inputs = Seq.fill(limit)(text)
      val t0 = System.nanoTime()
      runtime.process(model, inputs)
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      if (!first && elapsedMs >= minWallMs)
        return limit / (elapsedMs / 1000.0)
      first = false
      if (elapsedMs >= minWallMs) () // discard cold-start run, re-run
      else limit *= 2
    }
    0.0 // unreachable
  }

  def run(runtime: EmbeddingRuntime, model: String,
      initialLimit: Int = 500, maxTokens: Int = 1000,
      minWallMs: Long = 1500): Speed =
    Speed(
      maxEmbPerSec = measure(runtime, model, shortText, initialLimit,
        minWallMs),
      minEmbPerSec = measure(runtime, model, longText(maxTokens),
        math.max(initialLimit / 10, 1), minWallMs))
}
