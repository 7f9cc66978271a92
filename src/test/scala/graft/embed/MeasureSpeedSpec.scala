package graft.embed

import org.scalatest.funsuite.AnyFunSuite

class MeasureSpeedSpec extends AnyFunSuite {
  test("measure-speed: max >= min, both positive, avg is the mean") {
    val s = MeasureSpeed.run(HashEmbeddingRuntime, "hash/bow-64",
      initialLimit = 200, maxTokens = 200, minWallMs = 150)
    assert(s.maxEmbPerSec > 0 && s.minEmbPerSec > 0)
    // short texts embed faster than ~200-token texts
    assert(s.maxEmbPerSec > s.minEmbPerSec)
    assert(s.avgEmbPerSec === (s.maxEmbPerSec + s.minEmbPerSec) / 2.0)
  }
}
