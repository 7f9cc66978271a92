package graft.util

import java.util.concurrent.atomic.AtomicLong

/** Wall-clock accumulator for index-construction work (IVF builds,
  * appends, artifact loads). Bench drains it per rep to report a real
  * build/search split for index-bearing queries, so a driver artifact
  * line like "q_hybrid_rrf_ivf 2.2 s" is self-diagnosing: the build
  * share is its own number instead of masquerading as a search
  * regression whenever run order hands a query the cold shared build.
  *
  * Only the OUTERMOST timed section on a thread accumulates (a build
  * that internally appends must not double-count). Accumulation is
  * cross-thread safe; nesting depth is per-thread.
  */
object BuildTimer {
  private val nanos = new AtomicLong()
  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  def timed[A](f: => A): A = {
    val d: Int = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try f
    finally {
      depth.set(d)
      if (d == 0) nanos.addAndGet(System.nanoTime() - t0)
    }
  }

  /** Seconds accumulated since the last drain; resets the counter. */
  def drainSeconds(): Double = nanos.getAndSet(0L) / 1e9
}
