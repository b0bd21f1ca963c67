package graft

/** Bench-side lifecycle split for streaming entries. A streaming q-entry's
  * wall-clock is dominated by StreamingQuery LIFECYCLE — thread and
  * checkpoint setup, trigger scheduling, stop/drain of daemon threads —
  * not by the operator itself, and that overhead is exactly the shape the
  * host's environment band hits hardest (BASELINE.md, rounds 3/5/7). The
  * streaming helpers report the time spent actually processing data
  * (processAllAvailable / awaitTermination) here, so the bench can emit
  * operator-only figures next to the wall-clock ones and round-over-round
  * comparisons stop chasing lifecycle noise.
  *
  * Bench runs queries sequentially on one thread; the lock is only for
  * safety if a future harness parallelizes.
  */
object BenchProbe {
  private var drainNanos = 0L

  /** Called by streaming helpers around their drain call. */
  def addDrain(nanos: Long): Unit = synchronized { drainNanos += nanos }

  /** Drain seconds accumulated since the last take; resets the counter.
    * Zero for queries that never start a StreamingQuery.
    */
  def takeDrainSeconds(): Double = synchronized {
    val s = drainNanos / 1e9
    drainNanos = 0L
    s
  }
}
