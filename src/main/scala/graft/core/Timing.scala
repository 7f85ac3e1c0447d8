package graft.core

/** Sub-timing side channel for the bench: a query whose fn both BUILDS
  * a fixture lifecycle (create + upserts on a temp table) and performs
  * the MEASURED operation (vacuum / changefeed / optimize / drain)
  * reports the build portion here, so the bench can split each cell
  * into `build_s` and `op_s = total - build_s` — a regression in the
  * operation can no longer hide inside build noise (the q130
  * build-vs-serve separation, applied to the mutating instruments).
  *
  * JVM-global and additive between [[drain]] calls; the bench runs
  * queries serially and drains after each, so the window is exactly
  * one cell. Zero entries outside the bench cost nothing. */
object Timing {

  private val acc = new java.util.concurrent.atomic.DoubleAdder()

  /** Record `f`'s wall time as fixture-build work. */
  def build[T](f: => T): T = {
    val t0 = System.nanoTime()
    try f finally acc.add((System.nanoTime() - t0) / 1e9)
  }

  /** Build seconds accumulated since the last drain, and reset. */
  def drain(): Double = {
    val v = acc.sumThenReset()
    v
  }
}
