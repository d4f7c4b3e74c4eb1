package graft.core

import java.util.concurrent.atomic.AtomicBoolean

/** I7: logging/timing infrastructure — the engine-relevant slice of the
  * reference's `logging_config.py` (configure_logging, log_timing,
  * log_memory_usage; 548 LoC of Python logging plumbing collapses to this
  * because slf4j/log4j2 arrive configured with Spark).
  *
  * - [[timed]] wraps a stage, logs wall time + heap delta, and always
  *   returns the body's value (timing must never change behavior);
  * - [[setVerbose]]/[[setQuiet]] mirror the reference's verbosity modes
  *   (logging_config.py: verbose/quiet flags on every entry point);
  * - timings accumulate in a per-JVM ledger so batch mains (Verify, Bench,
  *   ScaleDemo) can dump a stage table at exit without threading state.
  */
object Instrument {

  private val logger = org.slf4j.LoggerFactory.getLogger("graft")
  private val verbose = new AtomicBoolean(false)
  private val quiet = new AtomicBoolean(false)
  private val ledger = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  def setVerbose(on: Boolean): Unit = verbose.set(on)
  def setQuiet(on: Boolean): Unit = quiet.set(on)

  def heapUsedMb: Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  /** Time a stage; log at info (debug detail when verbose, nothing when
    * quiet); record into the ledger. */
  def timed[T](label: String)(body: => T): T = {
    val h0 = heapUsedMb
    val t0 = System.nanoTime()
    val out = body
    val sec = (System.nanoTime() - t0) / 1e9
    ledger.add(label -> sec)
    if (!quiet.get()) {
      if (verbose.get())
        logger.info(f"$label: $sec%.3f s (heap ${heapUsedMb - h0}%+d MB → $heapUsedMb MB)")
      else logger.info(f"$label: $sec%.3f s")
    }
    out
  }

  /** Stage table accumulated so far (insertion order). */
  def timings: Seq[(String, Double)] = {
    val it = ledger.iterator()
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    while (it.hasNext) out += it.next()
    out.toSeq
  }

  def reset(): Unit = ledger.clear()

  /** One-line summary, e.g. for a run-metadata sidecar. */
  def summary: String =
    timings.map { case (l, s) => f"$l=$s%.3fs" }.mkString(", ")
}
