package org.apache.spark

/** Package shim for measurement tooling: `listenerBus.waitUntilEmpty` is
  * `private[spark]`, but ProfileQ must drain the async listener bus
  * before detaching its listener — a fixed sleep is a race on a loaded
  * host (late stage-end events under-count jobSum and inflate the
  * reported planning "gaps" that drive optimization decisions, r16
  * ADVICE). Tooling-only; never referenced from query paths. */
object ListenerDrain {
  /** Block until every queued listener event has been delivered, or the
    * timeout passes. A timeout is reported, not thrown: the motivating
    * scenario is a LOADED host, where aborting the whole profiling run
    * (waitUntilEmpty throws TimeoutException) would lose every remaining
    * query's profile — strictly worse than one under-counted profile. */
  def drain(sc: SparkContext, timeoutMs: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        System.err.println(
          s"[listener-drain] bus not empty after ${timeoutMs}ms — " +
            "jobSum/gaps may be under-counted for this query")
    }
}
