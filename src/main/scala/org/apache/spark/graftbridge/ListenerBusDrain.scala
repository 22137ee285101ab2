package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Accessor for the `private[spark]` listener-bus drain, used by
  * [[graft.Profile]] to deterministically fence profiler attach/detach:
  * waiting until the async bus is empty both BEFORE adding the waterfall
  * listener (so queued warmup job/stage events don't leak into the
  * report) and BEFORE removing it (so the instrumented run's tail events
  * aren't dropped) replaces the old best-effort fixed sleep.
  */
object ListenerBusDrain {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
