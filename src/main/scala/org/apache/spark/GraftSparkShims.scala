package org.apache.spark

/** Single `private[spark]` access shim: block until the shared
  * LiveListenerBus has dispatched every queued event. Streaming query
  * progress reaches StreamingQueryListeners asynchronously through
  * this bus, so a measurement harness that resets/reads a
  * listener-accumulated value around `awaitTermination` races the
  * final micro-batch's event — [[graft.ScaleCurve]] drains the bus on
  * both sides of each measured point instead. (Spark exposes
  * `waitUntilEmpty` to its own tests for exactly this.)
  */
object GraftSparkShims {
  def drainListenerBus(sc: SparkContext, timeoutMillis: Long = 60000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
