package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Deterministic listener-bus drain (ADVICE r8 on Bench's settle
  * heuristic): task-end events post ASYNC, so "metrics stopped moving
  * across one 20 ms poll" can exit while events are still queued —
  * silently under-counting one query's job totals and leaking them into
  * the next. `LiveListenerBus.waitUntilEmpty()` is the real barrier
  * (every queued event dispatched to every listener), but bus and method
  * are `private[spark]` — hence this shim in the engine's existing
  * org.apache.spark.sql.graft package (the same access trick
  * [[CdcStreamingPushdown]] uses for the streaming pushdown rule).
  */
object ListenerBus {
  /** Block until every event posted so far has been dispatched. Bounded:
    * the bus dispatches continuously, so this returns as soon as the
    * queues empty (TimeoutException after 100 s would mean a wedged bus
    * — surface it, don't swallow). */
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

}
