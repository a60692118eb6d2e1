package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`, so the one-file hop into
  * the org.apache.spark namespace lives here: graft's lane-scoped scan
  * listener (ScanAudit) must DRAIN the async listener bus before reading
  * its per-lane counts, or a slow bus thread under-reports the last jobs'
  * scans. Same mechanism Spark's own test harness uses
  * (SparkContext.listenerBus.waitUntilEmpty). */
object ListenerBusFlush {
  /** Block until every queued listener event has been delivered (bounded
    * by `timeoutMillis` so a wedged bus cannot hang the audit). */
  def flush(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException =>
      System.err.println(s"[scan-audit] listener bus not drained after ${timeoutMillis} ms")
    }
}
