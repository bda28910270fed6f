package org.apache.spark.graft

import org.apache.spark.{CleanerListener, SparkContext}

/** Bench-only bridge to the ContextCleaner (`SparkContext.cleaner` is
  * private[spark], hence this package): counts COMPLETED cleanup events
  * (each fires after the block/shuffle/broadcast removal finished) so the
  * bench can drain asynchronous cleanup in the untimed gap between queries
  * instead of letting it land inside the next timed one. Counting is the
  * only capability used — no cleanup is initiated from here. */
object CleanerShim {
  private val events = new java.util.concurrent.atomic.AtomicLong

  /** Attach a counting listener; false when the cleaner is disabled
    * (spark.cleaner.referenceTracking=false), in which case there is no
    * async cleanup to drain. */
  def install(sc: SparkContext): Boolean = sc.cleaner match {
    case Some(c) =>
      c.attachListener(new CleanerListener {
        override def rddCleaned(rddId: Int): Unit = events.incrementAndGet()
        override def shuffleCleaned(shuffleId: Int): Unit = events.incrementAndGet()
        override def broadcastCleaned(broadcastId: Long): Unit = events.incrementAndGet()
        override def accumCleaned(accId: Long): Unit = events.incrementAndGet()
        override def checkpointCleaned(rddId: Long): Unit = events.incrementAndGet()
      })
      true
    case None => false
  }

  /** Total cleanup events completed since JVM start (monotone). */
  def count: Long = events.get
}
