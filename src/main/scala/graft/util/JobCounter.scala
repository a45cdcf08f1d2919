package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Counts Spark jobs submitted on a context (VERDICT r16 #2): the
  * driver-vs-self bench spikes land exactly on the many-short-jobs
  * iterative gates (star-contraction closures), so per-gate job counts
  * in the bench ledgers make "jobs × machine contention" a testable
  * attribution instead of prose. Job-start events are enqueued on the
  * listener bus when the job is SUBMITTED — long before the action that
  * ends a timed region returns — so a snapshot taken right after a run
  * is accurate up to bus-drain latency (≪ one job) and the count is
  * attribution-grade, not an accounting invariant. */
final class JobCounter extends SparkListener {
  private val n = new AtomicLong(0)
  override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
    n.incrementAndGet(); ()
  }
  def count: Long = n.get
}

object JobCounter {
  def install(sc: SparkContext): JobCounter = {
    val c = new JobCounter
    sc.addSparkListener(c)
    c
  }
}
