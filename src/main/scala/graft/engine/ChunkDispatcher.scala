package graft.engine

import java.util.concurrent.Executors

import scala.collection.mutable
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bounded-parallel chunk execution with prefix-only checkpointing —
  * shared by the parquet engine ([[TableTransferJob]]) and the live JDBC
  * engine ([[JdbcTransferJob]]).
  *
  * Runs chunk writes on a fixed pool of `width` threads; completions are
  * drained strictly in submission order, so `save` only ever observes a
  * fully-completed PREFIX of the chunk plan (chunks finishing out of
  * order above an unfinished one are held until the head completes).
  * Stats, checkpoint cadence, rate limiting, and progress reporting all
  * happen on the calling (table) thread during drain — pool threads only
  * execute the Spark work.
  *
  * The checkpoint is saved BEFORE the rate-limit sleep so a kill during
  * the sleep loses no completed chunk.
  */
/** Chunk sizing shared by the parquet and live JDBC engines — ONE
  * definition of the contract: at most [[maxChunks]] chunks per table
  * (checkpoint cadence scales with table size instead of emitting
  * millions of tiny jobs), floored at the configured batch size /
  * checkpoint threshold. */
private[graft] object ChunkSizing {
  val maxChunks = 256
  def chunkRows(total: Long, batchSize: Int, rowThreshold: Int): Long = {
    val base = math.max(batchSize.toLong, rowThreshold.toLong)
    math.max(base, math.ceil(total.toDouble / maxChunks).toLong)
  }
  def chunkCount(total: Long, batchSize: Int, rowThreshold: Int): Int =
    math.max(1, math.min(maxChunks, math.ceil(
      total.toDouble / chunkRows(total, batchSize, rowThreshold)).toInt))
}

private[engine] final class ChunkDispatcher[B](
    width: Int,
    save: (Int, B) => Unit,
    stats: ProgressStats,
    policy: CheckpointPolicy,
    limiter: RateLimiter,
    log: String => Unit,
    progressIntervalMs: Long) {
  private val w = math.max(1, width)
  private val pool = Executors.newFixedThreadPool(w)
  private implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
  private val inFlight = mutable.Queue.empty[(Int, B, Future[Long])]
  private var lastReport = System.currentTimeMillis()

  def submit(idx: Int, bound: B)(work: => Long): Unit = {
    inFlight.enqueue((idx, bound, Future(work)))
    while (inFlight.size >= w) drainHead()
    // opportunistic: keep the checkpoint fresh when heads finish early
    while (inFlight.nonEmpty && inFlight.head._3.isCompleted) drainHead()
  }

  private def drainHead(): Unit = {
    val (idx, bound, fut) = inFlight.dequeue()
    val written = Await.result(fut, Duration.Inf)
    stats.add(written)
    if (policy.observe(written)) save(idx, bound)
    limiter.acquire(written)
    if (System.currentTimeMillis() - lastReport >= progressIntervalMs) {
      log(stats.report()); lastReport = System.currentTimeMillis()
    }
  }

  def drainAll(): Unit = while (inFlight.nonEmpty) drainHead()
  def shutdown(): Unit = pool.shutdown()
}
