package graft.engine

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.core.{ExpressionValidator, TableMapping, TransferSpec}

/** Outcome of one table's transfer. */
sealed trait TransferOutcome
object TransferOutcome {
  case object Completed extends TransferOutcome
  case object SkippedComplete extends TransferOutcome
  /** Interrupted by cancel; checkpoint saved at the last finished chunk. */
  final case class Interrupted(chunksDone: Int) extends TransferOutcome
}

/** Cooperative cancellation shared by all table jobs (R8): the CLI wires
  * a JVM shutdown hook to `cancel()`; jobs observe it between chunks and
  * flush their checkpoint (reference: SIGINT → ctx cancel →
  * checkpoint-on-interrupt, `main.go:299-308`, `mysql.go:357-367`). */
class TransferControl {
  @volatile private var cancelled = false
  private val active = new java.util.concurrent.atomic.AtomicInteger(0)
  def cancel(): Unit = cancelled = true
  def isCancelled: Boolean = cancelled
  /** Jobs register while running so a shutdown hook can wait for their
    * checkpoint flush instead of sleeping a fixed grace period. */
  def jobStarted(): Unit = active.incrementAndGet()
  def jobFinished(): Unit = active.decrementAndGet()
  def activeJobs: Int = active.get()
}

object TransferControl {
  /** Control that cancels after `n` chunk-boundary checks — the
    * deterministic simulated kill used by resume tests and benchmarks. */
  def cancelAfterChecks(n: Int): TransferControl = new TransferControl {
    private val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    override def isCancelled: Boolean = seen.incrementAndGet() > n
  }
}

/** One table's transfer: the reference's `migrateTable` pipeline
  * (`mysql.go:186-380`) re-expressed Spark-first.
  *
  * Pipeline: existence check (S7) → checkpoint load, skip-if-complete
  * (R6) → DDL mirror (S8: schema sidecar at the target) → transform
  * validation (P6) → chunked write loop with progress (R7), rate limit
  * (R2), retry (K5), checkpoint cadence (R4/R5), cancel checks (R8) →
  * completion marker.
  *
  * Chunking IS the keyset scan, distributed (SURVEY §4: "keyset
  * pagination → range-partitioned parallel read"):
  *  - numeric PK → range chunks from approximate quantiles of the
  *    *remaining* rows (`WHERE pk > lastKey`, exactly the reference's
  *    resume predicate `mysql.go:617-631`); each chunk is internally a
  *    parallel Spark job, so "batch" granularity costs no serialism;
  *  - non-numeric PK → deterministic hash buckets (`pmod(hash(pk), n)`),
  *    the Cassandra token-range analog (S4, `cassandra.go:1066-1142`);
  *    resume skips completed bucket indices.
  *
  * Each chunk writes `mode=overwrite` into its own subdirectory of the
  * target, which makes a retried or resumed chunk idempotent (the analog
  * of idempotent upserts K1-K4: re-applying a suffix of chunks is a
  * no-op). The checkpoint advances only after the chunk write returns,
  * so a crash re-writes at most one chunk.
  *
  * 100 TB posture: no `.collect()` of data (only per-chunk counts and
  * quantile bounds reach the driver); chunk count is capped so checkpoint
  * cadence adapts upward with table size instead of producing millions of
  * tiny jobs; within a chunk Spark parallelism is untouched.
  */
final class TableTransferJob(
    spark: SparkSession,
    spec: TransferSpec,
    table: TableMapping,
    control: TransferControl = new TransferControl,
    log: String => Unit = s => System.err.println(s"[transfer] $s"),
    sharedLimiter: Option[RateLimiter] = None) {

  /** Process-wide rows/sec budget: one limiter shared by every table job
    * of a run (TransferRunner injects it); standalone jobs fall back to
    * their own. Matches the reference's GLOBAL limiter semantics
    * (`migration.go:212-268`) — without sharing, aggregate throughput
    * would be workers × rate_limit. */
  private val limiter: RateLimiter =
    sharedLimiter.getOrElse(new RateLimiter(spec.migration.rateLimit.toLong))

  private val mig = spec.migration
  private val kind = spec.source.kind
  private val srcFile = s"${spec.source.path}/${table.name}.parquet"
  private val destDir = s"${spec.destination.path}/${table.target}"
  private val maxChunks = 256

  private def pkCols: Seq[String] =
    table.primaryKeyCols
      .orElse(graft.sources.Tables.primaryKeys.get(table.name))
      .getOrElse(sys.error(
        s"table '${table.name}' has no primary key configured — refusing " +
          "(reference rejects PK-less tables, mysql.go:216-218)"))

  def run(): TransferOutcome = {
    // S7: existence check, loud failure like `mysql.go:200-207`
    require(Files.exists(Paths.get(srcFile)), s"source table not found: $srcFile")

    val cp = Checkpoint.load(mig.checkpointDir, kind, table.name)
    if (cp.exists(_.complete)) {
      log(s"${table.name}: checkpoint complete, skipping (R6)")
      return TransferOutcome.SkippedComplete
    }

    table.columnTransformations.foreach { ct =>
      ExpressionValidator.validate(spark, ct.expression) match {
        case Left(reason) => sys.error(
          s"rejected transform for ${table.name}.${ct.sourceColumn}: $reason")
        case Right(()) => ()
      }
    }

    val source = spark.read.parquet(srcFile)
    // S8: DDL mirror — schema sidecar written once (CREATE TABLE IF NOT
    // EXISTS analog for a file destination; `mysql.go:254-274`).
    Files.createDirectories(Paths.get(destDir))
    val ddlPath = Paths.get(destDir, "_schema.ddl")
    if (!Files.exists(ddlPath))
      Files.writeString(ddlPath, transformed(source).schema.toDDL + "\n")

    // A crash can leave chunk dirs written AFTER the last checkpoint save
    // (cadence saves at-most-per-chunk): on resume those ranges are
    // re-chunked with fresh bounds, so stale dirs above the checkpoint
    // would duplicate rows. Drop them first — checkpoint is truth.
    cleanupChunksAbove(cp.map(_.chunkIndex).getOrElse(-1))

    val pk = pkCols
    val firstPk = pk.head
    val numericPk = source.schema(firstPk).dataType.isInstanceOf[NumericType]
    if (numericPk) runRangeChunks(source, firstPk, cp)
    else runHashChunks(source, pk, cp)
  }

  private def cleanupChunksAbove(idx: Int): Unit = {
    val d = new java.io.File(destDir)
    Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
      if (f.isDirectory && f.getName.startsWith("chunk-") &&
          f.getName.stripPrefix("chunk-").toIntOption.exists(_ > idx))
        graft.util.Fs.deleteRecursive(f)
    }
  }

  private def transformed(df: DataFrame): DataFrame =
    table.columnTransformations.foldLeft(df) { (d, ct) =>
      d.withColumn(ct.sourceColumn, expr(ct.expression))
    }

  private def chunkRows(total: Long): Long = {
    val base = math.max(mig.batchSize.toLong, mig.checkpointRowThreshold.toLong)
    math.max(base, math.ceil(total.toDouble / maxChunks).toLong)
  }

  /** Numeric-PK path: contiguous key ranges, resume via `pk > lastKey`. */
  private def runRangeChunks(source: DataFrame, pkCol: String,
                             cp: Option[Checkpoint]): TransferOutcome = {
    val lastKey = cp.flatMap(_.lastKey.get(pkCol)).map(_.toDouble)
    val startChunk = cp.map(_.chunkIndex).getOrElse(-1) + 1
    val remaining = lastKey match {
      case Some(k) => source.where(col(pkCol) > k)
      case None => source
    }
    // One pass: row count, TRUE max of the key (checkpoints must record
    // it — the quantile max can undershoot, and recording an undershot
    // bound would re-transfer (bound, max] after a crash), and a NULL-key
    // probe (range predicates are null-rejecting, so NULL keys would be
    // silently dropped — refuse them, like the reference refuses PK-less
    // tables, mysql.go:216-218).
    val probe = remaining.agg(
      count(lit(1)).as("n"),
      max(col(pkCol)).cast("double").as("mx"),
      count(when(col(pkCol).isNull, 1)).as("nulls")).head()
    val total = probe.getLong(0)
    require(probe.getLong(2) == 0,
      s"table '${table.name}' has ${probe.getLong(2)} NULL values in key " +
        s"'$pkCol' — refusing (rows would be lost by range chunking)")
    if (total == 0) return finish(startChunk, lastKey.map(k => Map(pkCol -> fmtKey(k))))
    val trueMax = probe.getDouble(1)

    val n = math.max(1, math.min(maxChunks,
      math.ceil(total.toDouble / chunkRows(total)).toInt))
    // Quantile bounds over the REMAINING rows only; dedup handles heavy
    // key duplication. relativeError 1/(4n) keeps chunks balanced.
    val probes = (1 to n).map(_.toDouble / n).toArray
    val bounds = remaining.stat
      .approxQuantile(pkCol, probes, math.min(0.01, 1.0 / (4.0 * n)))
      .distinct.sorted
    val stats = new ProgressStats(table.name, total)
    val policy = new CheckpointPolicy(mig.checkpointRowThreshold.toLong,
      mig.checkpointIntervalSec * 1000L)

    var lo: Option[Double] = lastKey
    var chunkIdx = startChunk
    var lastReport = System.currentTimeMillis()
    for ((hi, i) <- bounds.zipWithIndex) {
      if (control.isCancelled) {
        saveCp(lo.map(k => Map(pkCol -> fmtKey(k))), chunkIdx - 1, complete = false)
        log(s"${table.name}: interrupted, checkpoint at chunk ${chunkIdx - 1}")
        return TransferOutcome.Interrupted(chunkIdx - startChunk)
      }
      val isLast = i == bounds.length - 1
      var chunk = lo match {
        case Some(l) => transformed(source.where(col(pkCol) > l))
        case None => transformed(source)
      }
      // last chunk takes everything above lo (quantile max can undershoot)
      if (!isLast) chunk = chunk.where(col(pkCol) <= hi)
      val written = writeChunk(chunk, chunkIdx)
      stats.add(written)
      // The checkpointed bound must cover every row the chunk wrote: the
      // last chunk extends past the (possibly undershot) quantile max, so
      // its bound is the true max — never `hi`.
      val bound = if (isLast) trueMax else hi
      // checkpoint BEFORE the rate-limit sleep: a kill during the sleep
      // then loses no completed chunk
      if (policy.observe(written))
        saveCp(Some(Map(pkCol -> fmtKey(bound))), chunkIdx, complete = false)
      limiter.acquire(written)
      if (System.currentTimeMillis() - lastReport >= mig.progressIntervalSec * 1000L) {
        log(stats.report()); lastReport = System.currentTimeMillis()
      }
      lo = Some(bound); chunkIdx += 1
    }
    log(stats.report())
    finish(chunkIdx - 1, Some(Map(pkCol -> fmtKey(trueMax))))
  }

  /** Non-numeric-PK path: deterministic hash buckets (token-range
    * analog); resume = skip bucket indices <= checkpointed. */
  private def runHashChunks(source: DataFrame, pk: Seq[String],
                            cp: Option[Checkpoint]): TransferOutcome = {
    val total = source.count()
    val n = math.max(1, math.min(maxChunks,
      math.ceil(total.toDouble / chunkRows(total)).toInt))
    val doneBucket = cp.map(_.chunkIndex).getOrElse(-1)
    val stats = new ProgressStats(table.name, total)
    val policy = new CheckpointPolicy(mig.checkpointRowThreshold.toLong,
      mig.checkpointIntervalSec * 1000L)
    val bucketExpr = pmod(hash(pk.map(col): _*), lit(n))

    for (b <- (doneBucket + 1) until n) {
      if (control.isCancelled) {
        saveCp(None, b - 1, complete = false)
        return TransferOutcome.Interrupted(b - doneBucket - 1)
      }
      val chunk = transformed(source.where(bucketExpr === b))
      val written = writeChunk(chunk, b)
      stats.add(written)
      if (policy.observe(written)) saveCp(None, b, complete = false)
      limiter.acquire(written)
    }
    log(stats.report())
    finish(n - 1, None)
  }

  /** Idempotent chunk write with retry; returns rows written. The count
    * rides the write itself via `observe` — no caching, no second scan
    * (a cache would materialize the whole chunk into executor storage,
    * which does not survive the 100 TB posture). */
  private def writeChunk(chunk: DataFrame, idx: Int): Long = {
    val dir = f"$destDir/chunk-$idx%05d"
    Retry(attempts = 3, delayMs = 1000,
      onError = (i, e) => log(s"${table.name}: chunk $idx attempt $i failed: ${e.getMessage}")) {
      val obs = org.apache.spark.sql.Observation(f"chunk-$idx%05d-${System.nanoTime()}")
      chunk.observe(obs, count(lit(1)).as("rows"))
        .write.mode("overwrite").parquet(dir)
      obs.get("rows").asInstanceOf[Long]
    }
  }

  private def saveCp(lastKey: Option[Map[String, String]], chunkIdx: Int,
                     complete: Boolean): Unit =
    Checkpoint.save(mig.checkpointDir, kind, table.name,
      Checkpoint(lastKey.getOrElse(Map.empty), System.currentTimeMillis(),
        complete, chunkIdx))

  private def finish(lastChunk: Int, lastKey: Option[Map[String, String]]): TransferOutcome = {
    // Publish step: when the spec asks for a partitioned target layout,
    // rewrite the chunk dirs into hive-style partitions once, at the end
    // (a one-time full pass — partition values can span chunks, so
    // per-chunk dynamic overwrite would clobber earlier chunks).
    if (table.partitionBy.nonEmpty) {
      spark.read.option("recursiveFileLookup", "true").parquet(destDir)
        .write.mode("overwrite").partitionBy(table.partitionBy: _*)
        .parquet(s"$destDir-final")
    }
    saveCp(lastKey, lastChunk, complete = true)
    Files.writeString(Paths.get(destDir, "_GRAFT_COMPLETE"), "")
    TransferOutcome.Completed
  }

  /** Integer-valued keys render without a trailing `.0` so the
    * string-encoded lastKey matches the reference's convention. */
  private def fmtKey(v: Double): String =
    if (v == math.rint(v) && !v.isInfinite) v.toLong.toString else v.toString
}

object TableTransferJob {
  /** Read a transferred table back: the partitioned publish layout when
    * present, else the chunk dirs. */
  def readTarget(spark: SparkSession, spec: TransferSpec, target: String): DataFrame = {
    val finalDir = s"${spec.destination.path}/$target-final"
    if (Files.exists(Paths.get(finalDir))) spark.read.parquet(finalDir)
    else spark.read.option("recursiveFileLookup", "true")
      .parquet(s"${spec.destination.path}/$target")
  }
}
