package graft.engine

import java.util.concurrent.atomic.AtomicLong

/** Per-table progress accounting (R7/A4) — the fields of the reference's
  * `MigrationStats` (`internal/migration/migration.go:37-176`): total,
  * processed, percent, remaining, instantaneous rows/sec computed over
  * the window since the previous report (`migration.go:85-101`), elapsed.
  *
  * Thread-safe: the job loop increments from whatever thread runs the
  * table; `report()` may be called from a ticker or on chunk boundaries.
  */
final class ProgressStats(val table: String, val totalRows: Long,
                          now: () => Long = () => System.currentTimeMillis()) {
  private val processed = new AtomicLong(0L)
  private val startedAt = now()
  @volatile private var lastReportAt = startedAt
  @volatile private var lastReportRows = 0L

  def add(rows: Long): Long = processed.addAndGet(rows)
  def processedRows: Long = processed.get()

  def percent: Double =
    if (totalRows <= 0) 100.0 else 100.0 * processed.get() / totalRows
  def remaining: Long = math.max(0L, totalRows - processed.get())
  def elapsedMs: Long = now() - startedAt

  /** Windowed instantaneous rate (rows/s since the previous report);
    * returns the formatted report line and advances the window. R9: the
    * line is bilingual like the reference's (`migration.go:115-118`). */
  def report(): String = synchronized {
    val t = now(); val p = processed.get()
    val dt = math.max(1L, t - lastReportAt)
    val rate = (p - lastReportRows) * 1000.0 / dt
    lastReportAt = t; lastReportRows = p
    graft.core.I18n.tr(
      "[%s] 进度: %d/%d 行 (%.1f%%), 速率: %.0f 行/秒, 剩余: %d 行, 已用时间: %.1f 秒",
      "[%s] %d/%d rows (%.1f%%), %.0f rows/s, remaining %d, elapsed %.1f s",
      table, p, totalRows, percent, rate, remaining, elapsedMs / 1000.0)
  }

  /** Rate over the whole run (for the final summary). */
  def overallRate: Double = processed.get() * 1000.0 / math.max(1L, elapsedMs)
}
