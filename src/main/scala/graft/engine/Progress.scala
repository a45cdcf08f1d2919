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
    * returns the formatted report line and advances the window. */
  def report(): String = synchronized {
    val t = now(); val p = processed.get()
    val dt = math.max(1L, t - lastReportAt)
    val rate = (p - lastReportRows) * 1000.0 / dt
    lastReportAt = t; lastReportRows = p
    f"[$table] $p%d/$totalRows%d rows ($percent%.1f%%), $rate%.0f rows/s, remaining $remaining%d, elapsed ${elapsedMs / 1000.0}%.1f s"
  }

  /** Rate over the whole run (for the final summary). */
  def overallRate: Double = processed.get() * 1000.0 / math.max(1L, elapsedMs)
}
