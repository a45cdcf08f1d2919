package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Dialect-aware JDBC upsert sink (K1/K2/K3 real semantics). Spark's
  * built-in JDBC writer is insert-only, so upsert runs per partition:
  * each executor batches rows into a multi-row upsert statement —
  * exactly the reference's write path, distributed
  * (MySQL `INSERT ... ON DUPLICATE KEY UPDATE`, `mysql.go:417-498`;
  * PostgreSQL `INSERT ... ON CONFLICT (pk) DO UPDATE`,
  * `postgresql.go:725-777`).
  *
  * The statement generator and batching loop are pure and unit-tested;
  * the connection factory is injected so offline builds test the full
  * path with a recording executor (no database in CI) and deployments
  * pass `java.sql.DriverManager.getConnection` + a real statement
  * runner.
  */
object JdbcUpsert {

  sealed trait Dialect { def name: String }
  case object MySql extends Dialect { val name = "mysql" }
  case object Postgres extends Dialect { val name = "postgresql" }

  /** One multi-row upsert statement for `n` rows (`?` placeholders),
    * update clause over the non-key columns (reference `mysql.go:430-441`
    * / `postgresql.go:585-593`). */
  def upsertSql(dialect: Dialect, table: String, cols: Seq[String],
                keys: Seq[String], n: Int): String = {
    require(n > 0 && cols.nonEmpty && keys.forall(cols.contains))
    val updatable = cols.filterNot(keys.contains)
    val valueRow = cols.map(_ => "?").mkString("(", ", ", ")")
    val values = Seq.fill(n)(valueRow).mkString(", ")
    val colList = cols.mkString(", ")
    dialect match {
      case MySql =>
        val upd = updatable.map(c => s"$c = VALUES($c)").mkString(", ")
        s"INSERT INTO $table ($colList) VALUES $values ON DUPLICATE KEY UPDATE $upd"
      case Postgres =>
        val upd = updatable.map(c => s"$c = EXCLUDED.$c").mkString(", ")
        s"INSERT INTO $table ($colList) VALUES $values " +
          s"ON CONFLICT (${keys.mkString(", ")}) DO UPDATE SET $upd"
    }
  }

  /** Executor: receives the SQL and the flattened parameter vector for
    * one statement. Deployments bind a PreparedStatement; tests record. */
  type Executor = (String, Seq[Any]) => Unit

  /** Batch a partition's rows into `batchSize`-row statements (tail
    * batch included), with retry/backoff around each statement (K5). */
  def writePartition(dialect: Dialect, table: String, cols: Seq[String],
                     keys: Seq[String], batchSize: Int,
                     rows: Iterator[Row], exec: Executor,
                     retries: Int = 3, retryDelayMs: Long = 5000,
                     sleep: Long => Unit = Thread.sleep): Long = {
    var written = 0L
    rows.grouped(batchSize).foreach { batch =>
      val sql = upsertSql(dialect, table, cols, keys, batch.size)
      val params = batch.flatMap(r => cols.map(c => r.get(r.fieldIndex(c))))
      graft.engine.Retry(attempts = retries, delayMs = retryDelayMs, sleep = sleep) {
        exec(sql, params)
      }
      written += batch.size
    }
    written
  }

  /** Distributed upsert: one connection per partition, batched
    * statements, idempotent by upsert semantics (safe under task retry).
    * `executorFactory` must be serializable (typically a small function
    * closing over a DSN string). */
  def write(df: DataFrame, dialect: Dialect, table: String,
            keys: Seq[String], batchSize: Int = 1000)
           (executorFactory: () => Executor): Unit = {
    val cols = df.columns.toSeq
    df.foreachPartition { (rows: Iterator[Row]) =>
      val exec = executorFactory()
      writePartition(dialect, table, cols, keys, batchSize, rows, exec)
      ()
    }
  }
}
