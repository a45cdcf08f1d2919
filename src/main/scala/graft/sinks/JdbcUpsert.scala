package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Dialect-aware JDBC upsert sink (K1/K2/K3 real semantics). Spark's
  * built-in JDBC writer is insert-only, so upsert runs per partition:
  * each executor batches rows into upsert statements — exactly the
  * reference's write path, distributed
  * (MySQL `INSERT ... ON DUPLICATE KEY UPDATE`, `mysql.go:417-498`;
  * PostgreSQL `INSERT ... ON CONFLICT (pk) DO UPDATE`,
  * `postgresql.go:725-777`; ANSI `MERGE` for Derby-class stores).
  *
  * The statement generator and batching loop are pure and unit-tested;
  * the connection factory is injected so offline builds test the full
  * path with a recording executor and deployments pass a
  * [[ConnectionExecutor]] (exercised for real against embedded Derby in
  * `JdbcDerbySpec` — the first live-database execution of this path).
  */
object JdbcUpsert {

  sealed trait Dialect { def name: String }
  case object MySql extends Dialect { val name = "mysql" }
  case object Postgres extends Dialect { val name = "postgresql" }
  /** ANSI MERGE, one statement per row via the one-row dummy table
    * (Derby rejects derived `VALUES` tables in `USING`, so a multi-row
    * source is not expressible; the per-row statement is prepared once
    * and re-executed). Works on Derby and DB2-family stores. */
  case object Derby extends Dialect { val name = "derby" }

  /** Executor: receives the SQL and the flattened parameter vector for
    * one statement. Deployments bind a PreparedStatement
    * ([[ConnectionExecutor]]); tests record. SAM-convertible so a
    * `(sql, params) => ...` lambda still works. */
  trait Executor {
    def apply(sql: String, params: Seq[Any]): Unit
    /** Like apply, returning the affected-row count when the backend
      * reports one; -1 when unknown (recording/test executors). The
      * Derby per-row MERGE path uses this to detect a statement that
      * silently affected nothing and retry it. */
    def applyCounted(sql: String, params: Seq[Any]): Long = { apply(sql, params); -1L }
    /** Execute the same statement for many parameter rows, returning the
      * per-row affected counts (-1 = unknown). Default is a loop; real
      * JDBC executors override with `addBatch`/`executeBatch`, which
      * collapses per-statement round-trip + lock overhead — the same
      * reason the reference multi-rows its INSERT VALUES lists
      * (`mysql.go:430-441`). */
    def applyBatch(sql: String, rows: Seq[Seq[Any]]): Seq[Long] =
      rows.map(applyCounted(sql, _))
    def close(): Unit = ()
  }

  /** Real JDBC executor: one connection per partition, statements
    * prepared once per SQL text and re-executed. Autocommit stays ON —
    * every statement is individually durable, and the surrounding
    * upsert semantics make task retries idempotent.
    *
    * Self-healing: a deadlock victim at session severity (observed with
    * concurrent embedded-Derby MERGE writers) CLOSES the connection;
    * every statement re-validates it and reconnects, so the sink's
    * per-statement Retry actually recovers instead of failing forever
    * on a dead handle ("ERROR 08003: No current connection"). */
  final class ConnectionExecutor(url: String) extends Executor {
    ConnectionExecutor.loadDrivers()
    // In-process embedded Derby (jdbc:derby:<path>, not jdbc:derby://host)
    // LOSES rows under concurrent MERGE: a 4-thread pure-JDBC repro (no
    // Spark) drops up to ~25% of inserts with every executeUpdate
    // reporting success. All embedded connections live in THIS JVM, so a
    // process-wide lock serializes statement execution — connections and
    // partitioning stay parallel, the store applies one write at a time.
    // Server-grade stores (including Derby network mode) take the fully
    // parallel path.
    private val serializeStatements = isEmbeddedUrl(url)
    private var conn: java.sql.Connection = null
    private val stmts =
      scala.collection.mutable.Map.empty[String, java.sql.PreparedStatement]
    private def ensureConn(): java.sql.Connection = {
      if (conn == null || conn.isClosed) {
        stmts.clear() // prepared handles die with their connection
        paramTypes.clear()
        conn = java.sql.DriverManager.getConnection(url)
      }
      conn
    }
    def apply(sql: String, params: Seq[Any]): Unit = { applyCounted(sql, params); () }
    override def applyCounted(sql: String, params: Seq[Any]): Long =
      if (serializeStatements)
        ConnectionExecutor.embeddedWriteLock.synchronized(execute(sql, params))
      else execute(sql, params)
    /** One prepared statement, many parameter rows, one executeBatch —
      * amortizes the per-statement overhead that dominates per-row MERGE
      * (embedded URLs hold the process-wide lock for the whole batch,
      * which also keeps the batch atomic w.r.t. competing writers). */
    override def applyBatch(sql: String, rows: Seq[Seq[Any]]): Seq[Long] =
      if (serializeStatements)
        ConnectionExecutor.embeddedWriteLock.synchronized(executeBatch(sql, rows))
      else executeBatch(sql, rows)
    // Typed null binding, resolved ONCE per prepared statement: asking
    // getParameterMetaData per null value costs pgjdbc a server
    // round-trip each time, and MySQL Connector/J throws outright for
    // client-prepared statements — those drivers fall back to untyped
    // setObject(null), which they accept.
    private val paramTypes =
      scala.collection.mutable.Map.empty[java.sql.PreparedStatement, Array[Int]]
    private def bind(ps: java.sql.PreparedStatement, params: Seq[Any]): Unit = {
      lazy val types = paramTypes.getOrElseUpdate(ps,
        try {
          val md = ps.getParameterMetaData
          Array.tabulate(md.getParameterCount)(i => md.getParameterType(i + 1))
        } catch { case _: java.sql.SQLException => Array.empty[Int] })
      params.zipWithIndex.foreach { case (p, i) =>
        if (p == null) {
          if (types.length > i) ps.setNull(i + 1, types(i))
          else ps.setObject(i + 1, null)
        } else ps.setObject(i + 1, p)
      }
    }
    private def execute(sql: String, params: Seq[Any]): Long = {
      val c = ensureConn()
      val ps = stmts.getOrElseUpdate(sql, c.prepareStatement(sql))
      bind(ps, params)
      ps.executeUpdate().toLong
    }
    private def executeBatch(sql: String, rows: Seq[Seq[Any]]): Seq[Long] = {
      val c = ensureConn()
      val ps = stmts.getOrElseUpdate(sql, c.prepareStatement(sql))
      // One transaction per batch: autocommit would sync the log after
      // EVERY statement in the batch (the dominant cost on an embedded
      // store); a failed batch rolls back atomically and the caller's
      // retry replays it — idempotent MERGE makes the replay safe.
      val auto = c.getAutoCommit
      if (auto) c.setAutoCommit(false)
      try {
        rows.foreach { r => bind(ps, r); ps.addBatch() }
        val counts = ps.executeBatch().map(_.toLong).toSeq
        c.commit()
        counts
      } catch { case e: Throwable =>
        try c.rollback() catch { case _: Exception => () }
        throw e
      } finally {
        if (auto) try c.setAutoCommit(true) catch { case _: Exception => () }
      }
    }
    override def close(): Unit = {
      stmts.values.foreach(s => try s.close() catch { case _: Exception => () })
      if (conn != null) try conn.close() catch { case _: Exception => () }
    }
  }
  object ConnectionExecutor {
    /** Process-wide write lock for in-process embedded stores (see
      * ConnectionExecutor's serialization note). */
    private[sinks] val embeddedWriteLock = new Object
    /** JDBC 4 autoloads drivers via ServiceLoader; the explicit probe
      * covers classloader setups where that misses (sbt layered CLs). */
    private[graft] def loadDrivers(): Unit =
      try Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
      catch { case _: Throwable => () }
  }

  /** In-process embedded store (`jdbc:derby:<path>`, not a `//host`
    * network URL): single-disk, single-JVM — writes are serialized by
    * [[ConnectionExecutor]] and callers should keep write parallelism at
    * 1. Server-grade URLs (including Derby network mode) take the fully
    * parallel per-partition path. */
  def isEmbeddedUrl(url: String): Boolean =
    url.startsWith("jdbc:derby:") && !url.startsWith("jdbc:derby://")

  /** Writer parallelism a sink should actually use: the caller's
    * explicit request, else 1 for in-process embedded stores (whose
    * writes the executor serializes anyway), else 0 = keep the data's
    * own partitioning. ONE place for the policy — every JDBC writer
    * (batch chunk writes, streaming foreachBatch) routes through it. */
  def effectiveWriteParallelism(url: String, requested: Int): Int =
    if (requested > 0) requested
    else if (isEmbeddedUrl(url)) 1
    else 0

  /** Derby SQL type for a Catalyst type — used to give MERGE key
    * parameters an explicit CAST (Derby refuses untyped `?` in the ON
    * search condition) and by tests creating live tables. */
  def derbySqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case ByteType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(32672)"
    case TimestampType => "TIMESTAMP"
    case TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case BinaryType => "BLOB"
    case other => sys.error(s"no Derby mapping for Catalyst type $other")
  }

  /** One upsert statement (`?` placeholders): multi-row for MySQL/PG
    * (`n` rows, reference `mysql.go:430-441` / `postgresql.go:585-593`),
    * single-row MERGE for Derby (`keyTypes` supplies the CAST targets
    * for the ON-clause key parameters). */
  def upsertSql(dialect: Dialect, table: String, cols: Seq[String],
                keys: Seq[String], n: Int,
                keyTypes: Map[String, String] = Map.empty): String = {
    require(n > 0 && cols.nonEmpty && keys.forall(cols.contains))
    val updatable = cols.filterNot(keys.contains)
    val valueRow = cols.map(_ => "?").mkString("(", ", ", ")")
    val values = Seq.fill(n)(valueRow).mkString(", ")
    val colList = cols.mkString(", ")
    dialect match {
      case MySql =>
        // key-only table: an empty update list after ON DUPLICATE KEY
        // UPDATE is a syntax error on a real server — self-assign the
        // first key (the reference never hits this: it VALUES()-assigns
        // every column incl. the key, mysql.go:430-441)
        val upd =
          if (updatable.isEmpty) s"${keys.head} = ${keys.head}"
          else updatable.map(c => s"$c = VALUES($c)").mkString(", ")
        s"INSERT INTO $table ($colList) VALUES $values ON DUPLICATE KEY UPDATE $upd"
      case Postgres =>
        // key-only table: `DO UPDATE SET` with no assignments is a
        // syntax error — DO NOTHING has the same effect (row exists)
        val conflict = s"ON CONFLICT (${keys.mkString(", ")})"
        val upd =
          if (updatable.isEmpty) s"$conflict DO NOTHING"
          else s"$conflict DO UPDATE SET " +
            updatable.map(c => s"$c = EXCLUDED.$c").mkString(", ")
        s"INSERT INTO $table ($colList) VALUES $values $upd"
      case Derby =>
        require(n == 1, "Derby MERGE dialect emits one statement per row")
        require(keys.forall(keyTypes.contains),
          s"Derby MERGE needs SQL types for keys $keys (got $keyTypes)")
        val on = keys
          .map(k => s"$table.$k = CAST(? AS ${keyTypes(k)})").mkString(" AND ")
        val upd = if (updatable.isEmpty) ""
          else "WHEN MATCHED THEN UPDATE SET " +
            updatable.map(c => s"$c = ?").mkString(", ") + " "
        s"MERGE INTO $table USING SYSIBM.SYSDUMMY1 ON $on " +
          s"${upd}WHEN NOT MATCHED THEN INSERT ($colList) VALUES $valueRow"
    }
  }

  /** Parameter vector for one row in the dialect's binding order:
    * MySQL/PG bind the column list per VALUES row; Derby's MERGE binds
    * ON keys, then UPDATE SET values, then the INSERT row. */
  def rowParams(dialect: Dialect, cols: Seq[String], keys: Seq[String],
                row: Row): Seq[Any] = {
    def v(c: String): Any = row.get(row.fieldIndex(c))
    dialect match {
      case Derby =>
        keys.map(v) ++ cols.filterNot(keys.contains).map(v) ++ cols.map(v)
      case _ => cols.map(v)
    }
  }

  /** Last-writer-wins dedup within one statement batch. PostgreSQL
    * rejects an INSERT whose ON CONFLICT would update the same row twice
    * and MERGE has the same cardinality rule, so duplicate keys inside a
    * batch collapse to their LAST occurrence — exactly the keyed-upsert
    * semantics the batch would have produced applied row by row. */
  private[sinks] def dedupLastWins(batch: Seq[Row], cols: Seq[String],
                                   keys: Seq[String]): Seq[Row] = {
    val lastIdx = scala.collection.mutable.Map.empty[Seq[Any], Int]
    batch.zipWithIndex.foreach { case (r, i) =>
      lastIdx(keys.map(k => r.get(r.fieldIndex(k)))) = i
    }
    val keep = lastIdx.values.toSet
    batch.zipWithIndex.collect { case (r, i) if keep(i) => r }
  }

  /** Batch a partition's rows into `batchSize`-row statements (tail
    * batch included), with retry/backoff around each statement (K5).
    *
    * `pacer` (optional) is charged per statement batch — SUB-CHUNK rate
    * pacing (VERDICT r5 #4): the reference throttles every 1,000-row
    * batch (`migration.go:232-268`); without this, a chunk-granular
    * budget lets a whole chunk (up to 1/256 of the table) burst at full
    * speed before the driver sleeps. The pacer is executor-LOCAL (built
    * per partition from a statically divided budget — the same design
    * as Spark streaming's per-partition rate limits), so it bounds the
    * burst inside a task; the driver's shared limiter still enforces
    * the global sustained budget across chunks and tables. The FIRST
    * batch of a partition is never paced — a single-batch chunk is
    * already paced by the driver's inter-chunk acquire, and pacing it
    * here too would charge those rows twice. */
  def writePartition(dialect: Dialect, table: String, cols: Seq[String],
                     keys: Seq[String], batchSize: Int,
                     rows: Iterator[Row], exec: Executor,
                     retries: Int = 3, retryDelayMs: Long = 5000,
                     sleep: Long => Unit = Thread.sleep,
                     keyTypes: Map[String, String] = Map.empty,
                     pacer: Option[graft.engine.RateLimiter] = None): Long = {
    var written = 0L
    var firstBatch = true
    rows.grouped(batchSize).foreach { raw =>
      val batch = dedupLastWins(raw, cols, keys)
      if (!firstBatch) pacer.foreach(_.acquire(batch.size.toLong))
      firstBatch = false
      dialect match {
        case Derby =>
          val sql = upsertSql(Derby, table, cols, keys, 1, keyTypes)
          // Key-only tables have no WHEN MATCHED clause, so a replayed row
          // legitimately affects 0 rows — only a table WITH updatable
          // columns can treat 0 as a concurrency rollback (ADVICE r3).
          val hasUpdatable = cols.exists(!keys.contains(_))
          val rowsParams = batch.map(rowParams(Derby, cols, keys, _))
          graft.engine.Retry(attempts = retries, delayMs = retryDelayMs, sleep = sleep) {
            // one prepared statement, executeBatch per statement batch —
            // per-row executeUpdate round-trips dominated the MERGE path.
            // A MERGE must touch exactly one row; an explicit 0 means it
            // was rolled back under concurrency — retry the whole batch
            // (idempotent MERGE makes the replay a no-op for rows that
            // landed). Drivers may report SUCCESS_NO_INFO (<0); only an
            // explicit 0 is a rollback signal.
            val counts = exec.applyBatch(sql, rowsParams)
            if (hasUpdatable && counts.contains(0L))
              sys.error(s"MERGE affected 0 rows in $table — retrying batch")
          }
        case _ =>
          val sql = upsertSql(dialect, table, cols, keys, batch.size)
          val params = batch.flatMap(rowParams(dialect, cols, keys, _))
          graft.engine.Retry(attempts = retries, delayMs = retryDelayMs, sleep = sleep) {
            exec(sql, params)
          }
      }
      written += batch.size
    }
    written
  }

  /** Distributed upsert: one connection per partition, batched
    * statements, idempotent by upsert semantics (safe under task retry).
    * `executorFactory` must be serializable (typically a small function
    * closing over a DSN string).
    *
    * Returns the rows written, counted by a Spark accumulator on the
    * write action itself — no second scan, and exactly-once per
    * partition (accumulator updates of a ResultStage task apply once
    * even under task retry). */
  def write(df: DataFrame, dialect: Dialect, table: String,
            keys: Seq[String], batchSize: Int = 1000,
            paceRowsPerSec: Long = 0L)
           (executorFactory: () => Executor): Long = {
    val cols = df.columns.toSeq
    // Derby-only: the MERGE source row needs typed CASTs. Deriving this
    // eagerly for every dialect made MySQL/PG writes die on any key type
    // outside the Derby map even though their SQL never uses it.
    val keyTypes =
      if (dialect == Derby)
        keys.map(k => k -> derbySqlType(df.schema(k).dataType)).toMap
      else Map.empty[String, String]
    val written = df.sparkSession.sparkContext.longAccumulator
    df.foreachPartition { (rows: Iterator[Row]) =>
      val exec = executorFactory()
      // per-partition rate slice, built ON the executor (a shared
      // limiter object cannot distribute; the caller divides the global
      // budget by its concurrent-writer count)
      val pacer =
        if (paceRowsPerSec > 0) Some(new graft.engine.RateLimiter(paceRowsPerSec))
        else None
      try written.add(writePartition(dialect, table, cols, keys, batchSize,
        rows, exec, keyTypes = keyTypes, pacer = pacer))
      finally exec.close()
      ()
    }
    written.value
  }
}
