package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ExpressionValidator, MigrationSpec, TableMapping}
import graft.sinks.JdbcUpsert
import graft.sources.{JdbcCatalog, JdbcSource}

/** The reference's `migrateTable` pipeline against a REAL database
  * (`mysql.go:186-380`), end-to-end over JDBC: existence probe (S7) →
  * PK introspection (S6) → transform validation (P6) → DDL mirror at
  * the destination (S8) → range-partitioned parallel read (S1/S2) →
  * Catalyst transforms (P2) → MERGE/upsert write (K1/K2) → row count.
  *
  * Exercised against embedded Derby (on the Spark classpath) — the
  * first live execution of the connect→introspect→scan→upsert path
  * that is the reference's entire reason to exist. The same code runs
  * against any server-grade store whose dialect [[JdbcUpsert]] knows.
  *
  * 100 TB posture: the read is a range-partitioned parallel scan (every
  * executor reads its own key slice — strictly better than the
  * reference's serial keyset pages, SURVEY §4); the write is
  * per-partition batched upserts, idempotent under task retry.
  * `writeParallelism` caps concurrent writer connections: embedded
  * Derby is a single-disk store where concurrent MERGE writers mostly
  * contend on page locks (the default of 1 keeps gate runs
  * deterministic); server-grade targets raise it to the partition
  * count.
  */
object JdbcTransfer {

  def transfer(spark: SparkSession, url: String, table: TableMapping,
               mig: MigrationSpec, dialect: JdbcUpsert.Dialect = JdbcUpsert.Derby,
               writeParallelism: Int = 1): Long = {
    require(JdbcCatalog.tableExists(url, table.name),
      s"source table not found: ${table.name}") // S7, mysql.go:200-207
    val pk = table.primaryKeyCols.getOrElse(JdbcCatalog.primaryKey(url, table.name))
    require(pk.nonEmpty,
      s"table '${table.name}' has no primary key — refusing (mysql.go:216-218)")
    table.columnTransformations.foreach { ct =>
      ExpressionValidator.validate(spark, ct.expression) match {
        case Left(reason) => sys.error(
          s"rejected transform for ${table.name}.${ct.sourceColumn}: $reason")
        case Right(()) => ()
      }
    }
    // This one-shot path range-partitions on a NUMERIC leading key
    // (getLong bounds probe). Refuse a non-numeric key UP FRONT with a
    // typed message — before the DDL mirror touches the destination —
    // instead of dying in the probe with a driver conversion error
    // halfway through. Non-numeric/composite keys take the chunked
    // [[JdbcTransferJob]] path, which plans them properly.
    val leadMeta = JdbcCatalog.columns(url, table.name)
      .find(_.name.equalsIgnoreCase(pk.head))
      .getOrElse(sys.error(s"key column '${pk.head}' not found in ${table.name}"))
    require(JdbcTransferJob.keyStyle(leadMeta, dialect)
        .isInstanceOf[JdbcTransferJob.NumericKey],
      s"table '${table.name}' keys on non-numeric '${pk.head}' " +
        s"(${leadMeta.typeName}) — this one-shot path range-partitions " +
        "on a numeric key; use the chunked JdbcTransferJob path instead")
    JdbcCatalog.mirrorTable(url, table.name, table.target) // S8

    // Bounds probe (A3 analog) in SQL so only two scalars cross the wire
    val (lo, hi, n) = JdbcCatalog.withConnection(url) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT MIN(${pk.head}), MAX(${pk.head}), COUNT(*) FROM ${table.name}")
        rs.next()
        (rs.getLong(1), rs.getLong(2), rs.getLong(3))
      } finally st.close()
    }
    if (n == 0) return 0L

    val source = readTable(spark, url, table.name, mig, pk.head, (lo, hi))
    val out = table.columnTransformations.foldLeft(source) { (d, ct) =>
      d.withColumn(ct.sourceColumn, expr(ct.expression))
    }
    // the read's partition count is a pure function of the reader
    // options — no `.rdd` materialization (a second planning pass per
    // table) just to decide the coalesce
    val parts = JdbcSource.numPartitions(mig, (lo, hi),
      spark.sparkContext.defaultParallelism)
    val target = JdbcTransferJob.coalesceTarget(writeParallelism, parts)
    val toWrite = if (target > 0) out.coalesce(target) else out
    JdbcUpsert.write(toWrite, dialect, table.target, pk, mig.batchSize)(
      () => new JdbcUpsert.ConnectionExecutor(url))
    n
  }

  /** Range-partitioned read of a live table with column names folded to
    * lower case (Derby metadata upper-cases identifiers; the engine's
    * expressions and key lookups are written lower-case). */
  def readTable(spark: SparkSession, url: String, name: String,
                mig: MigrationSpec, pkCol: String,
                bounds: (Long, Long)): DataFrame = {
    val df = JdbcSource.read(spark, url, TableMapping(name), mig, pkCol, bounds)
    df.toDF(df.columns.map(_.toLowerCase): _*)
  }

  /** Unpartitioned read of a (small) live table — for read-back of
    * results whose PK is not numeric (e.g. composite timestamp keys). */
  def readAll(spark: SparkSession, url: String, name: String): DataFrame = {
    val df = spark.read.format("jdbc")
      .option("url", url).option("dbtable", name).load()
    df.toDF(df.columns.map(_.toLowerCase): _*)
  }

  /** Read a live table back, introspecting its PK and bounds (the
    * verification side of a round-trip). */
  def readBack(spark: SparkSession, url: String, name: String,
               mig: MigrationSpec): DataFrame = {
    val pk = JdbcCatalog.primaryKey(url, name)
    require(pk.nonEmpty, s"table '$name' has no primary key")
    val (lo, hi) = JdbcCatalog.withConnection(url) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT MIN(${pk.head}), MAX(${pk.head}) FROM $name")
        rs.next()
        (rs.getLong(1), rs.getLong(2))
      } finally st.close()
    }
    readTable(spark, url, name, mig, pk.head, (lo, hi))
  }
}
