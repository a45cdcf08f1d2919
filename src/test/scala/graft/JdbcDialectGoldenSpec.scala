package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.JdbcUpsert
import graft.sinks.JdbcUpsert.{Derby, MySql, Postgres}

/** Golden-SQL conformance for the MySQL/PostgreSQL upsert dialects
  * (VERDICT r4 #3). Those two dialects cannot execute in this sandbox
  * (no server, no driver jar, zero egress), so the residual risk is
  * squeezed the other way: the EXACT statement text and bind order are
  * pinned against reviewed goldens whose conflict clauses match the
  * reference builders — MySQL `INSERT … ON DUPLICATE KEY UPDATE
  * col=VALUES(col)` (`mysql.go:430-441`) and PostgreSQL `INSERT … ON
  * CONFLICT (pk) DO UPDATE SET col = EXCLUDED.col`
  * (`postgresql.go:764-772`, clause builder `postgresql.go:585-593`).
  * Any drift in the emitted SQL fails here with a full-string diff.
  */
class JdbcDialectGoldenSpec extends AnyFunSuite {

  private val cols = Seq("id", "name", "bal")
  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("bal", DoubleType)))
  private def row(id: Long, name: String, bal: Double): Row =
    new GenericRowWithSchema(Array[Any](id, name, bal), schema)

  // --- MySQL (K1, mysql.go:430-441) -------------------------------------

  test("golden: MySQL multi-row upsert, single-column key") {
    assert(JdbcUpsert.upsertSql(MySql, "users", cols, Seq("id"), n = 3) ==
      "INSERT INTO users (id, name, bal) " +
        "VALUES (?, ?, ?), (?, ?, ?), (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE name = VALUES(name), bal = VALUES(bal)")
  }

  test("golden: MySQL single-row upsert") {
    assert(JdbcUpsert.upsertSql(MySql, "users", cols, Seq("id"), n = 1) ==
      "INSERT INTO users (id, name, bal) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE name = VALUES(name), bal = VALUES(bal)")
  }

  test("golden: MySQL composite key updates only non-key columns") {
    assert(JdbcUpsert.upsertSql(MySql, "t", Seq("region", "id", "v"),
      Seq("region", "id"), n = 2) ==
      "INSERT INTO t (region, id, v) VALUES (?, ?, ?), (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE v = VALUES(v)")
  }

  test("golden: MySQL key-only table stays executable (no empty update list)") {
    assert(JdbcUpsert.upsertSql(MySql, "ids", Seq("id"), Seq("id"), n = 2) ==
      "INSERT INTO ids (id) VALUES (?), (?) " +
        "ON DUPLICATE KEY UPDATE id = id")
  }

  // --- PostgreSQL (K2, postgresql.go:764-772) ---------------------------

  test("golden: PostgreSQL multi-row upsert, single-column key") {
    assert(JdbcUpsert.upsertSql(Postgres, "users", cols, Seq("id"), n = 3) ==
      "INSERT INTO users (id, name, bal) " +
        "VALUES (?, ?, ?), (?, ?, ?), (?, ?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name, bal = EXCLUDED.bal")
  }

  test("golden: PostgreSQL composite key conflict target lists every key column") {
    assert(JdbcUpsert.upsertSql(Postgres, "t", Seq("region", "id", "v"),
      Seq("region", "id"), n = 1) ==
      "INSERT INTO t (region, id, v) VALUES (?, ?, ?) " +
        "ON CONFLICT (region, id) DO UPDATE SET v = EXCLUDED.v")
  }

  test("golden: PostgreSQL key-only table degrades to DO NOTHING") {
    assert(JdbcUpsert.upsertSql(Postgres, "ids", Seq("a", "b"), Seq("a", "b"), n = 2) ==
      "INSERT INTO ids (a, b) VALUES (?, ?), (?, ?) " +
        "ON CONFLICT (a, b) DO NOTHING")
  }

  // --- Derby (the live-proven ANSI MERGE sibling) -----------------------

  test("golden: Derby MERGE binds ON keys, then SET values, then the INSERT row") {
    assert(JdbcUpsert.upsertSql(Derby, "users", cols, Seq("id"), n = 1,
      keyTypes = Map("id" -> "BIGINT")) ==
      "MERGE INTO users USING SYSIBM.SYSDUMMY1 " +
        "ON users.id = CAST(? AS BIGINT) " +
        "WHEN MATCHED THEN UPDATE SET name = ?, bal = ? " +
        "WHEN NOT MATCHED THEN INSERT (id, name, bal) VALUES (?, ?, ?)")
  }

  // --- bind order (rowParams is the other half of the contract) --------

  test("golden: MySQL/PG bind the column list once per VALUES row") {
    val r = row(7L, "x", 1.5)
    assert(JdbcUpsert.rowParams(MySql, cols, Seq("id"), r) == Seq(7L, "x", 1.5))
    assert(JdbcUpsert.rowParams(Postgres, cols, Seq("id"), r) == Seq(7L, "x", 1.5))
    // bind order follows the COLUMN LIST, not the row's field order
    val shuffled = Seq("bal", "id", "name")
    assert(JdbcUpsert.rowParams(MySql, shuffled, Seq("id"), r) == Seq(1.5, 7L, "x"))
  }

  test("golden: Derby binds keys, updatable values, then the full insert row") {
    val r = row(7L, "x", 1.5)
    assert(JdbcUpsert.rowParams(Derby, cols, Seq("id"), r) ==
      Seq(7L, "x", 1.5, 7L, "x", 1.5))
    // composite key: both key params first, in key order
    val schema2 = StructType(Seq(StructField("region", StringType),
      StructField("id", LongType), StructField("v", DoubleType)))
    val r2 = new GenericRowWithSchema(Array[Any]("R1", 7L, 1.5), schema2)
    assert(JdbcUpsert.rowParams(Derby, Seq("region", "id", "v"),
      Seq("region", "id"), r2) == Seq("R1", 7L, 1.5, "R1", 7L, 1.5))
  }

  test("golden: multi-row statements bind rows in batch order") {
    val rows = Seq(row(1L, "a", 1.0), row(2L, "b", 2.0))
    val params = rows.flatMap(JdbcUpsert.rowParams(MySql, cols, Seq("id"), _))
    assert(params == Seq(1L, "a", 1.0, 2L, "b", 2.0))
  }
}
