package graft

import graft.core.ExpressionValidator

/** P6: the Catalyst-allowlist validator must accept every transform the
  * reference's shipped configs exercise (§2.6) and reject each keyword
  * class of the reference blacklist (`postgresql.go:780-799`) — plus the
  * classes a substring blacklist can't catch. */
class ExpressionValidatorSpec extends SparkTestBase {

  private def ok(e: String) = assert(
    ExpressionValidator.validate(spark, e).isRight,
    s"should accept: $e — ${ExpressionValidator.validate(spark, e)}")
  private def no(e: String) = assert(
    ExpressionValidator.validate(spark, e).isLeft, s"should reject: $e")

  test("accepts the reference config vocabulary (§2.6)") {
    ok("UPPER(name)")
    ok("price * 100")
    ok("DATE_FORMAT(create_time, 'yyyy-MM-dd')")
    ok("CONCAT('Status: ', status)")
    ok("concat_ws('-', a, b)")
    ok("CASE WHEN x > 0 THEN 'pos' ELSE 'neg' END")
    ok("coalesce(a, b, 0)")
    ok("round(price * 1.1, 2)")
    ok("cast(n as string)")
    ok("substring(name, 1, 3)")
    ok("md5(name)")
  }

  test("graft native functions pass validation AND execute as transforms") {
    ok("graft_fnv1a32(text)")
    ok("graft_cosine(a, b)")
    no("graft.fnv(text)") // qualified names stay rejected
    // end-to-end: validated string → expr() → GraftExtensions-resolved
    // native expression → correct value
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq(("abc", 1L)).toDF("text", "id")
      .withColumn("h", expr("graft_fnv1a32(text)"))
      .collect()(0).getLong(2)
    assert(out == graft.functions.Fnv.hash32("abc", graft.functions.Fnv.Basis1))
  }

  test("rejects every reference blacklist keyword class") {
    // these don't even parse as scalar expressions
    no("DROP TABLE users")
    no("DELETE FROM users")
    no("TRUNCATE TABLE users")
    no("ALTER TABLE users ADD c INT")
    no("CREATE TABLE t (x INT)")
    no("GRANT ALL ON t TO x")
    no("REVOKE ALL ON t FROM x")
    no("EXECUTE p")
  }

  test("rejects what a substring blacklist cannot catch") {
    no("(SELECT max(x) FROM t)")          // scalar subquery
    no("exists(SELECT 1 FROM t)")         // predicate subquery
    no("reflect('java.lang.System', 'getProperty', 'user.dir')")
    no("java_method('java.lang.Runtime', 'getRuntime')")
    no("rand()")                          // non-deterministic → resume-unsafe
    no("uuid()")
    no("input_file_name()")
    no("current_database()")
    no("unknown_udf(x)")
    no("db.fn(x)")                        // qualified function
  }

  test("validateAll aggregates errors with table.column context") {
    val t = graft.core.TableMapping("users", columnTransformations = Seq(
      graft.core.ColumnTransformation("a", "UPPER(a)"),
      graft.core.ColumnTransformation("b", "rand()")))
    val e = intercept[IllegalArgumentException] {
      ExpressionValidator.validateAll(spark, t)
    }
    assert(e.getMessage.contains("users.b"))
  }
}
