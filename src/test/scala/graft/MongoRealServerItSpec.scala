package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{MigrationSpec, TableMapping}
import graft.sources.ConnectorSources

/** REAL-SERVER execution of the Mongo connector options (VERDICT r14
  * #5 — the S3 sibling of [[JdbcRealServerItSpec]]): the exact option
  * map [[ConnectorSources.mongoOptions]] builds (paginating `_id`
  * partitioner, configured page size) drives a live write → partitioned
  * cursor read → resume-filtered read against a real MongoDB the moment
  * one is reachable.
  *
  * Env-gated: set `GRAFT_IT_MONGO_URI` to a full connection string
  * (credentials embedded) with the `mongo-spark-connector` jar on the
  * test classpath. In this sandbox — no connector jar, no egress — the
  * var is unset and every test CANCELS (reported skipped, never
  * failed). Format names are strings, so this compiles offline; once
  * the var IS set, a missing connector jar is a loud assume-cancel with
  * the class name, and anything after that is a real failure.
  */
class MongoRealServerItSpec extends AnyFunSuite {

  private val Db = "graft_it"
  private val Coll = "graft_it_events"

  private def connectionUri: String = {
    val uri = sys.env.get("GRAFT_IT_MONGO_URI").map(_.trim).filter(_.nonEmpty)
    assume(uri.nonEmpty, "GRAFT_IT_MONGO_URI not set — real-server Mongo " +
      "execution skipped (sandbox has no connector jar / egress); set it " +
      "to a MongoDB connection string to run")
    // connector presence is part of the contract once the env opts in —
    // cancel with the exact missing class, not a ClassNotFound stack
    assume(
      try { Class.forName(
        "com.mongodb.spark.sql.connector.MongoTableProvider"); true }
      catch { case _: ClassNotFoundException => false },
      "GRAFT_IT_MONGO_URI is set but mongo-spark-connector is not on the " +
        "classpath (com.mongodb.spark.sql.connector.MongoTableProvider)")
    uri.get
  }

  test("Mongo: paginating cursor read + resume filter execute against a real server") {
    val uri = connectionUri
    val spark = Sessions.builder("graft-mongo-it", 4).getOrCreate()
    import spark.implicits._
    // 100 docs with a monotone key — the reference's `_id > last` cursor
    // resume maps to a `$gt` match on the key column here
    val docs = (0L until 100L).toDF("k")
      .withColumn("payload",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("doc-"),
          org.apache.spark.sql.functions.col("k")))
    docs.write.format("mongodb")
      .option("connection.uri", uri)
      .option("database", Db)
      .option("collection", Coll)
      .mode("overwrite")
      .save()
    // read back THROUGH the option builder under test: page size 10 →
    // the paginating partitioner must still return every row exactly once
    val opts = ConnectorSources.mongoOptions(uri, Db,
      TableMapping(name = Coll), MigrationSpec(batchSize = 10))
    val back = spark.read.format("mongodb").options(opts).load()
    assert(back.count() === 100L, "partitioned cursor read lost or duplicated rows")
    // resume semantics (mongodb.go:264-360's {_id:{$gt:last}} loop): a
    // $gt match on the monotone key reads exactly the uncompleted tail
    val resumed = spark.read.format("mongodb").options(opts)
      .option("aggregation.pipeline", """{"$match": {"k": {"$gt": 49}}}""")
      .load()
    assert(resumed.count() === 50L, "resume filter did not skip completed rows")
  }
}
