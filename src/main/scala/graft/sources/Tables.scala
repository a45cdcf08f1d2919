package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table access for the driver testdata layout
  * (`<dir>/<name>.parquet`, one file per table — see TESTDATA.md).
  *
  * This is the offline stand-in for the reference's catalog-introspected
  * sources (reference: `internal/migration/mysql/mysql.go:382-404` reads
  * `SHOW COLUMNS`; here the parquet footer is the catalog). Column
  * pruning and predicate pushdown reach the scan automatically because
  * everything downstream stays in the DataFrame API.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
      // read natively; with spark.sql.legacy.parquet.nanosAsLong=true
      // (set once at session build — graft.Sessions) it arrives as a
      // long, converted here to a microsecond TimestampType (the fixture
      // carries no sub-µs data).
      require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
        "build the session via graft.Sessions (needs nanosAsLong for events.ts)")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Primary (resume/upsert) keys per table — engine metadata, the
    * analog of the reference's PK introspection
    * (`mysql.go:681-737`, `postgresql.go:672-692`). */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey"),
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey"),
    "lineitem"   -> Seq("l_orderkey", "l_linenumber"),
    "events"     -> Seq("event_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
}
