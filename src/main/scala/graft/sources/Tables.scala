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
    if (name == "events") normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize `events.ts` to a microsecond TimestampType regardless of
    * how the fixture generation wrote it. Two generations exist:
    * TIMESTAMP(NANOS) — which Spark 4 only reads as a long under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set once in
    * graft.Sessions), converted here — and plain TIMESTAMP(MICROS),
    * which arrives as TIMESTAMP_NTZ (or TimestampType) and only needs a
    * cast so every downstream watermark/window/oracle sees one type.
    * Works on batch AND streaming frames (schema-only dispatch). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

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
