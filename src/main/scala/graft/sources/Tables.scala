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
    val conf = df.sparkSession.conf
    df.schema("ts").dataType match {
      case LongType =>
        // a LongType ts only appears when the session set nanosAsLong;
        // if it did NOT, the fixture/session are mismatched and the
        // parquet reader would fail deep inside a job — fail actionably
        // here instead (ADVICE r7; graft.Sessions sets both keys)
        require(conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
            .contains("true"),
          "events.ts is TIMESTAMP(NANOS) but the session lacks " +
            "spark.sql.legacy.parquet.nanosAsLong=true — build sessions " +
            "via graft.Sessions.builder")
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // the NTZ→Timestamp cast reinterprets wall-clock in the SESSION
        // zone; it is only byte-stable because Sessions pins UTC —
        // enforce that instead of silently shifting every event time.
        // Read the EFFECTIVE value (no-default get resolves the SQLConf
        // default — a provided default would mask it) and compare zone
        // RULES, so "Etc/UTC"/"+00:00"/an unset key in a UTC JVM all
        // pass while a genuinely shifted session still fails
        val tz = conf.get("spark.sql.session.timeZone")
        val utc = try {
          val rules = java.time.ZoneId.of(tz).getRules
          rules.isFixedOffset &&
            rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
        } catch { case _: Exception => false }
        require(utc,
          s"events.ts is TIMESTAMP_NTZ and the session timezone ('$tz') " +
            "is not UTC — build sessions via graft.Sessions.builder")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
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
