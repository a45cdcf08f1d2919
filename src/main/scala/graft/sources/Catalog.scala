package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog introspection (S5/S6) — the reference queries backend system
  * catalogs (`SHOW COLUMNS` `mysql.go:382-404`,
  * `information_schema.columns` `postgresql.go:695-722`,
  * `system_schema.columns` `cassandra.go:462-527`). For parquet sources
  * the footer IS the catalog; this surfaces it as queryable metadata.
  */
object Catalog {

  /** Column inventory of a table: (ordinal, name, type, nullable).
    * Reports the schema of the QUERY SURFACE ([[Tables]]), not the raw
    * footer — the two differ exactly where the accessor adapts storage
    * (events.ts: stored nanos-as-long, exposed as timestamp); a catalog
    * that disagrees with the table it describes would mislead any
    * type-driven consumer (DDL emission, cast planning). */
  def columns(spark: SparkSession, dir: String, table: String): DataFrame = {
    import spark.implicits._
    val schema = Tables(spark, dir, table).schema
    schema.fields.zipWithIndex.map { case (f, i) =>
      (i.toLong, f.name, f.dataType.simpleString, f.nullable)
    }.toSeq.toDF("ordinal", "col_name", "data_type", "nullable")
  }

  /** Primary-key discovery (S6): engine metadata first (the config's
    * `primary_key` / `Tables.primaryKeys`), refusing unknown tables just
    * as the reference refuses PK-less tables (`mysql.go:216-218`). */
  def primaryKey(table: String): Seq[String] =
    Tables.primaryKeys.getOrElse(table,
      sys.error(s"no primary key metadata for table '$table'"))

  /** Existence probe (S7 analog for the file catalog) through the
    * Hadoop filesystem of the PATH — a local java.nio probe would
    * report every hdfs:///s3a:// table missing, which is exactly the
    * storage the 100 TB posture targets. */
  def tableExists(spark: SparkSession, dir: String, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
