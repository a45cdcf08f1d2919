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

  /** [[columns]] with the type names canonicalized to the DuckDB/ANSI
    * vocabulary (`string`→`varchar`, `long`→`bigint`, `array<float>`→
    * `float[]`, …) — the HASH-COMPARABLE catalog surface (VERDICT r9
    * #5): an independent engine describing the same table must land on
    * the same (name, dtype) rows, which is exactly what a DDL-emitting
    * or cast-planning consumer needs the catalog to promise. Ordinals
    * are deliberately not projected here: the driver compare hashes
    * VALUES (row order is canonicalized away), and the reference
    * catalog's positional contract stays on [[columns]]. */
  def columnsPortable(spark: SparkSession, dir: String, table: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir, table).schema.fields.toSeq
      .map(f => (f.name, canonicalType(f.dataType)))
      .toDF("col_name", "dtype")
  }

  /** Spark → ANSI/DuckDB canonical type-name mapping (recursive through
    * arrays/maps). Unmapped types fall back to Spark's `simpleString`,
    * which a future gate would catch as a hash mismatch — loud, not
    * silent. */
  private[graft] def canonicalType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "bigint"
      case IntegerType => "integer"
      case ShortType => "smallint"
      case ByteType => "tinyint"
      case StringType => "varchar"
      case DoubleType => "double"
      case FloatType => "float"
      case BooleanType => "boolean"
      case DateType => "date"
      case TimestampType | TimestampNTZType => "timestamp"
      case BinaryType => "blob"
      case d: DecimalType => s"decimal(${d.precision},${d.scale})"
      case ArrayType(e, _) => canonicalType(e) + "[]"
      case MapType(k, v, _) => s"map(${canonicalType(k)}, ${canonicalType(v)})"
      case other => other.simpleString
    }
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
