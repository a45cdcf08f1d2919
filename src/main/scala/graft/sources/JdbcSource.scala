package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{MigrationSpec, TableMapping}

/** JDBC read path (S1/S2 on a real database): the reference's keyset
  * pagination loop (`WHERE pk > ? ORDER BY pk LIMIT ?`,
  * `mysql.go:578-679`) becomes Spark's range-partitioned parallel scan —
  * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` split the
  * key space so every executor reads its own slice in one pass
  * (strictly better than serial keyset pages; SURVEY §4).
  *
  * Option construction is pure and unit-tested; executing it needs the
  * JDBC driver jar on the classpath and a reachable database, which the
  * offline build does not have — the parquet path stands in for CI.
  */
object JdbcSource {

  /** Partition count of a range-partitioned read: one partition per
    * ~batch_size keys, capped by `parallelism`. Pure — callers deciding
    * a writer coalesce use this instead of materializing `.rdd` just to
    * read the count back off the plan. Span arithmetic in BigInt: a
    * signed key space actually spanning the Long range would overflow
    * `hi - lo` negative and silently collapse the scan to ONE serial
    * partition. */
  def numPartitions(mig: MigrationSpec, bounds: (Long, Long),
                    parallelism: Int): Int = {
    val span = BigInt(bounds._2) - BigInt(bounds._1)
    val ideal = span / BigInt(math.max(1, mig.batchSize)) + 1
    math.max(1, (ideal min BigInt(math.max(1, parallelism))).toInt)
  }

  /** Reader options for a partitioned scan of one table.
    *
    * @param bounds (min, max) of the numeric partition column — obtained
    *               from a `SELECT min(pk), max(pk)` probe (A3) or carried
    *               in the spec; required for range partitioning.
    */
  def readerOptions(url: String, table: TableMapping, mig: MigrationSpec,
                    pk: String, bounds: (Long, Long),
                    parallelism: Int): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table.name,
    "partitionColumn" -> pk,
    "lowerBound" -> bounds._1.toString,
    "upperBound" -> bounds._2.toString,
    "numPartitions" -> numPartitions(mig, bounds, parallelism).toString,
    // per-round-trip row count, the reference's batch_size (config.go:50)
    "fetchsize" -> mig.batchSize.toString,
    // connect/read timeout parity (config.go:59)
    "queryTimeout" -> mig.timeoutSec.toString)

  def read(spark: SparkSession, url: String, table: TableMapping,
           mig: MigrationSpec, pk: String, bounds: (Long, Long)): DataFrame =
    spark.read.format("jdbc")
      .options(readerOptions(url, table, mig, pk, bounds,
        spark.sparkContext.defaultParallelism))
      .load()
}
