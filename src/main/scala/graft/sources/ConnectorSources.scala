package graft.sources

import graft.core.{MigrationSpec, TableMapping}

/** Connector option builders for the remaining reference backends (S3
  * Mongo cursor scan, S4 Cassandra token-range scan). Like
  * [[JdbcSource]], option construction is pure and unit-tested; the
  * connectors themselves (`mongo-spark-connector`,
  * `spark-cassandra-connector`) are not on the offline classpath, so
  * execution is deployment-gated. Both connectors natively provide what
  * the reference hand-rolls: the Mongo connector partitions by `_id`
  * ranges (the `{_id:{$gt:last}}` cursor loop, `mongodb.go:264-360`),
  * and the Cassandra connector splits by token ranges with token-aware
  * routing (`cassandra.go:578-645`, `:1174`).
  */
object ConnectorSources {

  /** `spark.read.format("mongodb")` options (S3). */
  def mongoOptions(connectionUri: String, database: String,
                   table: TableMapping, mig: MigrationSpec): Map[String, String] = Map(
    "connection.uri" -> connectionUri,
    "database" -> database,
    "collection" -> table.name,
    // schema-inference sample (NOT read batching — the v10 connector's
    // cursor batching is governed by the partitioner below; the
    // reference's batch_size (mongodb.go:314-316) maps to the
    // partitioner's page size, in rows)
    "sampleSize" -> "1000",
    "partitioner" -> "com.mongodb.spark.sql.connector.read.partitioner.PaginateIntoPartitionsPartitioner",
    // honor the CONFIGURED page size: flooring it at 1000 silently
    // overrode small batch_size values — exactly the wide-document
    // workloads where the reference deliberately pages small
    "partitioner.options.max.number.of.documents.per.partition" ->
      math.max(1, mig.batchSize).toString)

  /** `spark.read.format("org.apache.spark.sql.cassandra")` options (S4). */
  def cassandraOptions(keyspace: String, table: TableMapping,
                       mig: MigrationSpec): Map[String, String] = Map(
    "keyspace" -> keyspace,
    "table" -> table.name,
    // rows per driver page, the reference's PageSize (cassandra.go:645)
    "spark.cassandra.input.fetch.sizeInRows" -> mig.batchSize.toString,
    "spark.cassandra.read.timeoutMS" -> (mig.timeoutSec * 1000L).toString)

  /** Cassandra write-side options — upserts are native; per-cell TTL
    * shadows (`ttl_<col>`, [[graft.sinks.TtlColumns]]) map to the
    * connector's `ttl` write option per column group (K4,
    * `cassandra.go:677-679`). */
  def cassandraWriteOptions(keyspace: String, table: TableMapping,
                            mig: MigrationSpec): Map[String, String] = Map(
    "keyspace" -> keyspace,
    "table" -> table.target,
    "spark.cassandra.output.batch.size.rows" -> mig.batchSize.toString,
    "spark.cassandra.output.consistency.level" -> "QUORUM")
}
