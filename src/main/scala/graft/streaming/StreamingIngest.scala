package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming ingest of the `events` table (SURVEY §2.7: the
  * reference has no streaming; its resumable-cursor + checkpoint file is
  * a poor-man's offset store. Here the real thing: `readStream` →
  * watermark → tumbling window → sink).
  *
  * For the correctness gate the stream runs bounded with
  * `Trigger.AvailableNow` into an in-memory sink and the resulting table
  * is returned — stream results must equal the batch computation, which
  * is exactly what the DuckDB oracle checks.
  */
object StreamingIngest {

  /** Watermarked 1-hour tumbling-window counts per event type. Output
    * mode is `complete` so bounded runs emit every window (with `append`,
    * windows inside the final watermark delay would be withheld). */
  def windowCounts(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema // nanos→long via session conf
    val stream = spark.readStream.schema(schema).parquet(s"$dir/events.*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))

    val name = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** The PRODUCT-SURFACE variant of [[windowCounts]] (VERDICT r2 #3):
    * append mode to a DURABLE parquet sink with a streaming checkpoint.
    * Complete-mode + memory sink is right for the bounded oracle gate
    * but accumulates every window in state forever; here the watermark
    * CLOSES windows — each is emitted exactly once when the watermark
    * passes its end, then evicted from state, so state size is bounded
    * by the watermark horizon regardless of how long the stream runs.
    * Windows newer than `max(ts) - 1 hour` are still open at end of
    * input and deliberately withheld (they would emit on the next
    * trigger of a live stream).
    *
    * Returns the rows read back from the parquet sink — for a bounded
    * run that is exactly the batch aggregation restricted to closed
    * windows, which is what the oracle checks. */
  def windowCountsAppend(spark: SparkSession, dir: String): DataFrame = {
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_stream_append_" +
      math.abs(dir.hashCode).toString
    graft.util.Fs.deleteRecursive(new java.io.File(work))
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/events.*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))

    val q = stream.writeStream.format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(s"$work/out")
  }

  /** Custom stateful aggregation via `mapGroupsWithState` (the
    * KeyValueGroupedDataset path for state machines the built-in windows
    * can't express): running per-user event counts held in explicit
    * state. A bounded AvailableNow run processes the source as one
    * micro-batch, so each user emits exactly one update — equal to the
    * batch `GROUP BY user_id` count, which the oracle checks. */
  def statefulUserCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val updates = spark.readStream.schema(schema).parquet(s"$dir/events.*")
      .select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user, events, state) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "cnt")

    val name = "graft_state_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = updates.writeStream.format("memory").queryName(name)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming DEDUPLICATION: `dropDuplicates` on a key set with a
    * watermark bounding the dedup state (the streaming member of the
    * dedup family — exact dedup for a live ingest pipeline). The
    * emitted KEY SET equals the batch `SELECT DISTINCT`, which is what
    * the oracle checks; only the keys are returned because "which
    * duplicate arrived first" is an arrival-order artifact, not a
    * property of the data. */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/events.*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))

    val name = "graft_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Streaming INTO a live database: watermark-closed windows upserted
    * per micro-batch into a JDBC store via `foreachBatch` + the MERGE
    * sink — the streaming half of the transfer product. Exactly-once
    * lands by composition: the streaming checkpoint replays a failed
    * batch, and the keyed MERGE makes the replay a no-op (the same
    * idempotence contract as the batch engine's chunk writes).
    *
    * The sink takes the same `(dialect, writeParallelism)` posture as
    * `JdbcTransfer.transfer` (VERDICT r3): against a server-grade store
    * each batch writes per-partition in parallel; only in-process
    * embedded URLs default to one writer (the store serializes anyway).
    * The target table is probe-then-created so a RERUN — exactly the
    * checkpoint-replay scenario the exactly-once story rests on — falls
    * through to the idempotent MERGE instead of dying on
    * table-already-exists (ADVICE r3). */
  def windowCountsToJdbc(spark: SparkSession, dir: String, url: String,
                         table: String,
                         dialect: graft.sinks.JdbcUpsert.Dialect = graft.sinks.JdbcUpsert.Derby,
                         writeParallelism: Int = 0): Unit = {
    import graft.sinks.JdbcUpsert
    if (!graft.sources.JdbcCatalog.tableExists(url, table))
      graft.sources.JdbcCatalog.execute(url, s"CREATE TABLE $table (" +
        "w_start TIMESTAMP NOT NULL, event_type VARCHAR(64) NOT NULL, " +
        "cnt BIGINT, PRIMARY KEY (w_start, event_type))")
    val parallelism = JdbcUpsert.effectiveWriteParallelism(url, writeParallelism)
    // work/checkpoint dir keyed on (source, url, TABLE) with a real
    // digest: a table-less 32-bit hash let two streams to different
    // tables (or colliding pairs) delete each other's ACTIVE streaming
    // checkpoint mid-run
    val workId = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir $url $table".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val work = s"${System.getProperty("java.io.tmpdir")}/graft_sjdbc_$workId"
    graft.util.Fs.deleteRecursive(new java.io.File(work))
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/events.*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))

    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val toWrite = if (parallelism > 0) batch.coalesce(parallelism) else batch
        JdbcUpsert.write(toWrite, dialect, table,
          Seq("w_start", "event_type")) { () => new JdbcUpsert.ConnectionExecutor(url) }
        ()
      }
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** STREAM-STREAM interval join: each click joined to the same user's
    * purchases within the following 30 minutes — two watermarked
    * streams, state on both sides bounded by watermark + the interval
    * condition (Spark evicts a side's rows once the other side's
    * watermark passes the join range). Inner joins emit matches as
    * soon as both rows exist, so a bounded run emits exactly the batch
    * interval-join, which the oracle recomputes. */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    def src = spark.readStream.schema(schema).parquet(s"$dir/events.*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val clicks = src.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = src.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))

    val name = "graft_ssj_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Sessionized per-user event counts with a 30-minute gap — the
    * `session_window` stateful-aggregation shape (extension surface;
    * exercised by tests against a batch recomputation). */
  def sessionCounts(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/events.*")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("user_id"), col("cnt"))

    val name = "graft_sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }
}
