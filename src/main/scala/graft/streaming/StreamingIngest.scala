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

  /** The shared events source: schema probe (nanos→long via session
    * conf), file stream, micros timestamp. ONE definition — the ts
    * conversion previously lived in seven copies, and fixes were
    * already drifting between them (the work-dir hashing divergence
    * found in review). No watermark here: consumers that rename `ts`
    * before watermarking (the stream-stream join) would otherwise trip
    * "Redefining watermark is disallowed". */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.sources.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(s"$dir/events.*"))
  }

  /** [[eventsRaw]] + the standard 1-hour watermark on `ts` (every
    * single-stream consumer). */
  private def eventsStream(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir).withWatermark("ts", "1 hour")

  /** Run a bounded stream into a uniquely-named memory sink and return
    * the sink table. Gate-harness shape only: the memory sink collects
    * on the driver, which is fine for a bounded correctness run and
    * wrong for production (the durable twins write parquet/JDBC). */
  private def runToMemory(stream: DataFrame, prefix: String,
                          mode: String): DataFrame = {
    val spark = stream.sparkSession
    val name = prefix + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Work dir unique to (purpose, identity strings): a real digest, not
    * a 32-bit `hashCode` — colliding identities would wipe each other's
    * ACTIVE streaming checkpoint mid-run (found once on the JDBC sink,
    * then AGAIN on the append sink in review; now one definition). */
  private def workDir(purpose: String, identity: String): String = {
    val work = graft.util.Fs.workDir(purpose, identity)
    graft.util.Fs.deleteRecursive(new java.io.File(work))
    work
  }

  /** The streaming work-dir purposes [[workDir]] is called with — the
    * prune target set. Kept next to the call sites so a new purpose
    * cannot silently escape GC. */
  private[graft] val WorkDirPurposes =
    Seq("stream_append", "sjdbc", "stream_img_dedup", "stream_vid_dedup",
      "stream_span_index", "stream_media_quarantine", "stream_ann_index",
      "stream_vid_quarantine", "stream_si_dedup", "stream_ri_dedup",
      "stream_vsi_dedup", "stream_vsti_dedup", "stream_ci_dedup",
      "stream_vci_dedup", "stream_ati_dedup", "stream_mi_dedup",
      "stream_roti_dedup", "stream_vmi_dedup", "stream_acs_dedup",
      "stream_vroti_dedup")

  /** GC terminated streaming work dirs (VERDICT r6 #7): the durable
    * sinks key scratch space (checkpoints + parquet out dirs) by
    * (purpose, identity) digest under tmpdir, and nothing deleted them
    * after termination — a long-lived host accumulates one dir per
    * (dataset, sink) forever while `--prune-completed` GC'd only the
    * TRANSFER side's artifacts. Deletes every graft streaming work dir
    * except those named in `activeCheckpoints` (pass the checkpoint
    * locations of any still-running queries; the CLI prunes after its
    * session stopped, so none exist there). Pruning only costs the next
    * run its resume state: every entry point wipes and recreates its
    * own dir at start, so a rerun after prune is a clean bounded run —
    * proven in the spec. Returns the pruned count. */
  def pruneWorkDirs(activeCheckpoints: Seq[String] = Nil,
                    log: String => Unit = _ => ()): Int = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val prefixes = WorkDirPurposes.map(p => s"graft_${p}_")
    val victims = Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && prefixes.exists(f.getName.startsWith))
      .filterNot(f => activeCheckpoints.exists(_.contains(f.getName)))
    victims.foreach { f =>
      graft.util.Fs.deleteRecursive(f)
      log(s"pruned streaming work dir ${f.getName}")
    }
    victims.length
  }

  private def windowCountsAgg(stream: DataFrame): DataFrame = stream
    .groupBy(window(col("ts"), "1 hour"), col("event_type"))
    .agg(count(lit(1)).as("cnt"))
    .select(col("window.start").as("w_start"), col("event_type"), col("cnt"))

  /** Watermarked 1-hour tumbling-window counts per event type. Output
    * mode is `complete` so bounded runs emit every window (with `append`,
    * windows inside the final watermark delay would be withheld). */
  def windowCounts(spark: SparkSession, dir: String): DataFrame =
    runToMemory(windowCountsAgg(eventsStream(spark, dir)), "graft_stream_", "complete")

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
    val work = workDir("stream_append", dir)
    val q = windowCountsAgg(eventsStream(spark, dir)).writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(s"$work/out")
  }

  /** Custom stateful aggregation via `mapGroupsWithState` (the
    * KeyValueGroupedDataset path for state machines the built-in windows
    * can't express): running per-user event counts held in explicit
    * state. Counts are cumulative, so the final value per user is the
    * MAX over every emitted update — equal to the batch
    * `GROUP BY user_id` count whether the bounded run lands in one
    * micro-batch or several. NULL user ids are excluded up front (the
    * typed `.as[Long]` would throw on them). */
  def statefulUserCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val updates = eventsStream(spark, dir)
      .where(col("user_id").isNotNull)
      .select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user, events, state) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (user, total)
      }
      .toDF("user_id", "cnt")
    runToMemory(updates, "graft_state_", "update")
      .groupBy("user_id").agg(max(col("cnt")).as("cnt"))
  }

  /** Streaming DEDUPLICATION, gate variant: `dropDuplicates` on the key
    * set. The emitted KEY SET equals the batch `SELECT DISTINCT`, which
    * is what the oracle checks; only the keys are returned because
    * "which duplicate arrived first" is an arrival-order artifact, not
    * a property of the data.
    *
    * State honesty: because the event-time column is NOT part of the
    * key set, Spark keeps one state entry per distinct key FOREVER —
    * the watermark does not evict it. That is the price of the exact
    * global-distinct contract, acceptable for a bounded gate run and
    * for key spaces that fit state. A LIVE pipeline should use
    * [[streamingDedupLive]], whose within-watermark contract bounds
    * state by the horizon. */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame =
    runToMemory(
      eventsStream(spark, dir)
        .dropDuplicates("user_id", "event_type")
        .select(col("user_id"), col("event_type")),
      "graft_dedup_", "append")

  /** Streaming dedup, LIVE variant: `dropDuplicatesWithinWatermark` —
    * duplicates are suppressed when they arrive within the watermark
    * horizon of the kept row, and state IS evicted as the watermark
    * advances, so state size is bounded by the horizon regardless of
    * how long the stream runs or how many distinct keys exist. The
    * trade: re-occurrences farther apart than the horizon re-emit (an
    * order-dependent result — no deterministic batch-SQL oracle, so
    * this variant is test-gated on set bounds rather than hash-gated:
    * its output is a superset of the distinct key set and a subset of
    * the raw key stream). */
  def streamingDedupLive(spark: SparkSession, dir: String): DataFrame =
    runToMemory(
      eventsStream(spark, dir)
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type")),
      "graft_dedupw_", "append")

  /** Stream-STATIC incremental dedup — the streaming twin of
    * [[graft.ops.Dedup.incrementalNearDups]]: incoming documents are
    * screened against the standing corpus index in micro-batches
    * (near-real-time admission control for the training corpus). The
    * static side is the batch operator's own capped band buckets plus
    * the corpus shingle sets; the stream side bands its rows with the
    * aggregation-free signature ([[graft.ops.Dedup.narrowBandRows]] —
    * a streaming groupBy could not feed a join in append mode), then
    * candidates flow through two stream-static equi-joins and the
    * exact-Jaccard confirm, all append-safe.
    *
    * A pair confirms once per shared band; watermark-aged keyed dedup
    * collapses the duplicates EXACTLY (a source row's band rows never
    * straddle micro-batches, so pair duplicates are co-batch by
    * construction — the r10 media-twin argument), with state bounded
    * at ~one micro-batch of pairs instead of the whole output (the
    * plain stateful dropDuplicates grew state with the RESULT — the
    * shape the 10× media sweep OOMed; `maxFilesPerTrigger` keeps
    * AvailableNow micro-batches file-granular so the watermark has
    * boundaries to purge across). Result equals the batch operator
    * row-for-row — asserted in the spec and hash-gated against the
    * SAME DuckDB oracle as `dedup_incremental`. */
  def incrementalDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Dedup
    val docsSchema = spark.read.parquet(s"$dir/documents.parquet").schema
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 2 === 0)
    val cBuckets = Dedup.cappedBuckets(corpus, numHashes = 12, bands = 4,
      shingleLen = 3, bucketCap = 256, observed = false)
    val cSh = Dedup.shingleSets(corpus, 3)
      .select(col("doc_id").as("corpus_id"), col("sh").as("shc"))
    val batch = spark.readStream.schema(docsSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(s"$dir/documents.*")
      .where(col("doc_id") % 2 === 1)
    val confirmed = Dedup.narrowBandRows(batch)
      .join(cBuckets, "bk")
      .select(col("doc_id").as("batch_id"), col("sh").as("shb"),
        explode(col("ids")).as("corpus_id"))
      .join(cSh, "corpus_id")
      .withColumn("jaccard", graft.functions.Portable.fx(
        size(array_intersect(col("shb"), col("shc"))).cast("double") /
          size(array_union(col("shb"), col("shc"))).cast("double"), 6))
      .where(col("jaccard") >= 0.5)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .select("batch_id", "corpus_id", "jaccard")
    runToMemory(confirmed, "graft_incr_", "append")
  }

  /** The incremental IMAGE near-dup screen as a stream — new image
    * batches arriving continuously, screened against the standing
    * corpus aHash index ([[graft.ops.Multimodal.incrementalScreen]],
    * the media analog of [[incrementalDedupStream]]): the per-row
    * decode + fingerprint runs inside the micro-batch (mapPartitions
    * on the streaming frame — embarrassingly parallel, no shuffle),
    * the band join and the Hamming confirm are STREAM-STATIC joins
    * (the batch hash is carried through the band join precisely so no
    * stream-stream join arises), and duplicate multi-band hits dedup
    * through the stateful `dropDuplicates` operator. No per-batch
    * candCap: `row_number` windows are illegal on streams, so the
    * streaming twin emits every confirmed pair (the oracle applies the
    * same uncapped rule). Result equals the batch screen minus the cap
    * — hash-gated against the same CTE chain.
    *
    * Sink is the DURABLE parquet path ([[windowCountsAppend]]'s
    * posture), not the memory sink: the uncapped pair stream is the
    * one streaming gate whose result is corpus-sized (≈2M rows at
    * sf0.1), and a memory sink serializes all of it through the
    * driver — the parallel parquet write is what production runs
    * anyway. */
  def imageDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    def hashes(df: DataFrame) = Multimodal.imageAHash(
      df.select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.syntheticBmp(id))))
        .toDF("id", "img"), "id", "img").toDF()
    // MATERIALIZE the standing index (eager localCheckpoint): the
    // corpus feeds BOTH sides of the screen (band index + hash confirm)
    // and a lazy plan re-decodes it per consumer per micro-batch —
    // worse, the planner's size underestimate of the derived frame
    // picks a BROADCAST for the stream-static joins, which at 10× data
    // dies with "not enough memory to build and broadcast" (measured;
    // streaming has no AQE to re-plan it). The checkpointed frame
    // reports conservative stats, so the joins plan as shuffles — the
    // only shape that survives a corpus-scale static side.
    val corpus = hashes(spark.read.parquet(s"$dir/events.parquet")
      .where(expr("event_id div 20") % 2 === 0)).localCheckpoint(true)
    // bounded micro-batches: a corpus-scale source in ONE AvailableNow
    // batch holds the whole run's pair state at once no matter how the
    // dedup ages it (measured OOM at 10×); file-granular batches keep a
    // source row's band hits co-batch (the dedup-exactness invariant)
    // while the watermark purges pair state BETWEEN batches
    val batch = hashes(spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(s"$dir/events.*")
      .where(expr("event_id div 20") % 2 === 1))
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "ahash",
        group = concat(col("width").cast("string"), lit("x"),
          col("height").cast("string")),
        bandBits = 12, numBands = 4, maxHamming = 4, bucketCap = 64,
        metric = "image_ahash_stream", observed = false, noBroadcast = true)
      // multi-band hits of one pair are born in ONE micro-batch (a
      // source row's band rows never straddle batches), so
      // watermark-aged dedup state is EXACT here — not the lossy
      // streamingDedupLive trade — while bounding state to ~one
      // micro-batch's pairs. The plain stateful dropDuplicates kept
      // every emitted pair forever: state grew with the OUTPUT and
      // OOMed the 10× scale run (measured). current_timestamp() is
      // the batch-constant trigger time; exactness needs only co-batch
      // retention, so 1 second of slack lets state purge between the
      // bounded micro-batches instead of accumulating across them.
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_img_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The SCALE-INVARIANT screen as a stream (r14) — the streaming leg
    * of the cross-resolution key, completing its batch / incremental /
    * streaming triple: the standing corpus's fixed-grid thumb index
    * (checkpointed static side, shuffle-join shape) screens arriving
    * NN-2× rescaled re-uploads; each hits its original at Hamming 0 —
    * invisible to [[imageDedupStream]]'s dimension-grouped key. Same
    * bounded-micro-batch + watermark-aged co-batch dedup posture as
    * the image stream; oracle = the batch screen without the candCap
    * (stream ≡ batch hit-for-hit). */
  def scaleInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // id scheme (ADVICE r15 #1): original e → 2e, re-upload → 2e+1 —
    // provably disjoint at any sweep scale (matches the batch gates)
    val corpus = Multimodal.imageScaleInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(id => (2 * id, Multimodal.syntheticBmp(id))))
        .toDF("id", "img"), "id", "img").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.imageScaleInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 7 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscale2x(Multimodal.syntheticBmp(e)))))
        .toDF("id", "img"), "id", "img").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "ahash", group = lit("thumb"),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "img_si_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_si_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The RATE-INVARIANT screen as a stream (r15) — the audio leg of
    * the scale-invariant streaming family, completing the cross-rate
    * key's batch / incremental / streaming triple exactly as
    * [[scaleInvariantDedupStream]] did for images: the standing
    * corpus's fixed-grid signature index (checkpointed static side,
    * shuffle-join shape) screens arriving ZOH-2× resampled re-uploads;
    * each hits its original at Hamming 0 — invisible to the
    * rate-grouped audio screen. Same bounded-micro-batch +
    * watermark-aged co-batch dedup posture; oracle = the batch screen
    * without the candCap (stream ≡ batch hit-for-hit). */
  def rateInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // id scheme (ADVICE r15 #1): original e → 2e, re-upload → 2e+1 —
    // provably disjoint at any sweep scale (matches the batch gates)
    val corpus = Multimodal.audioRateInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(id => (2 * id, Multimodal.syntheticWavMixed(id))))
        .toDF("id", "clip"), "id", "clip").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.audioRateInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 7 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.zohUpsample2x(Multimodal.syntheticWavMixed(e)))))
        .toDF("id", "clip"), "id", "clip").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "rfp", group = lit("rate"),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "aud_ri_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_ri_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The SCALE-INVARIANT VIDEO screen as a stream (r16) — the video
    * leg of the invariant-key streaming family, completing the
    * cross-resolution video key's batch / incremental / streaming
    * triple exactly as [[scaleInvariantDedupStream]] did for images:
    * the standing corpus's fixed-grid thumb-signature index
    * (checkpointed static side, shuffle-join shape) screens arriving
    * NN-2× rescaled transcodes; each hits its original at Hamming 0 —
    * invisible to [[videoDedupStream]]'s dimension-grouped key. Same
    * bounded-micro-batch + watermark-aged co-batch dedup posture;
    * oracle = the batch screen without the candCap (stream ≡ batch
    * hit-for-hit). Ids: original e → 2e, transcode → 2e+1 (disjoint
    * at any sweep scale). */
  def videoScaleInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.videoScaleInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(e => (2 * e, Multimodal.syntheticVideoMp4(e))))
        .toDF("id", "vid"), "id", "vid").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.videoScaleInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 7 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscaleVideo2x(Multimodal.syntheticVideoMp4(e)))))
        .toDF("id", "vid"), "id", "vid").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "sig",
        group = concat(lit("vthumb:"), col("n_key").cast("string")),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "vid_si_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_vsi_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The SCALE+STRIDE-INVARIANT video screen as a stream (r16) — the
    * composition key's streaming leg, completing its batch /
    * incremental / streaming triple: the standing corpus's
    * slot-sampled thumb-signature index (checkpointed static side,
    * shuffle-join shape) screens arriving NN-2× re-muxed rescales of
    * the keyStride-varying fixtures; each hits its original at
    * Hamming 0 — invisible to both parent keys' streams. Same
    * bounded-micro-batch + watermark-aged co-batch dedup posture;
    * oracle = the batch screen without the candCap. */
  def videoScaleTimeInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.videoScaleInvariantHashTimeAligned(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(e => (2 * e, Multimodal.syntheticVideoMp4T(e))))
        .toDF("id", "vid"), "id", "vid").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.videoScaleInvariantHashTimeAligned(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 7 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscaleVideo2x(Multimodal.syntheticVideoMp4T(e)))))
        .toDF("id", "vid"), "id", "vid").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "sig", group = lit("vthumb_t"),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "vid_sti_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_vsti_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The CROP/LETTERBOX-INVARIANT image screen as a stream (r17,
    * VERDICT r16 #3) — the streaming leg of the cross-layout key,
    * completing its batch / incremental / streaming triple: the
    * standing corpus's content-box thumb index (checkpointed static
    * side, shuffle-join shape) screens arriving NN-2×-upscaled
    * LETTERBOXED re-uploads; each hits its original at Hamming 0 —
    * invisible to both [[imageDedupStream]]'s dimension-grouped key
    * AND [[scaleInvariantDedupStream]]'s full-frame thumb. Same
    * bounded-micro-batch + watermark-aged co-batch dedup posture;
    * oracle = the batch screen without the candCap. */
  def cropInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.imageCropInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(id => (2 * id, Multimodal.syntheticBmp(id))))
        .toDF("id", "img"), "id", "img").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.imageCropInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 5 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscale2x(Multimodal.letterbox(
            Multimodal.syntheticBmp(e),
            1 + (e % 3).toInt, 1 + (e % 2).toInt, 2, 1)))))
        .toDF("id", "img"), "id", "img").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "ahash", group = lit("cbox"),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "img_ci_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_ci_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The CROP/LETTERBOX-INVARIANT video screen as a stream (r17) —
    * the video leg of the cross-layout streaming family: the standing
    * corpus's content-box clip-signature index screens arriving
    * letterboxed-and-NN-2×-rescaled transcodes; each hits its original
    * at Hamming 0 — invisible to the dimension-grouped AND the
    * full-frame scale-invariant video streams. Same posture as
    * [[videoScaleInvariantDedupStream]]. */
  def videoCropInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.videoCropInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(e => (2 * e, Multimodal.syntheticVideoMp4(e))))
        .toDF("id", "vid"), "id", "vid").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.videoCropInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 5 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscaleVideo2x(Multimodal.letterboxVideo(
            Multimodal.syntheticVideoMp4(e),
            1 + (e % 3).toInt, 1 + (e % 2).toInt, 2, 1)))))
        .toDF("id", "vid"), "id", "vid").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "sig",
        group = concat(lit("vcbox:"), col("n_key").cast("string")),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "vid_ci_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_vci_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The MIRROR-INVARIANT image screen as a stream (r17) — the
    * orientation leg of the invariant-key streaming family: the
    * standing corpus's canonical-orientation thumb index screens
    * arriving mirrored-and-NN-2×-upscaled re-uploads; each hits its
    * original at Hamming 0 — invisible to every other image stream
    * (the scale/crop keys hash the uploaded orientation only). Same
    * posture as [[scaleInvariantDedupStream]]. */
  def mirrorInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.imageMirrorInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(id => (2 * id, Multimodal.syntheticBmp(id))))
        .toDF("id", "img"), "id", "img").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.imageMirrorInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 3 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscale2x(Multimodal.mirrorBmp(
            Multimodal.syntheticBmp(e))))))
        .toDF("id", "img"), "id", "img").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "ahash", group = lit("mthumb"),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "img_mi_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_mi_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The TRIM-INVARIANT audio screen as a stream (r17, VERDICT
    * r16 #4) — the audio leg of the cross-edit streaming family: the
    * standing corpus's onset-anchored signature index screens arriving
    * silence-padded ZOH-2× re-uploads; each hits its original at
    * Hamming 0 — invisible to the frame-count-grouped AND the
    * fixed-grid rate-invariant audio streams. Same posture as
    * [[rateInvariantDedupStream]]. */
  def trimInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // signature-0 clips (degenerate: no energy onset) are excluded
    // from both sides, mirroring audioTrimInvariantPairs (ADVICE
    // r17 #2) — in the single 'trim' group two distinct silent clips
    // would otherwise confirm against each other at Hamming 0
    val corpus = Multimodal.audioTrimInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(e => (2 * e, Multimodal.syntheticWavMixed(e))))
        .toDF("id", "clip"), "id", "clip").toDF()
      .filter(col("rfp") =!= 0L)
      .localCheckpoint(true)
    val batch = Multimodal.audioTrimInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 5 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.padSilence(
            Multimodal.zohUpsample2x(Multimodal.syntheticWavMixed(e)),
            1 + (e % 5).toInt, 1 + (e % 3).toInt))))
        .toDF("id", "clip"), "id", "clip").toDF()
      .filter(col("rfp") =!= 0L)
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "rfp", group = lit("trim"),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "aud_ti_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_ati_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The ROTATION-INVARIANT image screen as a stream (r18, VERDICT
    * r17 #4) — the dihedral-orbit leg of the invariant-key streaming
    * family: the standing corpus's D4-canonical thumb index screens
    * arriving rotated-and-NN-2×-upscaled re-uploads; each hits its
    * original at Hamming 0 — invisible to every other image stream
    * including the mirror stream (whose orbit contains no rotation).
    * Same posture as [[mirrorInvariantDedupStream]]. */
  def rotationInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.imageRotationInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(id => (2 * id, Multimodal.syntheticBmp(id))))
        .toDF("id", "img"), "id", "img").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.imageRotationInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 4 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscale2x(Multimodal.rotateBmp(
            Multimodal.syntheticBmp(e), 1 + (e % 3).toInt)))))
        .toDF("id", "img"), "id", "img").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "ahash", group = lit("rthumb"),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "img_roti_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_roti_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The MIRROR-INVARIANT video screen as a stream (r18, VERDICT
    * r17 #3) — the orientation leg of the video streaming family: the
    * standing corpus's per-frame-orbit-canonical clip-signature index
    * screens arriving frame-mirrored-and-NN-2×-rescaled transcodes;
    * each hits its original at Hamming 0 — invisible to the
    * dimension-grouped, scale-invariant AND crop-invariant video
    * streams (all hash the uploaded orientation). Same posture as
    * [[videoScaleInvariantDedupStream]]. */
  def videoMirrorInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.videoMirrorInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(e => (2 * e, Multimodal.syntheticVideoMp4(e))))
        .toDF("id", "vid"), "id", "vid").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.videoMirrorInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 3 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscaleVideo2x(Multimodal.mirrorVideoMp4(
            Multimodal.syntheticVideoMp4(e))))))
        .toDF("id", "vid"), "id", "vid").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "sig",
        group = concat(lit("vmthumb:"), col("n_key").cast("string")),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "vid_mi_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_vmi_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The ROTATION-INVARIANT video screen as a stream (r18) — the
    * dihedral-orbit video leg: the standing corpus's per-frame
    * D4-canonical clip-signature index screens arriving
    * rotated-and-NN-2×-rescaled transcodes; each hits its original at
    * Hamming 0 — invisible to every other video stream including the
    * mirror stream. Same posture as
    * [[videoMirrorInvariantDedupStream]]. */
  def videoRotationInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.videoRotationInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(e => (2 * e, Multimodal.syntheticVideoMp4(e))))
        .toDF("id", "vid"), "id", "vid").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.videoRotationInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .filter((e: Long) => e % 4 == 0)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.nnUpscaleVideo2x(Multimodal.rotateVideoMp4(
            Multimodal.syntheticVideoMp4(e), 1 + (e % 3).toInt)))))
        .toDF("id", "vid"), "id", "vid").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "sig",
        group = concat(lit("vrthumb:"), col("n_key").cast("string")),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "vid_roti_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_vroti_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The CHANNEL-SWAP axis at the STREAM boundary (r18, VERDICT
    * r17 #3 — the audio orientation leg): arriving L/R-swapped AND
    * ZOH-2×-resampled re-uploads screen against the standing corpus's
    * rate-invariant signature index and hit their originals at
    * Hamming 0 — the energy key folds channels, so the swap vanishes
    * from the signature by construction (spec-proven), while the
    * composed copy is invisible to both the (channels, n_windows)-
    * grouped exact window screen (frame count changes) and the
    * byte-exact sample fingerprint (interleaved order changes). Same
    * machinery as [[rateInvariantDedupStream]] — deliberately: the
    * gate demonstrates the EXISTING key absorbing a new edit axis, not
    * a new key. */
  def channelSwapInvariantDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val corpus = Multimodal.audioRateInvariantHash(
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(id => (2 * id, Multimodal.syntheticWavMixed(id))))
        .toDF("id", "clip"), "id", "clip").toDF()
      .localCheckpoint(true)
    val batch = Multimodal.audioRateInvariantHash(
      spark.readStream.schema(evSchema)
        .option("maxFilesPerTrigger", "4")
        .parquet(s"$dir/events.*")
        .select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        // stereo rows only: swap on mono is the identity, and the
        // fixture plan gives odd events two channels
        .filter((e: Long) => e % 4 == 1)
        .mapPartitions(_.map(e =>
          (2 * e + 1, Multimodal.swapChannels(Multimodal.zohUpsample2x(
            Multimodal.syntheticWavMixed(e))))))
        .toDF("id", "clip"), "id", "clip").toDF()
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "rfp", group = lit("rate"),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "aud_cs_stream", observed = false, noBroadcast = true)
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 second")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_acs_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
  }

  /** The QUARANTINE tier at the STREAM boundary (round 12, completing
    * VERDICT r11 #1): in a stream, a corrupt asset is strictly WORSE
    * than in batch — the failed micro-batch retries the same files
    * forever and the pipeline wedges. Incoming assets (including a
    * poisoned one per 5th source row: truncated BMP, CRC-valid PNG
    * bomb, flipped PNG checksum) safe-decode INSIDE `foreachBatch`:
    * malformed payloads become per-asset quarantine rows
    * `(ok=false, reason=decode:<kind>, dup=false)`; good payloads
    * screen against the standing corpus index (the shuffle-join /
    * checkpointed-static shapes of [[imageDedupStream]]) and emit
    * `(ok=true, dup=<has a corpus near-dup>)`. Every asset is seen in
    * exactly one micro-batch and the corpus is static, so per-asset
    * verdicts are independent of batch slicing — stream output ≡ the
    * batch computation, which is what the oracle replays. (Contract:
    * `dup` is vs the CORPUS only; batch-internal pairs are the
    * all-pairs ops' job.) */
  def mediaQuarantineStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val QBase = 10000000L
    // The standing corpus index is the PERSISTED safe-signature artifact
    // (r15, VERDICT r14 #7): ok rows of img_ahash_safe carry exactly the
    // strict decode's signatures (spec-pinned; the from-index book's
    // hash gate is the proof), so the stream reads a columnar parquet
    // artifact instead of re-decoding half the corpus per run — the
    // production shape (incoming bytes decode in-batch; the standing
    // index never does).
    val corpus = spark.read
      .parquet(s"${graft.SparkEntry.quarantineSignatureIndex(spark, dir)}/img_ahash_safe")
      .where(col("ok") && col("id") < QBase && (expr("id div 20") % 2 === 0))
      .select("id", "width", "height", "ahash")
    val work = workDir("stream_media_quarantine", dir)
    val incoming = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(s"$dir/events.*")
      .where(expr("event_id div 20") % 2 === 1)
    val q = incoming.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val assets = b.select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
          .mapPartitions(_.flatMap { e =>
            val clean = Seq((e, Multimodal.syntheticBmp(e)))
            val poison =
              if (e % 5 == 0) Seq((QBase + e, ((e / 5) % 3) match {
                case 0 => Multimodal.poisonTruncated(Multimodal.syntheticBmp(QBase + e))
                case 1 => Multimodal.poisonPngBomb()
                case _ => Multimodal.poisonPngBadCrc(QBase + e)
              }))
              else Nil
            (clean ++ poison).iterator
          }).toDF("id", "img")
        // decode once per micro-batch: the safe frame feeds the
        // quarantine rows, the screen, AND the verdict join
        val safe = Multimodal.imageAHashSafe(assets, "id", "img").toDF()
          .localCheckpoint(true)
        val ok = safe.where(col("ok"))
          .select("id", "width", "height", "ahash")
        val dupIds = Multimodal.incrementalScreen(corpus, ok,
            hashCol = "ahash",
            group = concat(col("width").cast("string"), lit("x"),
              col("height").cast("string")),
            bandBits = 12, numBands = 4, maxHamming = 4, bucketCap = 64,
            metric = "media_quarantine_stream", observed = false,
            noBroadcast = true)
          .select(col("batch_id").as("id")).distinct()
          .withColumn("dup", lit(true))
        val out = safe.select(col("id"), col("ok"), col("reason"))
          .join(dupIds, Seq("id"), "left")
          .select(col("id"), col("ok"), col("reason"),
            (col("ok") && coalesce(col("dup"), lit(false))).as("dup"))
        // idempotent per-batch dir (the span/ANN index streams' MERGE
        // posture): a checkpoint-replayed micro-batch rewrites its own
        // directory instead of appending duplicate verdict rows
        out.write.mode("overwrite").parquet(s"$work/out/batch_$id")
        graft.ops.Dedup.releaseOwnCheckpoint(safe)
        ()
      }
      .option("checkpointLocation", s"$work/checkpoint")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(s"$work/out/*")
  }

  /** The incremental VIDEO perceptual screen as a stream — new clips
    * arriving continuously, parsed + keyframe-decoded + signed INSIDE
    * the micro-batch (mapPartitions on the streaming frame), screened
    * against the standing clip-signature index through the same
    * stream-safe confirm core as [[imageDedupStream]]
    * ([[graft.ops.Multimodal.incrementalScreen]] — batch signature
    * carried through the band join, so both joins are stream-static).
    * No per-batch candCap (`row_number` windows are illegal on
    * streams); durable parquet sink for the same corpus-sized-result
    * reason as the image twin. Stream == batch screen minus the cap,
    * hash-gated against the same CTE chain uncapped. */
  def videoDedupStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    def sigs(df: DataFrame) = Multimodal.videoPerceptualHash(
      df.select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.syntheticVideoMp4(id))))
        .toDF("id", "vid"), "id", "vid").toDF()
    // (id div 2) parity puts each content's {v0, v1} in the corpus and
    // {v2, v3} in the batch — every transcode family straddles
    // same eager materialization as the image twin (see the comment
    // there): one decode of the standing index, conservative stats →
    // the stream-static joins shuffle instead of broadcasting a
    // corpus-scale side (the broadcast OOMed at 10×, measured)
    val corpus = sigs(spark.read.parquet(s"$dir/events.parquet")
      .where(expr("event_id div 2") % 2 === 0)).localCheckpoint(true)
    // bounded micro-batches, same invariant as the image twin
    val batch = sigs(spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(s"$dir/events.*")
      .where(expr("event_id div 2") % 2 === 1))
    val confirmed = Multimodal.incrementalScreen(corpus, batch,
        hashCol = "sig",
        group = concat(col("width").cast("string"), lit("x"),
          col("height").cast("string"), lit(":"), col("n_key").cast("string")),
        bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
        metric = "video_phash_stream", observed = false, noBroadcast = true)
      // same exact watermark-aged dedup as the image twin (see there):
      // pair duplicates are co-batch by construction, so state is
      // bounded at ~one micro-batch instead of the whole output
      .withColumn("arr_ts", current_timestamp())
      .withWatermark("arr_ts", "1 minute")
      .dropDuplicatesWithinWatermark("batch_id", "corpus_id")
      .drop("arr_ts")
    val work = workDir("stream_vid_dedup", dir)
    val q = confirmed.writeStream
      .format("parquet")
      .option("path", s"$work/out")
      .option("checkpointLocation", s"$work/checkpoint")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.ops.Dedup.releaseLocalCheckpoint(corpus)
    spark.read.parquet(s"$work/out")
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
    // identity includes the TABLE: two streams to different tables must
    // never share (and wipe) one checkpoint
    val work = workDir("sjdbc", s"$dir $url $table")
    val q = windowCountsAgg(eventsStream(spark, dir)).writeStream
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

  /** R2 parity for STREAMS (VERDICT r6 #6): the reference's global
    * rows/s contract (`migration.go:232-268`) applied to a micro-batch
    * pipeline. Two levers compose: `maxFilesPerTrigger` bounds how much
    * a single micro-batch can ADMIT (the offsets-per-trigger sizing —
    * without it, AvailableNow would swallow the whole backlog in one
    * batch and pacing would be meaningless), and the driver-side
    * [[graft.engine.RateLimiter]] charges each batch's row count
    * against the shared budget before the next batch starts — between
    * batches, never inside a task (the same granularity decision as
    * the batch engine, for the same reasons: per-row pacing on
    * executors would serialize the cluster). The limiter instance can
    * be SHARED with concurrent batch transfer jobs, making the budget
    * global across both halves of the product, exactly like the
    * reference's process-wide limiter.
    *
    * Returns per-batch `(batch_id, rows, slept_ms)` observability rows;
    * sustained throughput is bounded by `rowsPerSec` plus the limiter's
    * 1-second burst credit. `sink` receives each admitted batch (the
    * production variant wires the JDBC/parquet sinks here). */
  def ratedIngest(spark: SparkSession, dir: String, rowsPerSec: Long,
                  maxFilesPerTrigger: Int = 1,
                  limiter: Option[graft.engine.RateLimiter] = None,
                  sink: DataFrame => Unit = _ => ()): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$dir/events.*")
    val lim = limiter.getOrElse(new graft.engine.RateLimiter(rowsPerSec))
    val stats = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val n = batch.count()
        val slept = lim.acquire(n)
        stats.add((id, n, slept))
        sink(batch)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    stats.asScala.toSeq.toDF("batch_id", "rows", "slept_ms")
  }

  /** STREAM-STREAM interval join: each click joined to the same user's
    * purchases within the following 30 minutes — two watermarked
    * streams, state on both sides bounded by watermark + the interval
    * condition (Spark evicts a side's rows once the other side's
    * watermark passes the join range). Inner joins emit matches as
    * soon as both rows exist, so a bounded run emits exactly the batch
    * interval-join, which the oracle recomputes. */
  def streamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val clicks = eventsRaw(spark, dir)
      .where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = eventsRaw(spark, dir)
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"))
    runToMemory(joined, "graft_ssj_", "append")
  }

  /** Streaming AS-OF enrichment — the stream-stream twin of
    * `ops/AsOf.asofJoin` (gate `join_asof`): every purchase is emitted
    * with the same user's latest at-or-before click, via
    * `flatMapGroupsWithState` running the identical sweep the batch
    * union+window form encodes: per user, events sorted by
    * (ts, side(click first), event_id) with the last click carried —
    * so the INCLUSIVE bound, the max-event_id tie-break at an instant,
    * and LEFT semantics all fall out of the same algorithm, and the
    * gate reuses the batch query's DuckDB ASOF oracle verbatim.
    *
    * State per user is ONE (ts, click_id) pair — O(keys), not O(rows),
    * unlike the interval join's watermark-bounded row buffers. The
    * per-batch `toSeq.sortBy` buffers one user's single-batch slice
    * (same bound as every mapGroups op). Cross-batch honesty: the carry
    * is exact when micro-batch boundaries respect event-time order per
    * user (a replayed file source; a kafka topic partitioned by user);
    * out-of-order arrivals WITHIN the watermark enrich later lefts
    * correctly but cannot retract an already-emitted left row — the
    * append-mode contract every streaming enrichment shares. */
  def streamingAsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val ev = eventsStream(spark, dir)
      .where(col("event_type").isin("purchase", "click") && col("user_id").isNotNull)
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_type"), col("event_id").cast("long"), col("value"))
      .as[(Long, Long, String, Long, Option[Double])]
    val out = ev.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), AsOfRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, it, state) =>
          val evs = it.toSeq.sortBy(e => (e._2, if (e._3 == "click") 0 else 1, e._4))
          var last = state.getOption
          val res = Seq.newBuilder[AsOfRow]
          evs.foreach { e =>
            if (e._3 == "click") last = Some((e._2, e._4))
            else res += AsOfRow(e._4, user, e._2, e._5,
              last.map(_._1), last.map(_._2), last.map(e._2 - _._1))
          }
          last.foreach(state.update)
          res.result().iterator
        }
    runToMemory(out.toDF(), "graft_asof_", "append")
      .select("event_id", "user_id", "ts_us", "value",
        "asof_ts_us", "asof_click_id", "gap_us")
  }

  /** Sessionized per-user event counts with a 30-minute gap — the
    * `session_window` stateful-aggregation shape (extension surface;
    * exercised by tests against a batch recomputation). */
  def sessionCounts(spark: SparkSession, dir: String): DataFrame =
    runToMemory(
      eventsStream(spark, dir)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("user_id"), col("cnt")),
      "graft_sess_", "complete")

  /** Streaming HLL register maintenance: distinct-user cardinality per
    * event type as STREAM state — `Sketch.hllRegisters` is a pure
    * select + groupBy/max, so the same code runs on the stream; state
    * is bounded at shards×4096 register rows no matter how many events
    * flow (the sketch property, now as streaming state). Complete-mode
    * output IS the register table, row-equal to the batch build — the
    * gate's oracle replays the batch SQL, proving stream == batch. */
  def hllRegisters(spark: SparkSession, dir: String): DataFrame =
    runToMemory(
      graft.ops.Sketch.hllRegisters(eventsRaw(spark, dir),
        col("user_id"), col("event_type")),
      "graft_hll_", "complete")

  /** The documents table as a file stream (schema from the batch
    * footer) — source for the text-sketch streaming twins. */
  private def documentsRaw(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema).parquet(s"$dir/documents.*")
  }

  /** The span screen as a STREAM — new document batches screened
    * against the standing corpus's distinct gram index
    * ([[graft.ops.Curation.incrementalSpanDedup]]'s front half as a
    * stream): the stride-1 gram explode runs inside the micro-batch
    * (stateless, no shuffle beyond the explode), the membership screen
    * is a stream-static LEFT SEMI join on the md5 gram key, and the
    * emitted rows are the raw `(doc_id, pos)` HITS. Island
    * consolidation deliberately stays the batch pass's job downstream
    * (`row_number` windows are illegal on streams — and the
    * online-screen / offline-consolidate split is exactly how a
    * production deployment runs this). Stateless end to end: no
    * watermark, no stored state, append mode. Oracle = the batch
    * screen's dup CTE — stream equals batch hit-for-hit. */
  def spanScreenStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Curation
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 2 === 0)
    val index = Curation.stride1Grams(corpus, 10).select("g").distinct()
    val hits = Curation.stride1Grams(
        documentsRaw(spark, dir).where(col("doc_id") % 2 === 1), 10)
      .join(index, Seq("g"), "left_semi")
      .select(col("doc_id"), col("pos"))
    runToMemory(hits, "graft_spanscr_", "append")
  }

  /** STREAMING MAINTENANCE of the span-gram index (VERDICT r10 #5):
    * where [[spanScreenStream]] only READS the standing `(g, df)`
    * artifact, this stream also WRITES it — each micro-batch screens
    * its documents against the standing corpus gram set (any gram hit
    * → rejected, the `dedup_span_index_lifecycle` admission rule) and
    * the ADMITTED documents' gram counts merge into the index store
    * from `foreachBatch` — the span analog of [[windowCountsToJdbc]]'s
    * MERGE sink, in the log-structured form a parquet store supports:
    * one `(g, df)` increment directory per micro-batch, compacted by
    * the additive groupBy on read (exactly
    * [[graft.ops.Curation.spanIndexAppend]]'s arithmetic). Exactly-once
    * lands by the same composition as the JDBC sink: a
    * checkpoint-replayed batch rewrites its OWN deterministic
    * `batch_<id>` directory (mode overwrite), so replay is a no-op.
    *
    * Admission deliberately screens against the ORIGINAL index
    * SNAPSHOT, not the growing one: that makes the admitted set — and
    * therefore the maintained index — independent of micro-batch
    * slicing (stream-appended ≡ batch rebuild over the same final doc
    * set, the gate's equality), and it is the right concurrency
    * posture at 100 TB, where parallel ingest streams must not race on
    * read-your-own-writes admission. Cross-batch duplicates among
    * ADMITTED docs are the next compaction's `spanIndexCompact` /
    * re-screen concern, the same contract as the batch lifecycle.
    * Returns the maintained index — `(g, df)` over corpus ∪ admitted. */
  def spanIndexMaintainStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Curation
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 2 === 0)
    // the standing artifact, materialized once: the screen's read side
    // AND the base of the final merge (a lazy plan would re-derive the
    // corpus explode per micro-batch — the streaming-media lesson)
    val index0 = Curation.spanIndexBuild(corpus).localCheckpoint(true)
    val work = workDir("stream_span_index", dir)
    val q = documentsRaw(spark, dir).where(col("doc_id") % 2 === 1)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val dupDocs = Curation.stride1Grams(b, 10)
          .join(index0.select("g"), Seq("g"), "left_semi")
          .select("doc_id").distinct()
        val admitted = b.join(dupDocs, Seq("doc_id"), "left_anti")
        Curation.spanIndexBuild(admitted).write.mode("overwrite")
          .parquet(s"$work/increments/batch_$id")
        ()
      }
      .option("checkpointLocation", s"$work/checkpoint")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val incDirs = Option(new java.io.File(s"$work/increments").listFiles())
      .toSeq.flatten.filter(_.isDirectory).sortBy(_.getName)
    val maintained = incDirs
      .map(f => spark.read.parquet(f.getAbsolutePath))
      .foldLeft(index0)(_ unionByName _)
      .groupBy("g").agg(sum(col("df")).as("df"))
      .localCheckpoint(true)
    graft.ops.Dedup.releaseOwnCheckpoint(index0)
    maintained
  }

  /** [[mediaQuarantineStream]]'s VIDEO twin — the decode-heaviest
    * stream (container parse + per-keyframe image decode per asset),
    * where an unisolated corrupt clip is the most expensive possible
    * wedge. Poison kinds per 5th source row: truncated container,
    * `stsz` bomb (cap fires before table materialization), corrupt
    * keyframe payload inside a VALID container (parse succeeds, the
    * keyframe image decode quarantines — the video-specific hazard).
    * Good clips screen against the standing perceptual signature index
    * with [[videoDedupStream]]'s shapes. */
  def videoQuarantineStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    import spark.implicits._
    val evSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val QBase = 10000000L
    // standing clip index from the persisted safe artifact — same move
    // as [[mediaQuarantineStream]] (r15, VERDICT r14 #7): parse + decode
    // of half the clip corpus per run replaced by a parquet scan of
    // vid_phash_safe's ok rows (≡ the strict videoPerceptualHash,
    // spec-pinned via the from-index book's shared oracle)
    val corpus = spark.read
      .parquet(s"${graft.SparkEntry.quarantineSignatureIndex(spark, dir)}/vid_phash_safe")
      .where(col("ok") && col("id") < QBase && (expr("id div 2") % 2 === 0))
      .select("id", "width", "height", "n_key", "sig")
    val work = workDir("stream_vid_quarantine", dir)
    val incoming = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(s"$dir/events.*")
      .where(expr("event_id div 2") % 2 === 1)
    val q = incoming.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val assets = b.select(col("event_id").cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, col("event_id")).as[Long]
          .mapPartitions(_.flatMap { e =>
            val clean = Seq((e, Multimodal.syntheticVideoMp4(e)))
            val poison =
              if (e % 5 == 0) Seq((QBase + e, ((e / 5) % 3) match {
                case 0 => Multimodal.poisonTruncated(
                  Multimodal.syntheticVideoMp4(QBase + e), 16)
                case 1 => Multimodal.poisonMp4Bomb(
                  Multimodal.syntheticVideoMp4(QBase + e))
                case _ => Multimodal.poisonMp4Keyframe(
                  Multimodal.syntheticVideoMp4(QBase + e))
              }))
              else Nil
            (clean ++ poison).iterator
          }).toDF("id", "vid")
        val safe = Multimodal.videoPerceptualHashSafe(assets, "id", "vid").toDF()
          .localCheckpoint(true)
        val ok = safe.where(col("ok"))
          .select("id", "width", "height", "n_key", "sig")
        val dupIds = Multimodal.incrementalScreen(corpus, ok,
            hashCol = "sig",
            group = concat(col("width").cast("string"), lit("x"),
              col("height").cast("string"), lit(":"),
              col("n_key").cast("string")),
            bandBits = 16, numBands = 4, maxHamming = 6, bucketCap = 64,
            metric = "video_quarantine_stream", observed = false,
            noBroadcast = true)
          .select(col("batch_id").as("id")).distinct()
          .withColumn("dup", lit(true))
        val out = safe.select(col("id"), col("ok"), col("reason"))
          .join(dupIds, Seq("id"), "left")
          .select(col("id"), col("ok"), col("reason"),
            (col("ok") && coalesce(col("dup"), lit(false))).as("dup"))
        out.write.mode("overwrite").parquet(s"$work/out/batch_$id")
        graft.ops.Dedup.releaseOwnCheckpoint(safe)
        ()
      }
      .option("checkpointLocation", s"$work/checkpoint")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(s"$work/out/*")
  }

  /** Stream-MAINTAINED IVF vector index (round 12): the ANN sibling of
    * [[spanIndexMaintainStream]], completing the set — every standing
    * index (LSH bands, span gram counts, IVF cells) now has a
    * stream-maintained variant. New vectors arrive as micro-batches
    * and each batch's cell assignments (`Similarity.ivfAssign` against
    * the FROZEN coarse centroids — the `ann_index_lifecycle` append
    * contract, so there is no global state to drift) land as one
    * idempotent per-batch increment directory (checkpoint replay
    * rewrites its own dir — the parquet analog of the MERGE sink). The
    * probe then reads the UNION of generations; because assignment is
    * per-vector against frozen centroids, stream-appended ≡ rebuilt
    * over the full collection — the gate's oracle replays the
    * single-build probe. At 100 TB: the standing generations are the
    * persisted artifact; per-batch cost is batch × broadcast(centroids). */
  def annIndexMaintainStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Similarity
    val embSchema = spark.read.parquet(s"$dir/embeddings.parquet").schema
    val all = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cents = all.where(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("emb").as("ce"))
      .localCheckpoint(true) // 16 rows; frozen for every generation
    val work = workDir("stream_ann_index", dir)
    Similarity.ivfAssign(all.where(col("vec_id") % 2 === 0), cents)
      .write.mode("overwrite").parquet(s"$work/increments/gen_0")
    val q = spark.readStream.schema(embSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/embeddings.*")
      .where(col("vec_id") % 2 === 1)
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        val bv = b.select(col("vec_id"),
          col("embedding").cast("array<double>").as("emb"))
        Similarity.ivfAssign(bv, cents).write.mode("overwrite")
          .parquet(s"$work/increments/batch_$id")
        ()
      }
      .option("checkpointLocation", s"$work/checkpoint")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // enumerate the increment dirs instead of globbing (VERDICT r17
    // #6): a glob path makes FileStreamSink probe `*/_spark_metadata`
    // and log a fatal-looking FileNotFoundException stack trace on
    // every passing run
    val incrementDirs = Option(new java.io.File(s"$work/increments")
        .listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory) // every generation: gen_0 AND batch_* dirs
      .map(_.getAbsolutePath).sorted
    require(incrementDirs.nonEmpty, s"no index increments under $work/increments")
    val index = spark.read.parquet(incrementDirs.toIndexedSeq: _*)
    val out = Similarity.ivfProbe(index, all, cents).localCheckpoint(true)
    graft.ops.Dedup.releaseOwnCheckpoint(cents)
    out
  }

  /** Streaming CMS cell maintenance — the frequency-sketch twin of
    * [[hllRegisters]] (VERDICT r7 #7): `Sketch.cmsSketch` is a pure
    * explode + groupBy/count whose cells are ADDITIVE under union, so
    * the same code runs on the document stream and the complete-mode
    * state IS the corpus sketch — bounded at 4×1024 counter rows no
    * matter how many documents flow. The gate's oracle replays the
    * batch build: stream == batch by hash. */
  /** DSIR scoring as a STREAM — the serving shape of the
    * [[graft.ops.TextAnalysis.dsirBucketRatios]] artifact: the dense
    * bucket-ratio model is fitted ONCE on the standing corpus (the
    * even-id docs; target = the src0/src1 curated slice), collected
    * (`buckets` rows — the artifact is broadcast-sized by
    * construction), and every arriving document folds its grams
    * through the literal map — map-only, no join, no shuffle, no
    * state; append mode. Stream scores are bit-identical to the batch
    * scorer's `logw` over the same docs (integer micro-unit sum ≡
    * DECIMAL sum — spec-pinned), so the oracle replays the batch
    * formula: model from even ids, scores for odd ids. Top-k
    * SELECTION deliberately stays a batch pass downstream (a global
    * rank is not streamable; the online-score / offline-select split
    * is how production runs DSIR anyway). */
  def dsirScoreStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextAnalysis
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 2 === 0)
    val ratios = TextAnalysis.dsirBucketRatios(corpus,
        col("source").isin("src0", "src1"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    val scored = TextAnalysis.dsirScoreWith(
      documentsRaw(spark, dir).where(col("doc_id") % 2 === 1), ratios)
    runToMemory(scored, "graft_dsirsc_", "append")
  }

  def cmsCells(spark: SparkSession, dir: String): DataFrame =
    runToMemory(graft.ops.Sketch.cmsSketch(documentsRaw(spark, dir)),
      "graft_cms_", "complete")

  /** Streaming Bloom word maintenance — the membership-sketch twin:
    * `Sketch.bloomBuild` is explode + groupBy/bit_or, and OR is
    * idempotent-associative, so the running complete-mode state is the
    * per-source filter table (≤ sources × 1041 word rows forever); a
    * live pipeline would probe it with `Sketch.bloomScreen` to ask
    * "was this content ever admitted?" without replaying the corpus.
    * Oracle = batch build: stream == batch by hash. */
  def bloomWords(spark: SparkSession, dir: String): DataFrame =
    runToMemory(graft.ops.Sketch.bloomBuild(documentsRaw(spark, dir),
        md5(col("text")), col("source")),
      "graft_bloom_", "complete")

  /** Streaming min-k priority sample: `Sampling.MinKSample` runs as a
    * complete-mode streaming AGGREGATION (sort+limit is illegal on
    * streams; an aggregate whose buffer IS the k-row sample is not),
    * so the maintained state is bounded at k rows and after every
    * micro-batch the output row holds the exact whole-corpus sample —
    * the mergeable-reservoir law as stream state. The k-row array is
    * exploded on the returned (batch) sink table; oracle = the batch
    * sample SQL, proving stream == batch. */
  def prioritySample(spark: SparkSession, dir: String,
                     k: Int = 100): DataFrame = {
    import spark.implicits._
    import graft.ops.Sampling
    val agg = new Sampling.MinKSample(k)
    val rows = Sampling.priorityRows(documentsRaw(spark, dir))
      .as[Sampling.SampleRow]
    val sampled = rows.groupByKey(_ => 1)
      .agg(agg.toColumn.name("sample"))
      .toDF("g", "sample")
    runToMemory(sampled, "graft_minks_", "complete")
      .select(explode(col("sample")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.source").as("source"),
        col("r.priority").as("priority"))
  }
}

/** Output row of [[StreamingIngest.streamingAsOf]] — the `join_asof`
  * gate's schema (Options encode the LEFT-join nulls). */
final case class AsOfRow(event_id: Long, user_id: Long, ts_us: Long,
                         value: Option[Double], asof_ts_us: Option[Long],
                         asof_click_id: Option[Long], gap_us: Option[Long])
