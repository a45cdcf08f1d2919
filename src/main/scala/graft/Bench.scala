package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the headline queries on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line the driver collects into
  * `BENCH_r{N}.json` (targets in BASELINE.md: lineitem transfer ≤60s wall,
  * all-tables ≤90s, queries within 2× reference-derived anchors). The
  * same JSON is also written to `SPARK_GRAFT_BENCH_OUT` (default
  * `BENCH_SELF.json`) so the artifact survives driver log truncation.
  *
  * Every query is forced through a `noop` write so the full plan executes
  * (a bare `.count()` would let Catalyst prune projections away).
  */
object Bench {
  private val headline = Seq(
    "q1_agg", "q3_join", "join_broadcast_dim", "window_rank_dedup",
    "window_running_sum", "s1_keyset_scan", "upsert_last_writer",
    "o1_sort_limit", "agg_rollup",
    // LLM-pipeline extensions
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
    "dedup_clusters", "dedup_paragraph", "dedup_cross_source",
    "dedup_containment", "dedup_semantic", "dedup_cdc_chunks",
    "dedup_incremental", "text_temperature_mix", "corpus_diff",
    "curation_pipeline", "text_length_trim",
    "ann_cosine_topk", "ann_bucket_topk", "ann_ivf_topk",
    "ann_ivf_trained_topk", "text_quality", "text_quality_classifier",
    "text_shard_assign", "join_bucketed_colocated",
    // round-6 additions: tokenizer stats, LM scoring, projection, layout,
    // quantization, chunking, report card, compaction
    "text_bpe_pairs", "text_unigram_logprob", "text_bigram_logprob",
    "embedding_project", "layout_zorder", "embedding_quantize",
    "text_chunk_windows", "corpus_report", "files_compact",
    "streaming_window_counts", "streaming_window_append",
    "streaming_session_counts", "streaming_incremental_dedup",
    "streaming_hll_registers",
    // round-7 additions: band-screened exact-pair confirms, IVF-PQ
    "dedup_jaccard_screened", "dedup_containment_screened",
    "ann_ivfpq_topk", "ann_ivfpq_rerank", "ann_ivf_sampled_topk",
    "dedup_index_lifecycle",
    "multimodal_jpeg", "multimodal_mp4", "join_asof", "join_asof_bucketed",
    "text_bpe_train", "text_bpe_encode", "streaming_asof",
    "agg_hll_distinct", "text_cms_heavy_hitters", "dedup_bloom_screen",
    "agg_hist_quantiles",
    // round-8 additions: deterministic sampling (min-k + stratified +
    // KMV estimate + streaming twin), HLL set algebra, as-of staleness
    // bound, streaming CMS/Bloom twins
    "sample_priority_topk", "sample_stratified", "agg_kmv_distinct",
    "agg_hll_set_algebra", "join_asof_tolerance",
    "streaming_cms_cells", "streaming_bloom_words", "streaming_sample_topk",
    "multimodal_ahash", "dedup_image_pairs", "sample_split_assign",
    "multimodal_audio_fingerprint",
    // r9: audio pairs, media clusters, token-budget admission
    "dedup_audio_pairs", "dedup_image_clusters", "dedup_audio_clusters",
    "dedup_image_incremental", "streaming_image_dedup",
    "sample_token_budget", "sample_temperature_budget", "dedup_keep_best",
    "ann_index_lifecycle", "text_logprob_trim", "pipeline_pretrain_mix",
    "multimodal_video_fingerprint", "dedup_video_pairs", "dedup_video_clusters",
    "dedup_audio_incremental",
    // r10: transcode-robust perceptual video dedup (signature, pairs,
    // clusters), the video incremental screen, the gated ANN recall
    // curve, and the full-book admission pipeline
    "multimodal_video_phash", "dedup_video_perceptual",
    "dedup_video_perceptual_clusters", "dedup_video_incremental",
    "ann_recall", "pipeline_pretrain_full", "pipeline_pretrain_surgical",
    "dedup_video_perceptual_incremental", "streaming_video_dedup",
    "multimodal_video_phash_aligned",
    // r10: exact substring-span dedup (stride-1 grams → maximal spans)
    // and the rewrite pass that removes them
    "dedup_span_exact", "dedup_span_trim", "text_decontaminate_spans",
    "dedup_span_incremental", "streaming_span_screen",
    "dedup_span_index_lifecycle",
    // r11: the media admission book (exact ∧ perceptual survivorship
    // across all three binary modalities in one gated composition),
    // the stream-maintained span-gram index, and the gated LSH recall
    // curve (ann_recall's move applied to text dedup)
    "pipeline_media_admission", "streaming_span_index", "dedup_lsh_recall",
    // r12: the quarantine-threaded poisoned book, the composed
    // text ∧ media admission book, and the index-fed media book
    "multimodal_quarantine", "pipeline_multimodal_admission",
    "pipeline_media_admission_from_index", "multimodal_quarantine_codecs",
    "streaming_media_quarantine", "streaming_ann_index", "multimodal_quarantine_report", "streaming_video_quarantine", "text_bpe_encode_pretrained",
    // r14: the quarantine book composed from the persisted safe index,
    // and DSIR importance-resampling selection
    "multimodal_quarantine_from_index", "text_dsir_select",
    "streaming_dsir_score", "multimodal_resample",
    "dedup_image_scale_invariant", "dedup_image_scale_invariant_incremental",
    "streaming_scale_invariant_dedup",
    // r15: the audio leg of the scale-invariant family (rate-invariant
    // key: batch pairs + incremental screen + streaming twin) and the
    // NN audio rate-normalizer
    "multimodal_audio_resample", "dedup_audio_rate_invariant",
    "dedup_audio_rate_invariant_incremental", "streaming_rate_invariant_dedup",
    "dedup_audio_rate_invariant_keep",
    // r16: the video leg of the scale-invariant family (fixed-grid
    // keyframe thumbs: batch pairs + keep closure + incremental screen
    // + streaming twin) and the image leg's keep closure
    "dedup_video_scale_invariant", "dedup_video_scale_invariant_keep",
    "dedup_video_scale_invariant_incremental",
    "streaming_video_scale_invariant_dedup",
    "dedup_image_scale_invariant_keep", "dedup_video_scale_time_invariant",
    "dedup_video_scale_time_invariant_keep",
    "dedup_video_scale_time_invariant_incremental",
    "streaming_video_scale_time_invariant_dedup",
    // r17: the crop/letterbox-invariant image+video families and the
    // trim-invariant audio family (VERDICT r16 #3/#4) — content-box /
    // energy-onset anchored keys, each with pairs + keep + incremental
    // + streaming legs
    "dedup_image_crop_invariant", "dedup_image_crop_invariant_keep",
    "dedup_image_crop_invariant_incremental", "streaming_crop_invariant_dedup",
    "dedup_video_crop_invariant", "dedup_video_crop_invariant_keep",
    "dedup_video_crop_invariant_incremental",
    "streaming_video_crop_invariant_dedup",
    "dedup_audio_trim_invariant", "dedup_audio_trim_invariant_keep",
    "dedup_audio_trim_invariant_incremental", "streaming_trim_invariant_dedup",
    // r17: the mirror-invariant image family (orbit-canonical thumb)
    "dedup_image_mirror_invariant", "dedup_image_mirror_invariant_keep",
    "dedup_image_mirror_invariant_incremental",
    "streaming_mirror_invariant_dedup",
    // r18: the rotation-invariant image family (full D4 orbit), the
    // mirror-invariant video family (per-frame orbit-min), and the
    // channel-swap axis gated through the rate key (VERDICT r17 #3/#4)
    "dedup_image_rotation_invariant", "dedup_image_rotation_invariant_keep",
    "dedup_image_rotation_invariant_incremental",
    "streaming_rotation_invariant_dedup",
    "dedup_video_mirror_invariant", "dedup_video_mirror_invariant_keep",
    "dedup_video_mirror_invariant_incremental",
    "streaming_video_mirror_invariant_dedup",
    "dedup_audio_channel_swap_invariant",
    "dedup_audio_channel_swap_invariant_keep",
    "dedup_audio_channel_swap_invariant_incremental",
    "streaming_channel_swap_invariant_dedup",
    // r18: the rotation-invariant video family (per-frame D4 orbit)
    "dedup_video_rotation_invariant", "dedup_video_rotation_invariant_keep",
    "dedup_video_rotation_invariant_incremental",
    "streaming_video_rotation_invariant_dedup",
    // the product pipeline end-to-end (parquet engine + live Derby JDBC,
    // including the chunked checkpoint/resume live path)
    "transfer_config_multi", "transfer_jdbc_roundtrip",
    "transfer_jdbc_kill_resume", "transfer_jdbc_varchar_pk",
    "transfer_jdbc_composite_pk", "transfer_jdbc_incremental")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // local-attribution escape hatch (r7 verdict #3): run ONLY the named
    // queries, skipping the transfer sections — lets a fresh JVM time one
    // query in isolation so shared-JVM contention can be separated from
    // plan regressions. The driver never sets this.
    // empty-after-parse collapses to None (an exported-but-empty var
    // must not silently filter out EVERYTHING and overwrite the round
    // artifact with total=0); unknown names are warned below
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach(_.diff(headline.toSet).foreach(n =>
      System.err.println(s"[bench] WARNING: SPARK_GRAFT_BENCH_ONLY name '$n' " +
        "is not a headline query — nothing will time it")))
    val spark = Sessions.builder("graft-bench", Sessions.cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // per-gate Spark job counts (VERDICT r16 #2): the r15/r16
    // driver-over-self spikes land exactly on the many-short-jobs
    // iterative closure gates, so the ledger records the jobs each gate
    // submits — jobs × scheduler-round-trip contention becomes a
    // testable attribution instead of prose
    val jobCounter = graft.util.JobCounter.install(spark.sparkContext)
    val jobCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    // per-gate ledger START offsets (VERDICT r17 #2): the r17 driver
    // spikes sat in one contiguous stretch of the run — consistent with
    // a contended window on the driver machine but unprovable from the
    // ledger. Record each gate's start as seconds since bench start
    // (plus the absolute bench_start_utc below), so position-in-run /
    // co-tenancy attribution is a diffable number.
    val benchStartNs = System.nanoTime()
    val benchStartUtc = java.time.Instant.now().toString
    val startOffsets = scala.collection.mutable.LinkedHashMap[String, Double]()
    def markStart(name: String): Unit =
      startOffsets(name) = (System.nanoTime() - benchStartNs) / 1e9
    def countingJobs(name: String)(body: => Double): Double = {
      markStart(name)
      val j0 = jobCounter.count
      val sec = body
      jobCounts(name) = jobCounter.count - j0
      sec
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warmup on the smallest table so per-query numbers
    // measure the query, not first-use class loading.
    force(SparkEntry.queries("p5_completed_count")(spark, sfDir))
    // Same for the TRANSFER engine (TableTransferJob + checkpoint +
    // parquet writer init): transfer_config_multi is the first headline
    // to touch that path, and with a cold path its number carried 2-3 s
    // of one-time class-load/codegen that swung round to round (r3 2.9 s
    // → r4 4.5 s with an unchanged plan — diagnosed r5: iter1 5.2 s,
    // iters 2-6 settle at 1.8-2.1 s in one JVM). One tiny-table transfer
    // (region: 5 rows) warms the machinery without touching the timed
    // workload's tables or dirs.
    locally {
      import graft.core._
      val warmTmp = java.nio.file.Files.createTempDirectory("graft-warm").toString
      val warmSpec = TransferSpec(
        EndpointSpec("parquet", path = sfDir,
          tables = Seq(TableMapping("region", targetName = Some("region_warm")))),
        EndpointSpec("parquet", path = s"$warmTmp/dest"),
        MigrationSpec(batchSize = 20000, checkpointRowThreshold = 20000,
          checkpointDir = s"$warmTmp/cp", rateLimit = 1000000000))
      try graft.engine.TransferRunner.run(spark, warmSpec, log = _ => ())
      catch { case e: Throwable =>
        System.err.println(s"[bench] transfer warmup failed: ${e.getMessage}") }
    }

    // Plan-shape warmup (r6, diagnosing the dedup_clusters drift: DriftProbe
    // measured its first-ever run in a JVM at 8.4 s — 5.3 s of it iteration-0
    // whole-stage-codegen compilation — vs 2.4-3.5 s steady state; the
    // r4 4.61 → r5 6.15 s "drift" was variance in that one-time compile, not
    // a plan change). Run every headline query once at sf0.001 first: tiny
    // data, same plan shapes → codegen classes compile OUTSIDE the timed
    // region, so per-query numbers measure the operator at sfDir, uniformly.
    // Disclosed methodology change: r6+ numbers are warmed; expect small
    // across-the-board drops vs r5 for codegen-heavy entries.
    locally {
      // smallest sibling scale factor when present; else warm on the
      // measured dir itself (slower warmup, but never a silent no-op
      // that reverts the disclosed warmed-numbers methodology)
      val warmDir = {
        val sibling = new java.io.File(
          new java.io.File(sfDir).getParentFile, "sf0.001")
        if (sibling.isDirectory) sibling.toString else sfDir
      }
      val t0 = System.nanoTime()
      headline.filter(SparkEntry.queries.contains)
        .filter(n => only.forall(_.contains(n))).foreach { name =>
        try force(SparkEntry.queries(name)(spark, warmDir))
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}") }
      }
      System.err.println(f"[bench] sf0.001 plan-shape warmup took ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // De-confound the standing-artifact BUILDS from the gates that READ
    // them (VERDICT r13 #1): whichever *_from_index gate ran first in a
    // JVM paid the full decode+build inside its timed region (r13 driver:
    // 44.1 s vs the 16.7-17.4 s steady read-compose cost the DriftProbe
    // measured). Build the measured dir's artifacts BEFORE the timed
    // loop and report each build as its own line item, so the from-index
    // gates measure what they claim to: composing from a persisted index.
    locally {
      val artifactReaders = Set("pipeline_media_admission_from_index",
        "pipeline_multimodal_admission", "multimodal_quarantine_from_index",
        // r15: the report + both streaming quarantines now compose from
        // the persisted safe index too
        "multimodal_quarantine_report", "streaming_media_quarantine",
        "streaming_video_quarantine")
      if (only.forall(_.exists(artifactReaders.contains))) {
        def timed(name: String)(body: => Unit): Unit = {
          markStart(name)
          results(name) = try time(body) catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
          }
        }
        timed("media_index_build") {
          SparkEntry.mediaSignatureIndex(spark, sfDir); ()
        }
        timed("text_admit_build") {
          SparkEntry.surgicalAdmittedDocsPath(spark, sfDir); ()
        }
        timed("quarantine_index_build") {
          SparkEntry.quarantineSignatureIndex(spark, sfDir); ()
        }
      }
    }

    // a typo'd/renamed headline must be VISIBLE, not silently dropped
    // from the round's metrics
    headline.filterNot(SparkEntry.queries.contains).foreach(n =>
      System.err.println(s"[bench] WARNING: headline '$n' is not a declared query"))
    headline.filter(SparkEntry.queries.contains)
      .filter(n => only.forall(_.contains(n))).foreach { name =>
      val sec = try countingJobs(name)(
        time(force(SparkEntry.queries(name)(spark, sfDir))))
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      }
      results(name) = sec
    }

    // One failure in a transfer section must not abort Bench before the
    // JSON line prints — the driver would lose EVERY timing for the round
    def guarded(name: String)(body: => Double): Unit = {
      markStart(name)
      results(name) = try body catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
      }
    }

    // Transfer benchmark: the reference's core workload — full lineitem
    // read → transforms → write (BASELINE.md: ≤60 s incl. startup).
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toString
    if (only.isEmpty)
    guarded("transfer_lineitem")(time {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .withColumn("l_extendedprice",
          org.apache.spark.sql.functions.expr("l_extendedprice * 100"))
        .withColumn("l_returnflag",
          org.apache.spark.sql.functions.expr("UPPER(l_returnflag)"))
        .write.mode("overwrite").parquet(s"$tmp/lineitem")
    })

    // Resume overhead (BASELINE.md: kill at ~50% + restart ≤ 1.2× an
    // uninterrupted run): transfer orders uninterrupted, then again with
    // a mid-run cancel + resume, same chunking.
    if (only.isEmpty) {
      import graft.core._
      import graft.engine._
      def spec(tag: String) = TransferSpec(
        EndpointSpec("parquet", path = sfDir,
          tables = Seq(TableMapping("orders", targetName = Some(s"orders_$tag")))),
        EndpointSpec("parquet", path = s"$tmp/r_$tag"),
        MigrationSpec(batchSize = 20000, checkpointRowThreshold = 20000,
          checkpointDir = s"$tmp/rcp_$tag", rateLimit = 1000000000))
      // best-of-2 with fresh dirs per attempt: both legs are ~1 s at
      // sf0.1, where one scheduler hiccup swings the overhead RATIO by
      // ±0.2 — min over repeats measures the work, not the jitter
      def best2(mk: Int => Double): Double = math.min(mk(0), mk(1))
      guarded("transfer_orders")(best2 { i =>
        val plain = spec(s"plain$i")
        time {
          new TableTransferJob(spark, plain, plain.source.tables.head,
            new TransferControl, _ => ()).run()
        }
      })
      guarded("transfer_orders_kill_resume")(best2 { i =>
        val killed = spec(s"killed$i")
        time {
          // orders at sf0.1 → ~8 chunks of 20k; cancel near the middle
          new TableTransferJob(spark, killed, killed.source.tables.head,
            TransferControl.cancelAfterChecks(4), _ => ()).run()
          new TableTransferJob(spark, killed, killed.source.tables.head,
            new TransferControl, _ => ()).run()
        }
      })
    }

    // Multi-table engine run: all 10 tables through the full transfer
    // pipeline (chunked scans, checkpoints, 4 parallel tables) —
    // BASELINE.md target ≤ 90 s wall.
    if (only.isEmpty)
    guarded("transfer_all_tables")(time {
      import graft.core._
      val spec = TransferSpec(
        EndpointSpec("parquet", path = sfDir,
          tables = graft.sources.Tables.all.map(n => TableMapping(n))),
        EndpointSpec("parquet", path = s"$tmp/all_dest"),
        MigrationSpec(workers = 4, batchSize = 20000,
          checkpointDir = s"$tmp/all_cp", rateLimit = 1000000000))
      val res = graft.engine.TransferRunner.run(spark, spec, log = _ => ())
      require(graft.engine.TransferRunner.allCompleted(res),
        graft.engine.TransferRunner.summarize(res))
    })

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val jc = jobCounts.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def f1(v: Double) = BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    val so = startOffsets.map { case (k, v) => "\"" + k + "\":" + f1(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"job_counts":$jc,"start_offsets":$so,"bench_start_utc":"$benchStartUtc","sf":"$sfDir"}"""
    println(json)
    // The stdout line alone is fragile: the driver's log capture
    // truncated BENCH_r07's tail before the total ever appeared
    // (VERDICT r7 #4). Persist the same JSON to a known path so the
    // round artifact is whole regardless of log length. An only-mode
    // run must NOT clobber the full round artifact with its partial
    // results (ADVICE r8): it defaults to a distinct path unless the
    // caller picked one explicitly.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (only.isEmpty) "BENCH_SELF.json" else "BENCH_ONLY.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    // LAST stdout line (VERDICT r18 #2 — `parsed: null` in every round's
    // BENCH artifact to date): the COMPLETE per-query map, 1-decimal
    // values, no side maps (job_counts/start_offsets live only in the
    // file artifact above), as the final thing this program prints.
    // The short transfer-gates-only summary the r8-r18 benches printed
    // last was never parsed by the driver; the full map at 1 decimal is
    // ~7 KB for 183 gates — the driver's parse reads the whole log, only
    // its stored diagnostic tail is 2 KB.
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    def f1d(v: Double) = BigDecimal(v).setScale(1, BigDecimal.RoundingMode.HALF_UP)
    val qs1 = results.map { case (k, v) => "\"" + k + "\":" + f1d(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec",""" +
      s""""queries":$qs1,"n_queries":${results.size},""" +
      s""""full":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
