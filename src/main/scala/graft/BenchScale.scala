package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-evidence benchmark (VERDICT r3 #10): runs the dedup/ANN family
  * one notch ABOVE the largest driver-generated scale factor, on a
  * derived dataset `SPARK_GRAFT_SCALE`× the size of `SPARK_GRAFT_SF_DIR`
  * (default 10× sf0.1 ≈ sf1: 50k documents, 20k embeddings).
  *
  * The derived tables replicate the base data with per-copy
  * perturbation — each copy's text gains a distinct tail token and each
  * embedding a per-copy offset — so near-duplicate structure is
  * preserved WITHIN a copy and partially across copies (the honest,
  * harder case: candidate pairs grow superlinearly while the bucketed
  * plans must stay linear-ish). This is EVIDENCE for the scale posture,
  * not a correctness gate — the oracles stay at driver scale factors.
  *
  * Prints one JSON line per run: per-query seconds at the scaled size.
  */
object BenchScale {

  private val family = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_clusters", "dedup_near_keep", "dedup_ngram_jaccard",
    "text_tfidf", "text_quality", "text_contamination", "text_repetition",
    "text_pii_redact", "text_pack_sequences", "text_mix_sample",
    "dedup_paragraph", "dedup_cross_source", "text_quality_classifier",
    "text_shard_assign",
    "ann_cosine_topk", "ann_bucket_topk", "ann_ivf_topk", "ann_ivf_trained_topk",
    "dedup_embedding_cosine",
    // round 6: tokenizer/LM statistics, projection, layout
    "text_bpe_pairs", "text_unigram_logprob", "text_bigram_logprob",
    "embedding_project", "layout_zorder",
    "dedup_containment", "dedup_semantic", "dedup_cdc_chunks",
    "dedup_incremental", "text_temperature_mix", "corpus_diff",
    "curation_pipeline", "text_length_trim",
    // round 7: the band-screened exact-pair confirms — THE claim under
    // test is that these stay ≤~3× at 10× where the exhaustive ops ran
    // 13.9×/7.0× (output-bound)
    "dedup_jaccard_screened", "dedup_containment_screened",
    "ann_ivfpq_topk", "ann_ivfpq_rerank", "ann_ivf_sampled_topk",
    "dedup_index_lifecycle",
    // round 7b: as-of enrichment over 10× events; BPE trainer whose
    // vocabulary-collapse is THE scale claim (rounds work on the
    // saturating vocab, not the corpus)
    "join_asof", "join_asof_bucketed", "text_bpe_train", "text_bpe_encode",
    // round 7c: mergeable sketches — fixed register/cell tables are THE
    // constant-size-at-scale claim; wall should track the scan, state
    // stays 4096 registers / 4×1024 cells at any corpus size
    "agg_hll_distinct", "text_cms_heavy_hitters", "dedup_bloom_screen",
    "agg_hist_quantiles",
    // round 8: min-k sampling (one TakeOrdered — wall should track the
    // scan), KMV estimate, HLL set algebra (register-table work only),
    // image aHash + banded pairs (decode-bound, then fingerprint-only)
    "sample_priority_topk", "sample_stratified", "agg_kmv_distinct",
    "agg_hll_set_algebra", "multimodal_ahash", "dedup_image_pairs",
    // round 9: media pair/closure/incremental family — THE claims are
    // (a) pairs stay near-linear under the caps, (b) closure cost is
    // rounds×participants (rounds ~ eccentricity, participants «
    // corpus), (c) the incremental screen is batch-proportional;
    // budget sampling should track the scan + one window shuffle
    "dedup_audio_pairs", "dedup_image_clusters", "dedup_audio_clusters",
    "dedup_image_incremental", "dedup_keep_best",
    "sample_token_budget", "sample_temperature_budget",
    "ann_index_lifecycle", "dedup_video_pairs",
    // round 10 (VERDICT r9 #4): the r9 entries BENCH_SCALE hadn't
    // covered — the composed admission path (what a production run
    // actually pays), the video closure, the audio incremental screen,
    // the video fingerprint scan — plus the r10 perceptual-video
    // family, the video incremental screen, the recall gate, and the
    // full-book pipeline
    "pipeline_pretrain_mix", "dedup_video_clusters",
    "dedup_audio_incremental", "multimodal_video_fingerprint",
    "multimodal_video_phash", "dedup_video_perceptual",
    "dedup_video_perceptual_clusters", "dedup_video_incremental",
    "ann_recall", "pipeline_pretrain_full", "pipeline_pretrain_surgical",
    "dedup_video_perceptual_incremental", "multimodal_video_phash_aligned",
    // round 10b: exact substring-span dedup — THE claim is that the
    // stride-1 gram volume (16 B × n_words) shuffles linearly and the
    // island merge stays doc-local; the trim adds one anti-join bounded
    // by span coverage
    "dedup_span_exact", "dedup_span_trim", "text_decontaminate_spans",
    "dedup_span_incremental", "dedup_span_index_lifecycle",
    // streaming: watermark-bounded state over 10× events (10× keyed
    // state for the stateful ops — user ids are offset per copy)
    "streaming_window_counts", "streaming_dedup", "streaming_stateful_counts",
    "streaming_incremental_dedup", "streaming_asof", "streaming_span_screen",
    "streaming_image_dedup", "streaming_video_dedup",
    // round 11: the media admission book (the composed per-asset cost a
    // production media ingest pays), the stream-maintained span index,
    // the SKEWED-corpus span case (VERDICT r10 #1 — one gram at
    // corpus-wide frequency must not create a straggler task under the
    // partial-agg frequency stage), and BPE at ~tokenizer scale
    // (VERDICT r10 #4 — 1000 merge rounds; the claim is wall-clock
    // linear in merges under the checkpoint cadence)
    "pipeline_media_admission", "streaming_span_index",
    "dedup_span_exact_boiler", "text_bpe_train_1k",
    // round 12: the POISONED media book (VERDICT r11 #1 — one corrupt
    // asset per 5 events across all three modalities must degrade to
    // counted quarantine rows, so the book survives a poisoned corpus
    // at 10× instead of dying on a require), the composed text ∧ media
    // admission book, the index-fed media book (decode amortized into
    // the persisted signature artifacts), and the residual IVF-PQ's
    // cost delta (inside ann_recall)
    "multimodal_quarantine", "pipeline_multimodal_admission",
    "pipeline_media_admission_from_index", "streaming_media_quarantine",
    "streaming_ann_index", "multimodal_quarantine_report", "streaming_video_quarantine",
    // r14: the safe-index-fed quarantine book, DSIR selection (model
    // fit + broadcast-ratio scoring + TakeOrdered threshold), and its
    // map-only streaming scorer
    "multimodal_quarantine_from_index", "text_dsir_select",
    "streaming_dsir_score", "multimodal_resample",
    // r15: the full scale-invariant triple (VERDICT r14 #4 — the
    // incremental screen and streaming twin landed after the r14 sweep)
    "dedup_image_scale_invariant", "dedup_image_scale_invariant_incremental",
    "streaming_scale_invariant_dedup",
    // r15: the audio leg of the scale-invariant family (rate-invariant
    // batch pairs + incremental screen + streaming twin) and the NN
    // rate-normalizer — same claims as the image triple: decode-bound
    // signature pass, caps keep the pair stage output-linear, screen
    // cost ∝ batch
    "multimodal_audio_resample", "dedup_audio_rate_invariant",
    "dedup_audio_rate_invariant_incremental", "streaming_rate_invariant_dedup",
    "dedup_audio_rate_invariant_keep",
    // r16: the video leg of the scale-invariant family + both keep
    // closures — same claims as the image/audio triples (decode-bound
    // signature pass, caps keep pairs output-linear, screen ∝ batch,
    // closure rounds×participants)
    "dedup_video_scale_invariant", "dedup_video_scale_invariant_keep",
    "dedup_video_scale_invariant_incremental",
    "streaming_video_scale_invariant_dedup",
    "dedup_image_scale_invariant_keep", "dedup_video_scale_time_invariant",
    "dedup_video_scale_time_invariant_keep",
    "dedup_video_scale_time_invariant_incremental",
    "streaming_video_scale_time_invariant_dedup",
    // r17: the crop/letterbox-invariant image+video families and the
    // trim-invariant audio family — same claims as their scale/rate
    // siblings (decode+trim signature pass linear, caps keep pairs
    // output-linear, screen ∝ batch, closure rounds×participants)
    "dedup_image_crop_invariant", "dedup_image_crop_invariant_keep",
    "dedup_image_crop_invariant_incremental", "streaming_crop_invariant_dedup",
    "dedup_video_crop_invariant", "dedup_video_crop_invariant_keep",
    "dedup_video_crop_invariant_incremental",
    "streaming_video_crop_invariant_dedup",
    "dedup_audio_trim_invariant", "dedup_audio_trim_invariant_keep",
    "dedup_audio_trim_invariant_incremental", "streaming_trim_invariant_dedup",
    "dedup_image_mirror_invariant", "dedup_image_mirror_invariant_keep",
    "dedup_image_mirror_invariant_incremental",
    "streaming_mirror_invariant_dedup",
    // r18: the rotation (D4 orbit), video-mirror and channel-swap
    // families — same claims as their orientation siblings (the orbit
    // work is per-row integer-only: 8 thumb passes for rotation, 2 per
    // keyframe for video mirror, zero extra for channel swap; caps
    // keep pairs output-linear, screens ∝ batch, closures
    // rounds×participants)
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
    "dedup_video_rotation_invariant", "dedup_video_rotation_invariant_keep",
    "dedup_video_rotation_invariant_incremental",
    "streaming_video_rotation_invariant_dedup")

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    // cache identity = (base dir, base-data fingerprint, factor): the
    // path alone is not enough — the driver regenerates the testdata in
    // place between rounds (events.ts changed parquet type in r7), and a
    // path-keyed cache would silently keep deriving from the OLD data.
    // Size+mtime of each base file is a cheap content proxy. A missing
    // fixture must FAIL here, not fingerprint as '<t>:0:0' and silently
    // reuse a stale cache (ADVICE r7); and a directory-style parquet
    // (Spark-written) must fold in its part files — directory metadata
    // does not change when contents are rewritten in place.
    val fingerprint = graft.sources.Tables.all.map { t =>
      val f = new java.io.File(s"$base/$t.parquet")
      require(f.exists, s"base fixture missing: ${f.getPath}")
      val stats =
        if (f.isDirectory)
          f.listFiles().sortBy(_.getName)
            .map(p => s"${p.getName}:${p.length}:${p.lastModified}").mkString(",")
        else s"${f.length}:${f.lastModified}"
      s"$t:$stats"
    }.mkString(";")
    val baseId = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$base|$fingerprint".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    // v2: derivation now also writes orders.parquet — the version tag
    // keeps a pre-orders cached dir (valid marker, missing table) from
    // being reused
    val out =
      s"${System.getProperty("java.io.tmpdir")}/graft_scaled_v2_x${factor}_$baseId"
    val spark = Sessions.builder("graft-bench-scale", Sessions.cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docsPath = s"$out/documents.parquet"
    val embPath = s"$out/embeddings.parquet"
    val evPath = s"$out/events.parquet"
    // completion MARKER, not per-file existence: a run killed mid-write
    // leaves a partial parquet dir that bare existence checks would
    // accept forever after
    val okMarker = java.nio.file.Paths.get(out, "_DERIVED_OK")
    if (!java.nio.file.Files.exists(okMarker)) {
      graft.util.Fs.deleteRecursive(new java.io.File(out))
      val copies = spark.range(factor.toLong).toDF("copy")
      val docs = spark.read.parquet(s"$base/documents.parquet")
      // offsets from MAX+1, not row count: sparse ids would let copy 0's
      // high ids collide with copy 1's range
      val docBase = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
      val nDocs = docs.count()
      docs.crossJoin(copies)
        .withColumn("doc_id", col("doc_id") + col("copy") * lit(docBase))
        .withColumn("text", when(col("copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zz"), col("copy"))))
        .withColumn("n_chars", length(col("text")))
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite").parquet(docsPath)
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val vecBase = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
      val nVec = emb.count()
      emb.crossJoin(copies)
        .withColumn("vec_id", col("vec_id") + col("copy") * lit(vecBase))
        .withColumn("embedding", transform(col("embedding"),
          x => x + col("copy").cast("float") * lit(0.0017f)))
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite").parquet(embPath)
      // event ids and USER ids offset per copy: the stateful streaming
      // ops then carry 10× keyed state, not just 10× updates to the
      // same keys (ts kept verbatim in its on-disk type — Tables
      // .normalizeTs adapts at read time — so window
      // density grows 10× while the window count stays fixed)
      val ev = spark.read.parquet(s"$base/events.parquet")
      val maxEv = ev.agg(max(col("event_id"))).head.getLong(0) + 1
      val maxUser = ev.agg(max(col("user_id"))).head.getLong(0) + 1
      ev.crossJoin(copies)
        .withColumn("event_id", col("event_id") + col("copy") * lit(maxEv))
        .withColumn("user_id", col("user_id") + col("copy") * lit(maxUser))
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite").parquet(evPath)
      // lineitem for the transfer-engine evidence: key space offset per
      // copy keeps l_orderkey chunkable; range-partition + sort by the
      // key because chunked range scans depend on parquet min/max
      // row-group pruning, which needs key-clustered storage (what any
      // real keyed ingest produces) — a randomly shuffled layout would
      // make every chunk scan every row group
      val li = spark.read.parquet(s"$base/lineitem.parquet")
      val maxKey = li.agg(max(col("l_orderkey"))).head.getLong(0) + 1
      li.crossJoin(copies)
        .withColumn("l_orderkey", col("l_orderkey") + col("copy") * lit(maxKey))
        .drop("copy")
        .repartitionByRange(32, col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      // orders for the z-order layout evidence: 10× orders over the SAME
      // customer key space (the realistic shape — order volume grows,
      // the customer base doesn't), so the second curve dimension keeps
      // its density while the first stretches
      val od = spark.read.parquet(s"$base/orders.parquet")
      val maxOk = od.agg(max(col("o_orderkey"))).head.getLong(0) + 1
      od.crossJoin(copies)
        .withColumn("o_orderkey", col("o_orderkey") + col("copy") * lit(maxOk))
        .drop("copy")
        .repartition(32)
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      java.nio.file.Files.writeString(okMarker, "")
      System.err.println(s"[bench-scale] derived ${factor}x data at $out " +
        s"(${nDocs * factor} docs, ${nVec * factor} vectors)")
    }

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // warmup (codegen/classloading) on the base size
    force(SparkEntry.queries("dedup_exact")(spark, base))

    // SPARK_GRAFT_ONLY=a,b,c re-measures a subset (drift attribution /
    // A-B runs) without paying the full ~8-minute sweep; the published
    // BENCH_SCALE.md table always comes from an unfiltered run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(family)(s => family.filter(s))

    // The exhaustive exact-pair ops REFUSE the 10× corpus under their
    // default maxPairs budget (the r8 guard working as designed —
    // Σ df·(df−1)/2 on the near-dup-dense scaled fixtures exceeds 50M).
    // The scale run's job is to MEASURE their honest quadratic cost, so
    // it runs them with an explicitly raised budget; the refusal itself
    // is spec-covered (CurationSpec's clique test).
    val overrides: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "dedup_ngram_jaccard" -> ((s, d) =>
        graft.ops.Curation.ngramJaccardPairs(
          graft.sources.Tables(s, d, "documents"), maxPairs = Long.MaxValue)),
      "dedup_containment" -> ((s, d) =>
        graft.ops.Curation.ngramContainmentPairs(
          graft.sources.Tables(s, d, "documents"), maxPairs = Long.MaxValue)),
      // r11 (VERDICT r10 #1 done-criteria): a boilerplate-heavy corpus
      // variant — 90% of docs gain one shared 12-word licence header,
      // so a single gram reaches corpus-wide frequency. Under the old
      // count-over-window frequency stage this concentrated the hot
      // gram's whole occurrence list on ONE task; the partial-agg
      // rewrite must keep the skewed cost near the uniform case's.
      "dedup_span_exact_boiler" -> ((s, d) => {
        val docs = graft.sources.Tables(s, d, "documents")
        val boiler = (0 until 12).map(i => s"lichdr$i").mkString(" ")
        graft.ops.Curation.spanDedup(docs.withColumn("text",
          when(col("doc_id") % 10 =!= 0,
            concat(lit(boiler), lit(" "), col("text")))
            .otherwise(col("text"))))
      }),
      // r11 (VERDICT r10 #4): BPE toward real tokenizer scale. r12
      // (VERDICT r11 #6): the raw documents vocabulary EXHAUSTED at 89
      // merges, so the 1000-merge claim was a slope extrapolated 10×
      // past the measured range. The corpus now gains a productive
      // synthetic MORPHOLOGY — eight trisyllabic words per document
      // composed from three 16-syllable banks (4096 distinct surface
      // forms, every syllable and syllable-pair corpus-frequent), so
      // hundreds of real merges execute: syllable-internal first, then
      // cross-syllable, then whole-word. numMerges = 600 bounds the
      // row's wall-clock while keeping ≥500 REAL merges in range.
      "text_bpe_train_1k" -> ((s, d) => {
        val syl = Seq(
          Seq("kar", "zel", "mon", "tup", "riv", "bax", "sho", "pel",
            "dra", "fiq", "lum", "vet", "gos", "nyx", "hab", "cez"),
          Seq("ora", "ilt", "une", "ask", "evo", "yma", "igr", "ohn",
            "ebi", "uxo", "afy", "ito", "ulz", "ach", "eko", "ivu"),
          Seq("nek", "sil", "tor", "mug", "pyx", "fen", "wab", "loz",
            "dit", "rya", "kov", "zef", "hur", "gim", "bes", "qan"))
        def bank(b: Int, idx: org.apache.spark.sql.Column) =
          element_at(array(syl(b).map(lit): _*), (idx % 16).cast("int") + 1)
        val words = (0 until 8).map { j =>
          val n = col("doc_id") * 8 + j
          concat(bank(0, n), bank(1, n / 16), bank(2, n / 256))
        }
        val enriched = graft.sources.Tables(s, d, "documents")
          .withColumn("text", concat_ws(" ", col("text") +: words: _*))
        graft.ops.TextAnalysis.bpeTrain(enriched, numMerges = 600)
      }))
    def q(name: String) = overrides.getOrElse(name, SparkEntry.queries(name))

    // Time BASE and SCALED in the same JVM so the ratio column in
    // BENCH_SCALE.md measures data scaling, not classloading luck.
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // De-confound the standing-artifact builds at the SCALED dir,
    // mirroring graft.Bench (VERDICT r13 #1): a *_from_index /
    // composition gate must measure read-compose, not the cold 10×
    // decode+build its first-in-JVM touch would otherwise pay inside
    // its timed region (measured: the quarantine book's scaled row
    // read 152 s build-inclusive vs ~30 s warm). The BASE dir's builds
    // already land in the untimed per-query warmup run.
    locally {
      val readers: Map[String, Seq[String]] = Map(
        "pipeline_media_admission_from_index" -> Seq("scaled_media_index_build"),
        "pipeline_multimodal_admission" ->
          Seq("scaled_media_index_build", "scaled_text_admit_build"),
        "multimodal_quarantine_from_index" -> Seq("scaled_quarantine_index_build"),
        // r15: report + streaming quarantines read the safe index too
        "multimodal_quarantine_report" -> Seq("scaled_quarantine_index_build"),
        "streaming_media_quarantine" -> Seq("scaled_quarantine_index_build"),
        "streaming_video_quarantine" -> Seq("scaled_quarantine_index_build"))
      val needed = selected.flatMap(readers.get).flatten.distinct
      def timed(nm: String)(body: => Unit): Unit =
        results(nm) = try time(body) catch { case e: Throwable =>
          System.err.println(s"[bench-scale] $nm failed: ${e.getMessage}"); -1.0
        }
      if (needed.contains("scaled_media_index_build"))
        timed("scaled_media_index_build") {
          SparkEntry.mediaSignatureIndex(spark, out); ()
        }
      if (needed.contains("scaled_text_admit_build"))
        timed("scaled_text_admit_build") {
          SparkEntry.surgicalAdmittedDocsPath(spark, out); ()
        }
      if (needed.contains("scaled_quarantine_index_build"))
        timed("scaled_quarantine_index_build") {
          SparkEntry.quarantineSignatureIndex(spark, out); ()
        }
    }
    selected.filter(n => SparkEntry.queries.contains(n) || overrides.contains(n))
      .foreach { name =>
      // per-QUERY warmup: the first execution of a plan shape carries its
      // Catalyst/codegen compile cost; timing it as "base" would deflate
      // the scaled/base ratio (the scaled run reuses the generated
      // classes). One untimed base run first, then time the second.
      try force(q(name)(spark, base))
      catch { case _: Throwable => () }
      val baseSec = try time(force(q(name)(spark, base)))
      catch { case e: Throwable =>
        System.err.println(s"[bench-scale] $name (base) failed: ${e.getMessage}"); -1.0
      }
      val sec = try time(force(q(name)(spark, out)))
      catch { case e: Throwable =>
        System.err.println(s"[bench-scale] $name failed: ${e.getMessage}"); -1.0
      }
      results(s"${name}_base") = baseSec
      results(name) = sec
    }

    // Transfer-engine evidence at the same 10× (~6M rows): full chunked
    // transfer, then the kill+resume cycle. GUARDED like the family
    // loop — one transfer exception must not abort main before the JSON
    // line prints (the driver would lose every timing of the round).
    if (only.forall(s => s("transfer_lineitem_scaled"))) {
      import graft.core._
      import graft.engine._
      def guarded(name: String)(body: => Double): Unit =
        results(name) = try body catch { case e: Throwable =>
          System.err.println(s"[bench-scale] $name failed: ${e.getMessage}"); -1.0
        }
      def spec(tag: String) = TransferSpec(
        EndpointSpec("parquet", path = out,
          tables = Seq(TableMapping("lineitem", targetName = Some(s"li_$tag")))),
        EndpointSpec("parquet", path = s"$out/dest_$tag"),
        MigrationSpec(batchSize = 100000, checkpointRowThreshold = 100000,
          checkpointDir = s"$out/cp_$tag", rateLimit = 2000000000))
      val plain = spec("plain")
      graft.util.Fs.deleteRecursive(new java.io.File(s"$out/dest_plain"))
      graft.engine.Checkpoint.deleteAll(s"$out/cp_plain")
      guarded("transfer_lineitem_scaled")(time {
        new TableTransferJob(spark, plain, plain.source.tables.head,
          new TransferControl, _ => ()).run()
      })
      val killed = spec("killed")
      graft.util.Fs.deleteRecursive(new java.io.File(s"$out/dest_killed"))
      graft.engine.Checkpoint.deleteAll(s"$out/cp_killed")
      guarded("transfer_kill_resume_scaled")(time {
        new TableTransferJob(spark, killed, killed.source.tables.head,
          TransferControl.cancelAfterChecks(30), _ => ()).run()
        new TableTransferJob(spark, killed, killed.source.tables.head,
          new TransferControl, _ => ()).run()
      })
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"scale_total","value":$total,"unit":"sec","queries":$qs,"scale":"${factor}x $base"}""")
    spark.stop()
  }
}
