package graft

import org.apache.spark.sql.types._

/** Dtype lint over every ORACLE-HASHED gate's output schema.
  *
  * Round 8's only red gate (`agg_hll_distinct`) was a pure
  * schema-portability defect: its values bit-matched an independent
  * DuckDB replay, but it was the one gate in the suite emitting a
  * DECIMAL(25,0) column — wider than BIGINT's 19 digits — and the
  * driver environment renders such a decimal differently on one side
  * of its textual compare. Same family as round 7's `round(double, n)`
  * divergence (see memory: portable-rounding-contract, and
  * PortableSpec's oracle scan banning `round(`).
  *
  * This spec makes the whole CLASS unreintroducible: every query that
  * has an `oracleSql` entry (i.e. is hash-compared, not rows-only)
  * must project only dtypes proven portable across the Spark dump →
  * parquet → driver canonicalization → DuckDB replay path:
  *
  *   - VARCHAR / BOOLEAN / DATE / TIMESTAMP — textual forms agree
  *   - BYTE / SHORT / INT / BIGINT — exact integers
  *   - DECIMAL(p≤18, s) — fits a 64-bit unscaled long on both sides
  *   - DOUBLE — by PER-GATE, PER-COLUMN opt-in only (VERDICT r9 #7):
  *     the [[doubleWhitelist]] below names every double-emitting
  *     column, each either a raw source passthrough (both engines
  *     read the identical parquet value) or produced through
  *     `Portable.fx` quantization (PortableSpec bans bare `round(` in
  *     oracle SQL; quantized values are exactly representable). A new
  *     gate emitting an unlisted double FAILS here and must be added
  *     deliberately — the lint can't verify fx-provenance, so the
  *     whitelist is the reviewed register of that judgment.
  *
  * Banned: FLOAT (single-precision text forms differ), DECIMAL with
  * precision > 18 (the r8 failure), BINARY (no canonical text form in
  * the compare). Arrays/structs/maps are recursed into.
  */
class GateSchemaSpec extends SparkTestBase {

  /** gate name → double-typed column paths reviewed as portable.
    * Source-passthrough columns (parquet values read verbatim by both
    * engines) and fx-quantized computed columns only. */
  private val doubleWhitelist: Map[String, Set[String]] = Map(
    "agg_grouping_sets" -> Set("total"),
    "agg_percentiles" -> Set("median_qty", "p95_qty"),
    "ann_bucket_topk" -> Set("cos"),
    "ann_cosine_topk" -> Set("cos"),
    "ann_index_lifecycle" -> Set("cos"),
    // the stream-maintained sibling probes through the same
    // fx-quantized cosine
    "streaming_ann_index" -> Set("cos"),
    "ann_ivf_sampled_topk" -> Set("cos"),
    "ann_ivf_topk" -> Set("cos"),
    "ann_ivf_trained_topk" -> Set("cos"),
    "ann_ivfpq_rerank" -> Set("dist"),
    "ann_ivfpq_topk" -> Set("adc"),
    "array_stats" -> Set("first_val", "l2_norm", "mean_val"),
    "corpus_report" -> Set("avg_tokens"),
    "dedup_cdc_chunks" -> Set("dup_chunk_frac"),
    "dedup_containment" -> Set("containment"),
    "dedup_containment_screened" -> Set("containment"),
    "dedup_embedding_cosine" -> Set("cos"),
    "dedup_incremental" -> Set("jaccard"),
    "dedup_jaccard_screened" -> Set("jaccard"),
    "dedup_keep_best" -> Set("quality"),
    "dedup_minhash_lsh" -> Set("jaccard"),
    "dedup_ngram_jaccard" -> Set("jaccard"),
    "dedup_paragraph" -> Set("dup_chunk_frac"),
    "embedding_project" -> Set("v"),
    "embedding_quantize" -> Set("offset6", "scale6"),
    "join_asof" -> Set("value"),
    "join_asof_bucketed" -> Set("value"),
    "join_asof_event" -> Set("last_purchase"),
    "join_asof_tolerance" -> Set("value"),
    "join_bucketed_colocated" -> Set("total"),
    "k4_ttl_preserve" -> Set("value"),
    "o1_sort_limit" -> Set("l_quantity"),
    "p1_projection" -> Set("l_extendedprice"),
    "p2_transform_arith" -> Set("price_cents"),
    "q1_agg" -> Set("sum_qty", "sum_base_price"),
    "q3_join" -> Set("revenue"),
    "s1_keyset_scan" -> Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "s3_cursor_scan" -> Set("value"),
    "streaming_asof" -> Set("value"),
    "streaming_incremental_dedup" -> Set("jaccard"),
    "text_bigram_logprob" -> Set("logprob"),
    // fx-quantized DECIMAL log-ratio sum cast to double
    "text_dsir_select" -> Set("logw"),
    // the same 6-dp values via the map-only micro-unit fold
    "streaming_dsir_score" -> Set("logw"),
    "text_length_trim" -> Set("pct"),
    "text_logprob_trim" -> Set("logprob", "pct"),
    "text_quality" -> Set("quality"),
    "text_quality_classifier" -> Set("score"),
    "text_repetition" -> Set("dup_word_frac", "top_bigram_frac"),
    "text_temperature_mix" -> Set("p_keep"),
    "text_tfidf" -> Set("tfidf"),
    "text_tokens" -> Set("ttr"),
    "text_unigram_logprob" -> Set("logprob"),
    "transfer_config_multi" -> Set("o_totalprice"),
    "transfer_jdbc_composite_pk" -> Set("c_acctbal"),
    "transfer_jdbc_crossdb" -> Set("p_retailprice"),
    "transfer_jdbc_incremental" -> Set("p_retailprice"),
    "transfer_jdbc_kill_resume" -> Set("o_totalprice"),
    "transfer_jdbc_roundtrip" -> Set("c_acctbal"),
    "transfer_jdbc_varchar_pk" -> Set("c_acctbal"),
    "transfer_nested_roundtrip" -> Set("v2", "tag_v"),
    "transfer_partitioned" -> Set("o_totalprice"),
    "transfer_resume" -> Set("c_acctbal"),
    "upsert_last_writer" -> Set("c_acctbal"),
    "window_lead_lag" -> Set("prev_value", "next_value"),
    "window_ntile" -> Set("c_acctbal", "pr", "cd"),
    "window_running_sum" -> Set("running_value"))

  private def violations(name: String, dt: DataType, path: String): Seq[String] =
    dt match {
      case StringType | BooleanType | DateType | TimestampType |
           TimestampNTZType | ByteType | ShortType | IntegerType |
           LongType =>
        Nil
      case DoubleType =>
        if (doubleWhitelist.getOrElse(name, Set.empty).contains(path)) Nil
        else Seq(s"$name.$path: DOUBLE outside the per-gate whitelist — doubles are " +
          "portable ONLY as raw source passthroughs or Portable.fx-quantized values; " +
          "review the column and add it to GateSchemaSpec.doubleWhitelist deliberately")
      case d: DecimalType if d.precision <= 18 => Nil
      case d: DecimalType =>
        Seq(s"$name.$path: DECIMAL(${d.precision},${d.scale}) wider than 18 digits " +
          "— driver environments render wide decimals divergently (r8 agg_hll_distinct)")
      case FloatType =>
        Seq(s"$name.$path: FLOAT — single-precision text forms are not portable; " +
          "cast to DOUBLE via Portable.fx or to DECIMAL")
      case BinaryType =>
        Seq(s"$name.$path: BINARY — no canonical text form in the driver compare; " +
          "emit a hex/md5 string instead")
      case ArrayType(e, _)  => violations(name, e, s"$path[]")
      case MapType(k, v, _) =>
        violations(name, k, s"$path.key") ++ violations(name, v, s"$path.value")
      case StructType(fs)   => fs.toSeq.flatMap(f => violations(name, f.dataType, s"$path.${f.name}"))
      case other =>
        Seq(s"$name.$path: unvetted dtype $other — extend GateSchemaSpec deliberately " +
          "if this type is proven portable")
    }

  for (name <- SparkEntry.oracleSql.keySet.toSeq.sorted) {
    test(s"gate $name projects only portable dtypes") {
      // shared construction (GateFrames): eager gates — streaming runs,
      // iterative closures — execute once per JVM, not once per spec
      val df = GateFrames(name, spark, sf)
      val bad = df.schema.fields.toSeq
        .flatMap(f => violations(name, f.dataType, f.name))
      assert(bad.isEmpty, bad.mkString("\n"))
    }
  }

  test("the double whitelist carries no stale entries") {
    val gates = SparkEntry.oracleSql.keySet
    val stale = doubleWhitelist.keySet -- gates
    assert(stale.isEmpty, s"whitelisted gates no longer declared: $stale")
  }
}
