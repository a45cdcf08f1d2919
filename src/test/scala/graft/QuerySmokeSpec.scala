package graft

/** Every declared query runs at sf0.001 and (except known-empty edge
  * cases) returns rows; schemas carry the aliases the oracle expects. */
class QuerySmokeSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without a query impl: $missing")
  }

  /** Queries that may legitimately return zero rows at sf0.001. */
  private val mayBeEmpty: Set[String] = Set(
    // video re-mux duplicates are EXACT fingerprint collisions; the
    // closed-form MP4 fixtures first collide past id ~1000, so the
    // 1000-event sf0.001 slice has none (sf0.01 yields 1050 pairs —
    // the driver's gate scale)
    "dedup_video_pairs",
    // same fixtures, same reason: the dominant collision period is
    // 8960, so no batch↔corpus pair exists inside 1000 events
    "dedup_video_incremental")

  for ((name, _) <- SparkEntry.queries) {
    test(s"query $name runs at sf0.001") {
      // shared construction (GateFrames): eager gates execute once per
      // JVM even when GateSchemaSpec also needs their schema
      val df = GateFrames(name, spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("surgical pipeline never admits benchmark docs; trim counters reconcile") {
    import org.apache.spark.sql.functions._
    val out = GateFrames("pipeline_pretrain_surgical", spark, sf)
    assert(out.where(col("doc_id") < 20).count() == 0,
      "the eval set must never enter the training mix")
    // kept + removed must equal the ORIGINAL word count of every doc
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
    val bad = out.join(docs, "doc_id")
      .where(col("n_kept_words") + col("n_removed_words") =!= col("n_words"))
      .count()
    assert(bad == 0, "trim counters must partition the original word count")
  }

  test("upsert last-writer-wins semantics") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val upd  = Seq((2L, "b", 99.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    val out = graft.sinks.Upsert.resolve(base, upd, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0)))
  }

  test("upsert duplicate keys within one batch resolve deterministically") {
    import spark.implicits._
    val base = Seq((1L, "x", 1.0)).toDF("k", "name", "v")
    // duplicate key 1 inside the SAME update batch, shuffled differently
    val updA = Seq((1L, "a", 5.0), (1L, "b", 7.0), (2L, "c", 2.0)).toDF("k", "name", "v")
    val updB = updA.repartition(3).sortWithinPartitions($"v".desc)
    val ra = graft.sinks.Upsert.resolve(base, updA, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val rb = graft.sinks.Upsert.resolve(base, updB, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(ra == rb, "winner must not depend on partitioning")
    // documented rule: greatest tuple of non-key columns wins → ("b", 7.0)
    assert(ra == Seq((1L, "b", 7.0), (2L, "c", 2.0)))
  }

  test("upsert re-apply is a no-op (idempotence)") {
    import spark.implicits._
    val base = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val upd  = Seq((2L, 99.0)).toDF("k", "v")
    val once  = graft.sinks.Upsert.resolve(base, upd, Seq("k"))
    val twice = graft.sinks.Upsert.resolve(once, upd, Seq("k"))
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }
}
