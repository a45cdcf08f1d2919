package graft

import org.apache.spark.sql.DataFrame

import graft.ops._
import graft.streaming.StreamingIngest

/** Behavior tests for the LLM-pipeline operators: recall on the
  * fixture's planted near-duplicates, scale-plan audits (no cartesian in
  * bucketed designs), stub-decoder plumbing, stream==batch equivalence. */
class OpsSpec extends SparkTestBase {

  private def docs = graft.sources.Tables(spark, sf, "documents")
  private def events = graft.sources.Tables(spark, sf, "events")
  private def emb = graft.sources.Tables(spark, sf, "embeddings")

  private def planOf(df: DataFrame): String = {
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  test("minhash LSH finds the planted near-duplicates (no cartesian in plan)") {
    val pairs = Dedup.minhashLsh(docs).cache()
    val n = pairs.count()
    // fixture plants ~28 pairs at jaccard ≈0.99; LSH at r=3,b=4 misses
    // a 0.98-pair with p≈1e-5
    assert(n >= 20, s"expected ≥20 planted near-dup pairs, got $n")
    assert(pairs.where(org.apache.spark.sql.functions.col("jaccard") < 0.5).count() == 0)
    val plan = planOf(Dedup.minhashLsh(docs))
    assert(!plan.contains("CartesianProduct"), "banded LSH must not cross-join")
    pairs.unpersist()
  }

  test("simhash pairs overlap the minhash near-dup pairs") {
    import spark.implicits._
    val mh = Dedup.minhashLsh(docs).select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    val sh = Dedup.simhashPairs(docs).select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    // near-identical docs have near-identical simhash; most planted pairs
    // should surface in both (banding can miss a few on either side)
    val overlap = mh.intersect(sh).size
    assert(overlap >= (mh.size * 0.7).toInt, s"overlap $overlap of ${mh.size}")
  }

  test("exact dedup covers every document exactly once") {
    import org.apache.spark.sql.functions._
    val d = Dedup.exact(docs)
    assert(d.agg(sum("n_copies")).head.getLong(0) == docs.count())
  }

  test("ann: brute-force returns k neighbors per query; bucket variant joins only buckets") {
    val bf = Similarity.bruteForceTopK(emb, maxQueryId = 5, k = 3)
    val counts = bf.groupBy("qid").count().collect()
    assert(counts.length == 5 && counts.forall(_.getLong(1) == 3))
    val plan = planOf(Similarity.bucketTopK(emb))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      "bucketed ANN must be an equi-join on the bucket id")
    // bucket results are a subset of same-bucket candidates with correct order
    val bk = Similarity.bucketTopK(emb, maxQueryId = 5, k = 3)
    assert(bk.count() > 0)
  }

  test("multimodal stub decode: plumbing preserves ids, deterministic features") {
    val f = Multimodal.extractFeatures(events, "event_id", "props").cache()
    assert(f.count() == events.count())
    val one = events.select("event_id", "props").where("event_id = 1").head()
    val bytes = one.getString(1).getBytes("UTF-8")
    val expect = Multimodal.stubDecoder(Iterator((1L, bytes))).next()
    val got = f.filter(_.id == 1L).head()
    assert(got.byteLen == expect.byteLen && got.width == expect.width &&
      got.height == expect.height && got.feat.sameElements(expect.feat))
    f.unpersist()
  }

  test("streaming window counts == batch computation") {
    import org.apache.spark.sql.functions._
    val stream = StreamingIngest.windowCounts(spark, sf)
    val batch = events.groupBy(
        date_trunc("hour", col("ts")).as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("streaming session windows partition all events") {
    import org.apache.spark.sql.functions._
    val sess = StreamingIngest.sessionCounts(spark, sf)
    assert(sess.agg(sum("cnt")).head.getLong(0) == events.count())
    // session windows per user are disjoint (rename one side — a memory
    // table self-join otherwise has ambiguous attribute ids)
    val other = sess.select(col("user_id").as("u2"), col("s_start").as("t2"))
    val overlaps = sess.join(other,
      col("user_id") === col("u2") && col("s_start") < col("t2") &&
        col("t2") < col("s_end"))
    assert(overlaps.isEmpty)
  }
}
