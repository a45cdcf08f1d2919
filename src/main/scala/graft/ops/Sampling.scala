package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the reproducibility-first take on
  * the sampling passes every training-data pipeline runs (dev subsets,
  * eval holdouts, per-source quotas). Nothing here uses an RNG: each
  * row's PRIORITY is the first 15 hex digits of `md5(seed || id)` — a
  * uniform 60-bit integer that is a pure function of (seed, id) — so
  * every sample is reproducible on any partitioning, any cluster
  * layout, any engine, and the DuckDB oracle replays it bit-for-bit
  * (same posture as `Curation.mixSample`'s keep-fraction hash, applied
  * to ORDER STATISTICS instead of thresholds).
  *
  * [[prioritySample]] is the mergeable "reservoir": the k smallest
  * priorities form a uniform-without-replacement sample (min-k order
  * statistics of a uniform hash — the bottom-k / KMV construction),
  * and min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)), so per-partition /
  * per-day samples combine like every sketch in [[Sketch]]: keep the k
  * smallest again. Spark compiles the whole thing to ONE
  * TakeOrderedAndProject — no shuffle of the corpus, k rows to the
  * driver side of the plan, nothing else moves.
  *
  * [[stratifiedSample]] is the per-stratum quota variant (exactly
  * `min(quota, |stratum|)` docs per source): one window per stratum
  * ordered by the same priority — a single shuffle on the stratum key,
  * each partition sorting only its stratum.
  */
object Sampling {

  /** 60-bit uniform priority for (seed, id) — pure, portable. */
  private def priority(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(seed), id.cast("string"))), 1, 15), 16, 10)
      .cast("bigint")

  /** Global top-k by hash priority: a uniform random-without-
    * replacement sample of the corpus, deterministic in (seed, k).
    * Plan: TakeOrderedAndProject (asserted in PlanAuditSpec). */
  def prioritySample(docs: DataFrame, k: Int = 100,
                     seed: String = "sample1"): DataFrame =
    docs.select(col("doc_id"), col("source"),
        priority(seed, col("doc_id")).as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(k)

  /** Exact per-source quotas: the `min(quota, n)` smallest-priority
    * docs of each source. `pick` (1-based rank within the stratum)
    * is part of the output so the gate hashes the full order
    * statistic, not just membership. */
  def stratifiedSample(docs: DataFrame, quota: Int = 50,
                       seed: String = "strat1"): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        priority(seed, col("doc_id")).as("priority"))
      .withColumn("pick", row_number().over(w))
      .where(col("pick") <= quota)
  }
}
