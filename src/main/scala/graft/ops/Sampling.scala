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
      // bigint like the oracle's row_number (and window_ntile's tile
      // cast) — dtype-sensitive replicas compare schemas, not just
      // values
      .withColumn("pick", row_number().over(w).cast("bigint"))
      .where(col("pick") <= quota)
  }

  /** Per-source sampling under a TOKEN budget — the unit training
    * mixtures are actually planned in ([[Curation]]'s temperature mix
    * reweights by tokens for the same reason): [[stratifiedSample]]'s
    * doc-count quota treats a 10-token stub and a 10k-token article as
    * equal contributions, so a source full of long documents blows its
    * token share. Here each source admits its smallest-PRIORITY docs
    * (same md5 order — deterministic, growth-insensitive for the
    * admitted prefix as long as admitted docs' priorities don't
    * change, which they can't) until the running token sum would pass
    * `budgetTokens`: keep iff cum_tokens ≤ budget, where cum_tokens
    * includes the doc itself — a strict prefix of the priority order
    * (no skip-and-refill knapsack; the rule must be a pure window
    * function for any engine to replay it). Tokens are whitespace
    * counts (`TextAnalysis`' convention). Output carries n_tokens and
    * cum_tokens so the gate hashes the whole admission ledger.
    *
    * Scale shape: one shuffle on `source` (the window), the running
    * sum inside each stratum's sort — same plan family as
    * [[stratifiedSample]]; pairs naturally with
    * `Curation.packSequences` downstream (budgeted docs → packed
    * training sequences). */
  def tokenBudgetSample(docs: DataFrame, budgetTokens: Long = 20000L,
                        seed: String = "tokbudget1"): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
        priority(seed, col("doc_id")).as("priority"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
  }

  /** [[tokenBudgetSample]] with the budget SPLIT across sources by
    * temperature-smoothed token shares — the full "give me an N-token
    * training mix, balanced across sources, deterministically" op
    * (`Curation.temperatureMix` sets per-doc keep odds by the same
    * smoothing idea; this one hits an exact token target instead).
    * Per-source weight w_s = floor(sqrt(Σ tokens_s)) — the T = 2
    * smoothing exponent, computed as floor∘sqrt of an exact BIGINT:
    * sqrt is correctly rounded in both engines (unlike ln/exp) and
    * every sum/division here is integer arithmetic, so the gate
    * replays bit-for-bit (no order-dependent double sums — the hazard
    * that bans a Σ of raw sqrt weights). Budget_s = total·w_s div Σw,
    * then the usual smallest-priority prefix admission per source.
    * Scale shape: one tiny per-source aggregate joined back broadcast,
    * one window shuffle on source — same family as
    * [[stratifiedSample]]/[[tokenBudgetSample]]. */
  def temperatureBudgetSample(docs: DataFrame,
                              totalBudgetTokens: Long = 60000L,
                              seed: String = "tempbudget1"): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("bigint").as("n_tokens"),
      priority(seed, col("doc_id")).as("priority"))
    val weights = toks.groupBy("source")
      .agg(sum("n_tokens").as("tok_src"))
      .withColumn("w", floor(sqrt(col("tok_src"))).cast("bigint"))
    val totalW = weights.agg(sum("w").as("w_total"))
    val budgets = weights.crossJoin(broadcast(totalW)) // 1-row scalar
      .withColumn("budget_src",
        expr(s"cast($totalBudgetTokens as bigint) * w div w_total"))
      .select(col("source"), col("budget_src"))
    val win = Window.partitionBy(col("source"))
      .orderBy(col("priority"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.withColumn("cum_tokens", sum(col("n_tokens")).over(win))
      .join(budgets, "source")
      .where(col("cum_tokens") <= col("budget_src"))
      .select("doc_id", "source", "n_tokens", "priority",
        "cum_tokens", "budget_src")
  }

  /** Deterministic train/validation/test split — the assignment every
    * training corpus needs exactly once and must NEVER change under
    * reshuffling, re-ingestion, or corpus growth: a document's split
    * is a pure function of its id (md5 fraction in basis points
    * against cumulative cut-offs), so adding documents later cannot
    * move an existing document across splits (no leakage from val/test
    * into train on re-runs), and any engine recomputes the same
    * assignment. One narrow codegen'd pass, no shuffle, no state. */
  def splitAssign(docs: DataFrame, trainBp: Int = 8000, valBp: Int = 1000,
                  seed: String = "split1"): DataFrame = {
    require(trainBp >= 0 && valBp >= 0 && trainBp + valBp <= 10000,
      s"basis-point budgets invalid: train=$trainBp val=$valBp")
    val bp = (conv(substring(md5(concat(lit(seed), col("doc_id").cast("string"))),
      1, 8), 16, 10).cast("bigint") % 10000).as("split_bp")
    docs.select(col("doc_id"), col("source"), bp)
      .withColumn("split",
        when(col("split_bp") < trainBp, lit("train"))
          .when(col("split_bp") < trainBp + valBp, lit("val"))
          .otherwise(lit("test")))
  }

  /** KMV (k-minimum-values) distinct-count estimate — the OTHER thing
    * the min-k sample is (Bar-Yossef et al. 2002): if the k-th
    * smallest of the DISTINCT 60-bit hash values is p_k, the value
    * universe holds ≈ (k−1)·2^60 / p_k distinct members, σ ≈ 1/√k.
    * One row out: (k_used, p_k, est) with
    * `est = floor((k_used−1)·2^60 / p_k)` computed in DECIMAL — the
    * same no-floats gate contract as the HLL estimates
    * ([[Sketch.hllEstimate]]). Mergeable exactly like
    * [[prioritySample]] (min-k of unioned min-k sets), so per-shard
    * KMV artifacts combine without touching data; next to HLL it
    * trades k longs of state (vs 4096 registers) for an unbiased
    * estimator plus a FREE uniform sample of the distinct values. */
  def kmvDistinct(df: DataFrame, value: Column, k: Int = 256,
                  seed: String = "kmv1"): DataFrame = {
    val minK = df.select(priority(seed, value).as("priority"))
      .dropDuplicates("priority")
      .orderBy(col("priority")).limit(k)
    minK.agg(count(lit(1)).as("k_used"), max(col("priority")).as("p_k"))
      // (k−1)·2^60 passes BIGINT range immediately → DECIMAL operands;
      // IntegralDivide → BIGINT, positive operands so trunc == floor
      .withColumn("est", expr(
        "cast(k_used - 1 as decimal(10,0)) * " +
          "cast(shiftleft(cast(1 as bigint), 60) as decimal(20,0)) div p_k"))
  }

  /** One sampled row: the (priority, doc_id) pair is the total order,
    * `source` rides along as payload. */
  final case class SampleRow(doc_id: Long, source: String, priority: Long)

  /** The min-k sample as a typed AGGREGATE (`Aggregator`, SURVEY §2.8's
    * UDAF tier): reduce/merge keep the k smallest rows, so the
    * aggregation BUFFER is the mergeable sample artifact itself —
    * bounded at k rows on every executor, partial-aggregated map-side
    * like any agg, and legal as STREAMING state in complete mode
    * (where sort+limit is not): the running buffer IS the corpus
    * sample after every micro-batch. The buffer stays sorted;
    * per-element reduce is an O(1) reject when the row can't enter
    * (the common case once the buffer fills) and an O(k) insert
    * otherwise. */
  class MinKSample(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        SampleRow, Seq[SampleRow], Seq[SampleRow]] {
    private def lt(a: SampleRow, b: SampleRow): Boolean =
      a.priority < b.priority || (a.priority == b.priority && a.doc_id < b.doc_id)
    override def zero: Seq[SampleRow] = Vector.empty
    override def reduce(b: Seq[SampleRow], a: SampleRow): Seq[SampleRow] =
      if (b.size >= k && !lt(a, b.last)) b
      else {
        val (lo, hi) = b.span(lt(_, a))
        ((lo :+ a) ++ hi).take(k)
      }
    override def merge(b1: Seq[SampleRow], b2: Seq[SampleRow]): Seq[SampleRow] =
      (b1 ++ b2).sortWith(lt).take(k)
    override def finish(r: Seq[SampleRow]): Seq[SampleRow] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[SampleRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[SampleRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** (doc_id, source, priority) rows for [[MinKSample]] — the shared
    * input shape of the batch gate and its streaming twin. */
  def priorityRows(docs: DataFrame, seed: String = "sample1"): DataFrame =
    docs.select(col("doc_id"), col("source"),
      priority(seed, col("doc_id")).as("priority"))
}
