package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** Properties the sample gates can't express: the min-k merge law
  * (per-half samples combine to the whole-corpus sample — what makes
  * the sample a mergeable artifact like the sketches), determinism
  * across repartitionings, and exact quota arithmetic. */
class SamplingSpec extends SparkTestBase {

  private lazy val docs = graft.sources.Tables(spark, sf, "documents")

  test("priority sample: deterministic under repartitioning; merge of half-samples = whole sample") {
    val whole = Sampling.prioritySample(docs, k = 64).collect()
    val reparted = Sampling.prioritySample(docs.repartition(13), k = 64).collect()
    assert(whole.map(_.getLong(0)).toSeq == reparted.map(_.getLong(0)).toSeq,
      "sample must be a pure function of (seed, ids), not the layout")
    // min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)) — the mergeable-
    // reservoir law: per-half top-64s, merged and re-topped, equal the
    // corpus sample exactly
    val a = Sampling.prioritySample(docs.where(col("doc_id") % 2 === 0), k = 64)
    val b = Sampling.prioritySample(docs.where(col("doc_id") % 2 === 1), k = 64)
    val merged = a.unionByName(b)
      .orderBy(col("priority"), col("doc_id")).limit(64).collect()
    assert(merged.map(_.getLong(0)).toSeq == whole.map(_.getLong(0)).toSeq,
      "min-k of merged half-samples must equal the whole-corpus min-k")
  }

  test("priority sample: different seeds give different samples; ordered by priority") {
    val s1 = Sampling.prioritySample(docs, k = 50, seed = "s1").collect()
    val s2 = Sampling.prioritySample(docs, k = 50, seed = "s2").collect()
    assert(s1.map(_.getLong(0)).toSet != s2.map(_.getLong(0)).toSet,
      "seeds must select different subsets")
    val ps = s1.map(_.getLong(2))
    assert(ps.sameElements(ps.sorted), "rows must arrive in priority order")
  }

  test("MinKSample aggregator equals the sort+limit sample (buffer IS the artifact)") {
    import spark.implicits._
    val agg = new Sampling.MinKSample(64)
    val viaAgg = Sampling.priorityRows(docs).as[Sampling.SampleRow]
      .groupByKey(_ => 1).agg(agg.toColumn.name("sample"))
      .collect().head._2.map(_.doc_id)
    val viaSort = Sampling.prioritySample(docs, k = 64).collect().map(_.getLong(0))
    assert(viaAgg.toSeq == viaSort.toSeq,
      "aggregator buffer must equal the sort+limit sample exactly")
  }

  test("MinKSample reduce/merge laws on random permutations and ties") {
    val agg = new Sampling.MinKSample(8)
    val rnd = new scala.util.Random(88)
    for (round <- 0 until 20) {
      // duplicate priorities force the tie-break path; doc_id disambiguates
      val rows = Seq.fill(60)(Sampling.SampleRow(
        rnd.nextInt(1000).toLong, s"s${rnd.nextInt(3)}", rnd.nextInt(20).toLong))
        .distinct
      val want = rows.sortBy(r => (r.priority, r.doc_id)).take(8)
      // fold-reduce over ANY permutation must reach the same buffer
      val perm = rnd.shuffle(rows)
      val viaReduce = perm.foldLeft(agg.zero)(agg.reduce)
      assert(viaReduce == want, s"round $round: reduce-fold diverged")
      // merge is symmetric and equals top-k of the union for any split
      val (l, r) = perm.splitAt(rnd.nextInt(perm.size + 1))
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bl, br) == want && agg.merge(br, bl) == want,
        s"round $round: merge diverged")
    }
  }

  test("KMV distinct estimate within 3σ of exact distinct count") {
    // 50k distinct values at k=256 → σ ≈ 1/√256 ≈ 6.3%
    val vals = spark.range(50000)
      .select(concat(lit("v"), col("id")).as("v"))
    val row = Sampling.kmvDistinct(vals, col("v")).head()
    assert(row.getAs[Long]("k_used") == 256L)
    val est = row.getAs[Long]("est").toDouble
    assert(math.abs(est - 50000) / 50000.0 < 0.19, s"KMV estimate $est vs 50000")
    // duplicates must not move the estimate: distinct hashes only
    val dup = vals.unionAll(vals.limit(20000))
    val est2 = Sampling.kmvDistinct(dup, col("v")).head().getAs[Long]("est")
    assert(est2.toDouble == est, "duplicate values must not perturb KMV")
  }

  test("split assignment: growth-stable, ratio-faithful, leak-proof") {
    val full = Sampling.splitAssign(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // growth stability — the property that prevents test→train leakage
    // across re-ingestions: assignments over HALF the corpus are
    // bit-identical to the full corpus's for the shared ids
    val half = Sampling.splitAssign(docs.where(col("doc_id") % 2 === 0))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    half.foreach { case (id, s) =>
      assert(full(id) == s, s"doc $id moved splits when the corpus grew")
    }
    // ratios: 80/10/10 within binomial noise at n=500
    val byS = full.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(math.abs(byS("train") - 400) < 60, byS.toString)
    assert(byS.values.sum == full.size && byS.keySet == Set("train", "val", "test"))
    // budget validation fails loudly
    intercept[IllegalArgumentException](
      Sampling.splitAssign(docs, trainBp = 9500, valBp = 1000))
  }

  test("stratified sample: exactly min(quota, |stratum|) per source, ranks 1..n") {
    val quota = 30
    val got = Sampling.stratifiedSample(docs, quota = quota).collect()
    val perSource = got.groupBy(_.getString(1))
    val counts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (src, n) =>
      val rows = perSource.getOrElse(src, Array.empty)
      assert(rows.length == math.min(quota.toLong, n),
        s"source $src: ${rows.length} != min($quota, $n)")
      assert(rows.map(_.getLong(3).toInt).sorted.sameElements(1 to rows.length),
        s"source $src: picks must be the exact ranks 1..${rows.length}")
    }
  }

  test("token-budget sample: strict priority prefix, budget respected, first excluded doc overflows") {
    val budget = 5000L
    val got = Sampling.tokenBudgetSample(docs, budgetTokens = budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // ground truth: full per-source priority order with token lengths
    val all = Sampling.tokenBudgetSample(docs, budgetTokens = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    all.groupBy(_._2).foreach { case (src, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._1)) // (priority, doc_id)
      val admitted = got.filter(_._2 == src).map(_._1).toSet
      val expect = ordered.takeWhile(_._5 <= budget)
      assert(admitted == expect.map(_._1).toSet,
        s"source $src: admitted set must be the exact budget prefix")
      // cum_tokens is a faithful running sum and stays inside budget
      var cum = 0L
      expect.foreach { r => cum += r._3; assert(r._5 == cum, s"cum drift at $r") }
      assert(cum <= budget)
      // the FIRST excluded doc (if any) genuinely overflows — the rule
      // is a prefix, not a skip-and-refill knapsack
      ordered.drop(expect.length).headOption.foreach { r =>
        assert(r._5 > budget, s"first excluded doc $r does not overflow")
      }
    }
    // deterministic under repartitioning
    val reparted = Sampling.tokenBudgetSample(docs.repartition(11),
      budgetTokens = budget).collect().map(_.getLong(0)).toSet
    assert(reparted == got.map(_._1).toSet)
  }

  test("temperature budget: integer sqrt weights, shares sum within rounding, per-source prefix") {
    import org.apache.spark.sql.functions._
    val total = 30000L
    val got = Sampling.temperatureBudgetSample(docs, totalBudgetTokens = total)
      .collect()
    assert(got.nonEmpty)
    // one budget per source; Σ budget_src ≤ total (integer-div floor
    // loses at most one token per source)
    val budgets = got.map(r => r.getString(1) -> r.getLong(5)).toMap
    val sumB = budgets.values.sum
    assert(sumB <= total && sumB > total - budgets.size,
      s"budget split $sumB vs total $total over ${budgets.size} sources")
    // budgets track temperature-smoothed token shares: recompute from
    // the corpus and compare exactly (all-integer arithmetic)
    val tokBySrc = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = tokBySrc.map { case (s, t) => s -> math.sqrt(t.toDouble).toLong }
    val wTot = w.values.sum
    budgets.foreach { case (s, b) =>
      assert(b == total * w(s) / wTot, s"source $s budget $b != ${total * w(s) / wTot}")
    }
    // admission within each source respects its own budget
    got.groupBy(_.getString(1)).foreach { case (s, rows) =>
      assert(rows.map(_.getLong(4)).max <= budgets(s))
    }
  }
}
