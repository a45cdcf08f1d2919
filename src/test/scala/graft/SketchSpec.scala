package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketch

/** Sketch properties that the hash-match gates cannot express: merge
  * associativity (shard sketches combine to the global sketch), the CMS
  * ≥-exact overestimate bound under REAL collisions (synthetic
  * high-vocabulary corpus — the testdata vocabulary is smaller than the
  * cell table, so collisions never fire there), and estimator accuracy
  * including the bias-corrected small-range branch the oracle path
  * deliberately avoids (ln is not cross-engine bit-stable). */
class SketchSpec extends SparkTestBase {

  import spark.implicits._

  test("HLL: merged shard registers equal the globally-built registers") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
    val v = concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"))
    val merged = Sketch.hllMergedRegisters(
      Sketch.hllRegisters(li, v, col("l_returnflag")))
      .select("bucket", "max_rank")
    val global = Sketch.hllRegisters(li, v, lit("ALL"))
      .select("bucket", "max_rank")
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty,
      "per-shard max-merge must equal the single-pass global sketch")
  }

  test("HLL: raw estimate within 5% of exact at n >> 2.5m") {
    // 200k distinct values: comfortably in the raw estimator's regime
    val df = spark.range(200000).select(concat(lit("v"), col("id")).as("v"))
    val est = Sketch.hllEstimate(
      Sketch.hllRegisters(df, col("v"), lit("one")))
      .head()
    val raw = est.getAs[Long]("est_centi") / 100.0
    assert(math.abs(raw - 200000) / 200000.0 < 0.05,
      s"raw estimate $raw vs exact 200000")
  }

  test("HLL: corrected estimate handles the small-range regime") {
    // 2000 distinct: below 2.5m = 10240, where raw is badly biased and
    // linear counting m·ln(m/V) takes over (driver-side scalar, ln ok)
    val df = spark.range(2000).select(concat(lit("s"), col("id")).as("v"))
    val row = Sketch.hllEstimate(
      Sketch.hllRegisters(df, col("v"), lit("one"))).head()
    val corrected = Sketch.hllCorrected(
      row.getAs[Long]("buckets_hit"), row.getAs[java.math.BigDecimal]("s_prime"))
    assert(math.abs(corrected - 2000) / 2000.0 < 0.05,
      s"corrected estimate $corrected vs exact 2000")
  }

  test("HLL: gated hllDistinct projects no wide-decimal columns") {
    // the r8 red gate: s_prime DECIMAL(25,0) in the hashed output —
    // GateSchemaSpec bans the class; this pins the specific shape
    val df = Sketch.hllDistinct(
      spark.range(100).select(col("id").cast("string").as("v")),
      col("v"), lit("one"))
    assert(df.columns.toSeq == Seq("shard", "buckets_hit", "est_centi"))
  }

  test("HLL: est_centi clamps instead of wrapping on degenerate register tables") {
    // an adversarial hand-built frame: every bucket at max rank 61 →
    // s_prime = 4096 (the true minimum), quotient ≈ 2.4e24 >> Long.Max.
    // Non-ANSI BIGINT division would wrap silently while DuckDB's
    // HUGEINT path stays exact — the clamp pins both to Long.MaxValue
    val regs = spark.range(Sketch.HllM)
      .select(lit("adv").as("shard"), col("id").as("bucket"),
        lit(61L).as("max_rank"))
    val row = Sketch.hllEstimate(regs).head()
    assert(row.getAs[Long]("est_centi") == Long.MaxValue)
    // and a realistic frame sits far below the clamp threshold
    val real = Sketch.hllEstimate(Sketch.hllRegisters(
      spark.range(50000).select(concat(lit("c"), col("id")).as("v")),
      col("v"), lit("one"))).head()
    assert(real.getAs[Long]("est_centi") < Long.MaxValue)
    assert(Sketch.HllSPrimeSafeMin * BigInt(Long.MaxValue) > Sketch.HllEstC)
  }

  test("CMS: overestimates every token and is exact sans collisions") {
    // vocabulary of 5000 > 1024 cells → guaranteed collisions; tokens
    // must be PURE alpha (digits are split delimiters), so render the id
    // in base 26 and map its digit alphabet onto letters; each token
    // appears (id % 7) + 1 times
    val tok = concat(lit("t"), translate(conv(col("id"), 10, 26),
      "0123456789ABCDEFGHIJKLMNOP", "abcdefghijklmnopqrstuvwxyz"))
    val docs = spark.range(5000)
      .select(col("id").as("doc_id"),
        concat_ws(" ", array_repeat(tok,
          (col("id") % 7 + 1).cast("int"))).as("text"))
    val sketch = Sketch.cmsSketch(docs)
    val exact = docs
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
    // every token's min-cell estimate must be >= its exact count
    val est = Sketch.cmsTopK(docs, k = 5000)
    val bad = est.where(col("cms_est") < col("exact_cnt")).count()
    assert(bad == 0, s"$bad tokens underestimated — CMS bound violated")
    // and collisions must actually occur at this vocabulary (the bound
    // above would be vacuous if the table were injective)
    val over = est.where(col("cms_est") > col("exact_cnt")).count()
    assert(over > 0, "no collisions at vocab 5000 > width 1024 — suspicious")
    assert(exact.count() == 5000)
  }

  test("HLL: streaming register maintenance equals the batch build") {
    val stream = graft.streaming.StreamingIngest.hllRegisters(spark, sf)
      .select("shard", "bucket", "max_rank")
    val batch = Sketch.hllRegisters(
      graft.sources.Tables(spark, sf, "events"),
      col("user_id"), col("event_type"))
      .select("shard", "bucket", "max_rank")
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "streaming HLL state must equal the batch register table")
  }

  test("Histogram quantiles: bins merge by sum; estimates within a bin width of exact") {
    val li = graft.sources.Tables(spark, sf, "lineitem")
    val h = Sketch.histogram(li, col("l_extendedprice"), col("l_returnflag"))
    val merged = Sketch.histMerged(h).select("bin", "cnt")
    val global = Sketch.histogram(li, col("l_extendedprice"), lit("ALL"))
      .select("bin", "cnt")
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty,
      "per-shard bin sums must equal the single-pass global histogram")
    val est = Sketch.histQuantiles(h.unionByName(Sketch.histMerged(h)))
      .where(col("shard") === "ALL").collect()
    assert(est.length == 3)
    // relativeError 0 → exact quantiles; both the exact quantile and the
    // interpolated estimate lie in the covering bin (2× width for the
    // boundary-definition slack between the two quantile conventions)
    val exact = li.stat.approxQuantile("l_extendedprice",
      Array(0.5, 0.9, 0.99), 0.0)
    val byQ = Map(50 -> exact(0), 90 -> exact(1), 99 -> exact(2))
    est.foreach { r =>
      val q = r.getAs[Int]("q_pct")
      val e = r.getAs[Long]("est_micro") / 1e6
      assert(math.abs(e - byQ(q)) <= 2 * Sketch.HistWidth,
        s"P$q estimate $e too far from exact ${byQ(q)}")
    }
  }

  test("HLL set algebra: union/intersection estimates track exact overlap") {
    // A = 0..119999, B = 80000..199999 → |A|=120k, |B|=120k,
    // |A∪B|=200k, |A∩B|=40k — sizes well inside the raw-estimator
    // regime (> 2.5m = 10240)
    val a = spark.range(0, 120000).select(concat(lit("k"), col("id")).as("v"))
    val b = spark.range(80000, 200000).select(concat(lit("k"), col("id")).as("v"))
    val est = Sketch.hllSetAlgebra(
        Sketch.hllRegisters(a, col("v"), lit("x")),
        Sketch.hllRegisters(b, col("v"), lit("x")))
      .collect().map(r => r.getString(0) -> r.getLong(1) / 100.0).toMap
    assert(est.keySet == Set("A", "B", "A_union_B", "A_intersect_B"))
    def near(got: Double, want: Double, tol: Double): Unit =
      assert(math.abs(got - want) / want < tol, s"$got vs $want")
    near(est("A"), 120000, 0.05)
    near(est("B"), 120000, 0.05)
    near(est("A_union_B"), 200000, 0.05)
    // inclusion-exclusion compounds three ±1.6%σ estimates against a
    // 5× smaller target — allow a wider band
    near(est("A_intersect_B"), 40000, 0.25)
  }

  test("Bloom: no false negatives, bounded false positives") {
    // corpus keys k0..k1999; probes = 500 members + 2000 NON-members
    val corpus = spark.range(2000).select(concat(lit("k"), col("id")).as("key"))
    val bloom = Sketch.bloomMerge(
      Sketch.bloomBuild(corpus, col("key"), lit("one")))
    val members = spark.range(500)
      .select(col("id").as("pid"), concat(lit("k"), col("id") * 4).as("key"))
    val again = Sketch.bloomScreen(bloom, members, col("pid"), col("key"))
    assert(again.where(!col("maybe_seen")).count() == 0,
      "a member key was reported unseen — Bloom false negative")
    val strangers = spark.range(2000)
      .select(col("id").as("pid"), concat(lit("x"), col("id")).as("key"))
    val fp = Sketch.bloomScreen(bloom, strangers, col("pid"), col("key"))
      .where(col("maybe_seen")).count()
    // load 2000*4/65536 ≈ 0.12 → FP ≈ (1-e^-0.122)^4 ≈ 0.02%; allow 1%
    assert(fp <= 20, s"$fp false positives in 2000 disjoint probes")
  }

  test("Bloom: shard filters OR-merge to the globally-built filter") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val merged = Sketch.bloomMerge(
      Sketch.bloomBuild(docs, md5(col("text")), col("source")))
      .select("word", "bits")
    val global = Sketch.bloomBuild(docs, md5(col("text")), lit("ALL"))
      .select("word", "bits")
    assert(merged.exceptAll(global).isEmpty && global.exceptAll(merged).isEmpty,
      "per-shard OR-merge must equal the single-pass global filter")
  }

  test("CMS: cell tables are additive under corpus union") {
    val docs = graft.sources.Tables(spark, sf, "documents")
    val a = docs.where(col("doc_id") % 2 === 0)
    val b = docs.where(col("doc_id") % 2 === 1)
    val summed = Sketch.cmsSketch(a).unionByName(Sketch.cmsSketch(b))
      .groupBy("j", "cell").agg(sum("cnt").as("cnt"))
    val whole = Sketch.cmsSketch(docs)
    assert(summed.exceptAll(whole).isEmpty && whole.exceptAll(summed).isEmpty,
      "cms(a) + cms(b) must equal cms(a ∪ b)")
  }
}
