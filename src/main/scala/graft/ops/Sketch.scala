package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Mergeable streaming sketches — the 100 TB cardinality / frequency
  * primitives (Flajolet et al.'s HyperLogLog; Cormode & Muthukrishnan's
  * Count-Min). At cluster scale these are the only sane shapes for
  * "how many distinct X" and "which tokens are hot" over a corpus that
  * never fits anywhere: each executor folds its partition into a
  * fixed-size register/cell table, tables merge associatively (max for
  * HLL, + for CMS), and the merged table answers the query — one
  * narrow shuffle of a few KB per partition regardless of input size.
  *
  * Spark's own `approx_count_distinct` is the same HLL idea but its
  * register hashing is engine-internal, so its estimate can only get a
  * rows-only gate. Everything here is built from md5 + integer bit
  * tricks that DuckDB reproduces bit-for-bit, which buys the stronger
  * contract: the REGISTERS and the estimate itself hash-match an
  * independent replay (the reference's row-count verification —
  * `dbtransfer` `migration.go` count checks — taken to sketch land).
  *
  * Determinism rules (why the formulas look the way they do):
  *   - register terms are `1 << (61 - rank)` BIGINTs summed as
  *     DECIMAL — integer-exact, order-independent; a double `pow(2,-r)`
  *     sum would depend on partition iteration order, and a
  *     double→decimal cast rounds differently across engines (measured:
  *     Spark 1.15292150460684698e18 vs DuckDB ...976 for 2^60)
  *   - the gated path contains NO floating point AT ALL: the estimates
  *     are integer division of pinned integer constants by integer
  *     register sums (centi-/micro-unit outputs). Round 7 proved that
  *     even one final `round(double, n)` is not portable — Spark rounds
  *     via BigDecimal HALF_UP on the double's exact binary expansion,
  *     DuckDB via scaled-multiply nearbyint, and the driver's gate run
  *     caught them disagreeing on boundary values (CORRECTNESS_r07:
  *     agg_hll_distinct / agg_hist_quantiles hash-fails). No `ln`/`exp`
  *     anywhere in the gated path either (libm results are not sworn
  *     identical across engines; the bias-corrected estimator that
  *     needs `ln` lives in [[hllCorrected]] and is unit-tested, not
  *     oracle-hashed).
  */
object Sketch {

  // ---------------------------------------------------------------- HLL

  /** p=12 → m=4096 registers ≈ ±1.6% standard error, 32 KB per sketch
    * at one byte per register — the common production operating point. */
  val HllM = 4096

  private val TwoPow61 = 1L << 61

  /** Per-value (bucket, rank): bucket = first 12 md5 bits, rank =
    * 1 + leading zeros of the next 60 bits. `bin()` has no leading
    * zeros in either engine, so rank = 61 - len(bin(x)) needs no
    * clz intrinsic (and no float log2 with its boundary hazards). */
  private def bucketed(value: Column): (Column, Column) = {
    val h = md5(value.cast("string"))
    val bucket = conv(substring(h, 1, 3), 16, 10).cast("long")
    val x = conv(substring(h, 4, 15), 16, 10).cast("long")
    val rank = when(x === 0, lit(61)).otherwise(lit(61) - length(bin(x)))
    (bucket, rank)
  }

  /** The sketch ARTIFACT: per (shard, bucket) max rank. This is what a
    * production pipeline persists per file/partition/day and merges by
    * `max` — [[hllMergedRegisters]] — so publishing it under an oracle
    * gate certifies the stored object, not just one query over it
    * (same posture as the gated LSH band index, Dedup.bandedKeys). */
  def hllRegisters(df: DataFrame, value: Column, shard: Column): DataFrame = {
    val (bucket, rank) = bucketed(value)
    // rank as BIGINT like the oracle's arithmetic — dtype-sensitive
    // replicas compare schemas, not just values
    df.select(shard.cast("string").as("shard"), bucket.as("bucket"),
        rank.cast("bigint").as("rank"))
      .groupBy("shard", "bucket").agg(max("rank").as("max_rank"))
  }

  /** Cross-shard merge: registers combine by per-bucket max — the
    * associative property that makes the sketch distributable. */
  def hllMergedRegisters(registers: DataFrame): DataFrame =
    registers.groupBy("bucket").agg(max("max_rank").as("max_rank"))
      .select(lit("ALL").as("shard"), col("bucket"), col("max_rank"))

  /** α·m²·2^61·10² pinned as ONE exact integer constant: the IEEE
    * double α·m² (same bits on every platform — plain literal
    * arithmetic) expanded exactly via BigDecimal, scaled by the exact
    * integers 2^61 and 100, floored. 28 digits — inside DECIMAL(38,0)
    * and DuckDB's HUGEINT. Embedded verbatim in both engines'
    * expressions, so the estimate needs no cross-engine float ops. */
  val HllEstC: BigInt =
    (BigDecimal(0.7213 / (1.0 + 1.079 / HllM.toDouble) *
        HllM.toDouble * HllM.toDouble) *
      BigDecimal(BigInt(1) << 61) * 100).toBigInt

  /** Smallest register sum for which est_centi = HllEstC div s_prime
    * still fits a BIGINT (~1.09e9). s_prime ≥ this ⇒ quotient ≤
    * Long.MaxValue; below it both engines clamp to Long.MaxValue, so
    * even a degenerate register table (which real data never produces —
    * the true minimum Σ over 4096 buckets at max rank is 4096, but an
    * adversarial hand-built frame could get close) cannot make Spark's
    * non-ANSI BIGINT wrap diverge from DuckDB's exact HUGEINT path. */
  val HllSPrimeSafeMin: BigInt = HllEstC / BigInt(Long.MaxValue) + 1

  /** Raw HLL estimate per shard from a register frame:
    * E = α·m² / Σ 2^-M[j], the sum scaled by 2^61 into exact integers
    * (empty buckets contribute 2^61 each). Output:
    * (shard, buckets_hit, s_prime DECIMAL(25,0), est_centi BIGINT) —
    * est_centi = floor(α·m²·2^61·100 / s_prime), the estimate in
    * CENTI-units, computed as pure integer division of [[HllEstC]] by
    * the register sum (est_centi/100.0 is the human number; see the
    * class doc for why no double ever touches the gated value).
    * DECIMAL widths are deliberate: s_hit ≤ 4096·2^60 < 10^22 fits
    * (25,0), and keeping operands narrow stays inside DuckDB's 38-digit
    * arithmetic (two (38,0) operands cannot even be added there).
    * s_prime is kept for [[hllCorrected]] and debugging; gated outputs
    * go through [[hllDistinct]], which drops it (a DECIMAL(25,0) wider
    * than BIGINT renders differently across the driver's compare —
    * see GateSchemaSpec). */
  def hllEstimate(registers: DataFrame): DataFrame = {
    val sHit = sum(expr("cast(shiftleft(cast(1 as bigint), 61 - max_rank) as decimal(25,0))"))
    registers.groupBy("shard")
      .agg(count(lit(1)).as("buckets_hit"), sHit.as("s_hit"))
      .withColumn("s_prime",
        (col("s_hit") +
          (lit(HllM) - col("buckets_hit")).cast(DecimalType(10, 0)) *
            lit(TwoPow61).cast(DecimalType(20, 0))).cast(DecimalType(25, 0)))
      // IntegralDivide on DECIMAL operands → BIGINT; both operands are
      // positive so trunc == floor on both engines. Clamped below the
      // safe s_prime bound so the quotient can never wrap (CaseWhen
      // branches evaluate lazily — the div is skipped when clamped).
      .withColumn("est_centi",
        when(col("s_prime") <
            lit(HllSPrimeSafeMin.toString).cast(DecimalType(25, 0)),
          lit(Long.MaxValue))
        .otherwise(expr(s"cast('$HllEstC' as decimal(38,0)) div s_prime")))
      .select("shard", "buckets_hit", "s_prime", "est_centi")
  }

  /** Per-shard + merged-ALL estimates in one frame — the gate shape:
    * three shard sketches, their merge, every number replayable.
    * Deliberately drops the intermediate s_prime: the gate hashes its
    * output against a DuckDB replay, and a 22-digit DECIMAL(25,0) is
    * the one dtype the two environments render differently (the r7/r8
    * red gate — values bit-matched, the column's textual form didn't).
    * The register artifact gate (hllRegisters) already certifies the
    * sums s_prime derives from. */
  def hllDistinct(df: DataFrame, value: Column, shard: Column): DataFrame = {
    val regs = hllRegisters(df, value, shard)
    hllEstimate(regs).unionByName(hllEstimate(hllMergedRegisters(regs)))
      .select("shard", "buckets_hit", "est_centi")
  }

  /** Sketch-only set algebra — the classic HLL trick that answers
    * corpus-diff questions ("how many NEW keys does crawl B add?",
    * "how big is the overlap?") from two KB-sized register artifacts
    * without touching either corpus: |A| and |B| come straight from
    * the merged registers, |A∪B| from their per-bucket max-merge (the
    * union sketch IS the merge — no data pass), and |A∩B| by
    * inclusion-exclusion, clamped at 0. Output: one (set_expr,
    * est_centi) row per measure, all four derived through the integer
    * [[hllEstimate]] path, so the gate hash-matches the DuckDB replay.
    * The pivot runs over THREE estimate rows — no driver math, no
    * collect. */
  /** One-pass convenience: build BOTH register sets from a single scan
    * of `df` — each row is tagged with every set it belongs to
    * (explode of the applicable membership tags), so the corpus is
    * read once however many sets overlap, then the algebra runs over
    * the ≤2×4096-row register table. This is the 100 TB shape: set
    * membership is a row predicate, and predicates don't deserve
    * separate scans. */
  def hllSetAlgebra(df: DataFrame, value: Column,
                    inA: Column, inB: Column): DataFrame = {
    val tagged = df.select(value.as("_v"),
        explode(array(when(inA, "A"), when(inB, "B"))).as("_tag"))
      .where(col("_tag").isNotNull)
    // checkpoint the COMBINED ≤2×4096-row register table here — one
    // action, one corpus scan; the per-set checkpoints inside the
    // register overload then re-materialize from this table, not from
    // the corpus
    val regs = hllRegisters(tagged, col("_v"), col("_tag"))
      .localCheckpoint(true)
    hllSetAlgebra(regs.where(col("shard") === "A"),
      regs.where(col("shard") === "B"))
  }

  def hllSetAlgebra(regA: DataFrame, regB: DataFrame): DataFrame = {
    def m(r: DataFrame, tag: String) =
      r.groupBy("bucket").agg(max("max_rank").as("max_rank"))
        .select(lit(tag).as("shard"), col("bucket"), col("max_rank"))
    // truncate the register lineages to their ≤4096-row results: the
    // union/estimate/pivot DAG below references each input several
    // times (u re-reads both; the intersection pivot re-reads the
    // estimates), and without this every reference re-pays the full
    // corpus scan behind the registers — for the one-pass overload
    // above both checkpoints materialize from the SAME single scan
    val a = m(regA, "A").localCheckpoint(true)
    val b = m(regB, "B").localCheckpoint(true)
    val u = m(a.unionByName(b), "A_union_B")
    val est = hllEstimate(a.unionByName(b).unionByName(u))
      .select(col("shard").as("set_expr"), col("est_centi"))
    val ix = est.agg(
      max(when(col("set_expr") === "A", col("est_centi"))).as("ea"),
      max(when(col("set_expr") === "B", col("est_centi"))).as("eb"),
      max(when(col("set_expr") === "A_union_B", col("est_centi"))).as("eu"))
      .select(lit("A_intersect_B").as("set_expr"),
        greatest(col("ea") + col("eb") - col("eu"), lit(0L)).as("est_centi"))
    est.unionByName(ix)
  }

  /** Bias-corrected estimate (driver-side scalar math over one gate
    * row): linear counting m·ln(m/V) below 2.5m when empty buckets
    * remain — the regime where the raw estimator is badly biased.
    * Uses `ln`, hence NOT in the oracle-hashed path (see class doc). */
  def hllCorrected(bucketsHit: Long, sPrime: BigDecimal): Double = {
    val s = sPrime.toDouble / TwoPow61.toDouble
    val raw = 0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM / s
    val empty = HllM - bucketsHit
    if (raw <= 2.5 * HllM && empty > 0)
      HllM * math.log(HllM.toDouble / empty)
    else raw
  }

  // ---------------------------------------------------------------- CMS

  /** depth×width = 4×1024 cells: overestimate ≤ 2N/w with prob
    * 1-(1/2)^4 per the CM bound — at N≈10^5 gate tokens that is a few
    * hundred, tight enough to rank hot tokens; width is the lever. */
  val CmsDepth = 4
  val CmsWidth = 1024

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .where(col("tok") =!= "")

  private def cmsCell(j: Column, tok: Column): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit(":"), tok)), 1, 8),
      16, 10).cast("long"), lit(CmsWidth))

  /** The CMS table itself: (j, cell, cnt) over the corpus token stream.
    * Additive under union (cells sum), so per-partition tables merge by
    * groupBy-sum — 4096 counters total, constant size at any corpus.
    * `j` is BIGINT to match the oracle's `range(4)` (dtype-sensitive
    * replicas compare schemas, not just values). */
  def cmsSketch(docs: DataFrame): DataFrame = {
    val rows = tokens(docs).select(
      posexplode(array((0 until CmsDepth).map(j => cmsCell(lit(j), col("tok"))): _*))
        .as(Seq("j", "cell")))
    rows.groupBy(col("j").cast("bigint").as("j"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  // ---------------------------------------------------------- Histogram

  /** Bin width for the quantile histogram: fixed-width (not log-scale)
    * because `log` is libm territory — not sworn bit-identical across
    * engines — while `floor(x / 64.0)` is one exact-rounded IEEE divide
    * (by a power of two, so in fact exact). Interpolation error is
    * bounded by the width; the lever is the width, and at 100 TB the
    * bin table is still only domain/width counters. Kept integral so
    * the quantile interpolation runs in pure integer arithmetic. */
  val HistWidth = 64.0
  private val HistW = 64L

  /** The quantile sketch artifact: per (shard, bin) counts — mergeable
    * by +, like every sketch here. One shuffle, counters only. */
  def histogram(df: DataFrame, value: Column, shard: Column): DataFrame =
    df.select(shard.cast("string").as("shard"),
      floor(value.cast("double") / lit(HistWidth)).cast("long").as("bin"))
      .groupBy("shard", "bin").agg(count(lit(1)).as("cnt"))

  /** Cross-shard merge: bins sum. */
  def histMerged(hist: DataFrame): DataFrame =
    hist.groupBy("bin").agg(sum("cnt").as("cnt"))
      .select(lit("ALL").as("shard"), col("bin"), col("cnt"))

  /** Interpolated quantile estimates from a histogram: walk the
    * cumulative bin counts to the first bin covering q·n, then linear-
    * interpolate inside it — in PURE INTEGER arithmetic. Quantiles are
    * integer per-cent (`q_pct` ∈ 50/90/99) and the estimate is emitted
    * in MICRO-units:
    *   est_micro = floor((bin·W·cnt·100 + W·(q_pct·n − 100·(cum−cnt)))
    *               · 10^6 / (100·cnt))
    * computed in DECIMAL (the pre-division numerator can pass 2^63),
    * so the gate hashes BIGINTs only — no `round(double, n)` for the
    * engines to disagree on (the r7 failure mode; see class doc).
    * est_micro/10^6 is the human number; the true quantile lies inside
    * the chosen bin ⇒ |est − exact| ≤ HistWidth by construction. The
    * windows run over the BIN table (domain/width rows), not the data. */
  def histQuantiles(hist: DataFrame,
                    qs: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byBin = Window.partitionBy("shard").orderBy("bin")
    val all = Window.partitionBy("shard")
    val cum = hist
      .withColumn("cum", sum("cnt").over(byBin))
      .withColumn("n", sum("cnt").over(all))
    // first bin whose cumulative count covers q·n (integer compare:
    // 100·cum ≥ q_pct·n); its predecessor has cum_before = cum - cnt
    // < q·n, so the interpoland is in (0, cnt]
    val picked = cum
      .crossJoin(hist.sparkSession.range(1)
        .select(explode(array(qs.map(lit): _*)).as("q_pct")))
      .where(col("cum") * 100 >= col("q_pct") * col("n"))
      .groupBy("shard", "q_pct").agg(min("bin").as("bin"))
    picked.join(cum, Seq("shard", "bin"))
      // numerator in DECIMAL before the 10^6 scale-up (bin·W·cnt·100
      // alone fits BIGINT to ~10^16-row shards; the ×10^6 would not);
      // IntegralDivide → BIGINT, operands positive so trunc == floor
      .withColumn("est_micro", expr(
        s"(cast(bin * $HistW * cnt * 100 + $HistW * (q_pct * n - 100 * (cum - cnt)) " +
          "as decimal(30,0)) * 1000000) div cast(100 * cnt as decimal(12,0))"))
      .select(col("shard"), col("q_pct"), col("n"), col("est_micro"))
  }

  // -------------------------------------------------------------- Bloom

  /** m=65536 bits, k=4 hashes: at n≈2500 corpus keys the load is
    * nk/m ≈ 0.15 → FP ≈ (1-e^-0.15)^4 < 0.1%; m is the lever. */
  val BloomBits = 65536
  val BloomK = 4

  /** 63 payload bits per word: bit 63 would make the mask negative,
    * and `1 << 63` is exactly where engines disagree about overflow —
    * one dead bit per word buys unconditional portability. */
  private val WordBits = 63

  private def bloomPos(j: Column, key: Column): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit(":"), key)), 1, 8),
      16, 10).cast("long"), lit(BloomBits))

  /** Membership sketch build: per (shard, word) OR of the k hash bits of
    * every key — the third mergeable sketch (cardinality / frequency /
    * membership), ~8 KB per shard at any corpus size. Duplicate keys
    * cost nothing (OR is idempotent), shards merge by [[bloomMerge]],
    * and the production read is "was this content hash ever admitted?"
    * without touching the standing corpus — no false negatives ever,
    * false positives bounded by the bit budget. */
  def bloomBuild(df: DataFrame, key: Column, shard: Column): DataFrame =
    df.select(shard.cast("string").as("shard"),
      explode(array((0 until BloomK).map(j => bloomPos(lit(j), key)): _*)).as("pos"))
      .select(col("shard"), expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(cast(1 as bigint), cast(pos % $WordBits as int))").as("mask"))
      .groupBy("shard", "word").agg(bit_or(col("mask")).as("bits"))

  /** Cross-shard merge: words combine by OR — associative, like the
    * HLL max-merge and the CMS cell sum. */
  def bloomMerge(bloom: DataFrame): DataFrame =
    bloom.groupBy("word").agg(bit_or(col("bits")).as("bits"))
      .select(lit("ALL").as("shard"), col("word"), col("bits"))

  /** Screen a probe set against a built filter: each probe's k bits are
    * tested via a broadcast join on word (the filter is ~1 K rows at
    * ANY corpus size); `maybe_seen` iff all k hit. Output is integers +
    * a boolean, so the gate hash-matches a full DuckDB replay including
    * the false positives (they are a deterministic function of the
    * hash choice, not noise). */
  def bloomScreen(bloom: DataFrame, df: DataFrame, id: Column,
                  key: Column): DataFrame = {
    val probes = df.select(id.as("probe_id"),
      posexplode(array((0 until BloomK).map(j => bloomPos(lit(j), key)): _*))
        .as(Seq("j", "pos")))
      .select(col("probe_id"), col("j"), expr(s"pos div $WordBits").as("word"),
        expr(s"shiftleft(cast(1 as bigint), cast(pos % $WordBits as int))").as("mask"))
    probes.join(broadcast(bloom.select("word", "bits")), Seq("word"), "left")
      .withColumn("hit",
        when(col("bits").isNotNull &&
          (col("bits").bitwiseAND(col("mask")) =!= 0), 1).otherwise(0))
      .groupBy("probe_id").agg(sum("hit").cast("long").as("hits"))
      .withColumn("maybe_seen", col("hits") === BloomK)
  }

  /** Heavy-hitter check: the top-k tokens by EXACT count, each with its
    * CMS point estimate (min over the depth rows). Every number is an
    * integer, so the gate hash-matches a full DuckDB replay, proving
    * both the sketch construction and the ≥-exact overestimate
    * property on real data. The sketch side is a broadcast (≤4096
    * rows); the exact side is one token shuffle — at 100 TB you keep
    * the sketch and drop the exact pass, same table shape. */
  def cmsTopK(docs: DataFrame, k: Int = 50): DataFrame = {
    val exact = tokens(docs).groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("tok").asc).limit(k)
    val probes = exact.select(col("tok"), col("exact_cnt"),
      posexplode(array((0 until CmsDepth).map(j => cmsCell(lit(j), col("tok"))): _*))
        .as(Seq("j", "cell")))
    probes.join(broadcast(cmsSketch(docs)), Seq("j", "cell"))
      .groupBy("tok", "exact_cnt").agg(min("cnt").as("cms_est"))
      .select(col("tok").as("token"), col("exact_cnt"), col("cms_est"))
  }
}
