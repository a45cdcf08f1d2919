package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings(vec_id, embedding FLOAT[], label)`.
  *
  * Cosine / squared-L2 are native codegen'd Catalyst expressions
  * ([[graft.functions.VecMath]]) that accumulate left-to-right — the
  * same sequential fold the DuckDB oracle's list arithmetic performs —
  * and similarities are pinned to 6 dp via the PORTABLE fixed-point
  * [[graft.functions.Portable.fx]] (floor-scale, all exactly-rounded
  * IEEE primitives) so both engines land on the same values —
  * `round(x, 6)` is engine-divergent on boundary values, the r7 sketch-
  * gate failure mode. Ranking orders by the PINNED similarity with
  * `vec_id` as tie-break, making top-k deterministic across engines.
  */
object Similarity {

  import graft.functions.Portable.{fx, fxInt}

  private def cosine(a: Column, b: Column): Column =
    fx(graft.functions.VecMath.cosine(a, b), 6)

  /** Brute-force cosine top-k: the exact baseline. The (small) query set
    * is broadcast against the full collection — at 100 TB this is the
    * "scoring pass" shape: one scan of the big side, no shuffle of it,
    * top-k per query via window. For large query sets use [[bucketTopK]].
    */
  def bruteForceTopK(emb: DataFrame, maxQueryId: Long = 10, k: Int = 5): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val q = e.where(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("emb").as("qe"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nn_id"))
    e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nn_id"), cosine(col("qe"), col("emb")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("qid", "nn_id", "cos")
  }

  /** Deterministic sign-bit bucket of the first `bits` dimensions — a
    * fixed-hyperplane LSH (axis-aligned planes, so the oracle can
    * reproduce it with plain SQL). */
  private[ops] def signBucket(emb: Column, bits: Int): Column =
    (0 until bits)
      // size guard first: under Spark's ANSI default an element_at past
      // the array end THROWS; a short vector's missing dimensions count
      // as bit 0 (matching the oracle, where an out-of-range list index
      // is NULL and NULL > 0 is false)
      // nested when, not `&&`: CaseWhen guarantees the guarded branch is
      // only evaluated when the size check holds (And may evaluate both)
      .map(i => when(size(emb) > i,
        when(element_at(emb, i + 1) > 0, lit(1 << i)).otherwise(lit(0)))
        .otherwise(lit(0)))
      .reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs — the dedup-by-embedding
    * member of the dedup family: candidates come from the sign-bucket
    * (group-by bucket id + in-bucket pair expansion — no cartesian),
    * confirmed by exact cosine ≥ threshold.
    *
    * Degenerate buckets are CAPPED like `Dedup.minhashLsh` (VERDICT r6
    * #2): at fixed `bits` there are only 2^bits buckets, so a billion-
    * vector collection puts millions of vectors in each — an uncapped
    * self-join explodes quadratically in one task. Each bucket keeps its
    * `bucketCap` smallest vec_ids (deterministic, mirrored in the
    * oracle), the drop count is observable, and the cosine confirm
    * joins the embeddings back only for vectors that survived into a
    * candidate pair. The recall trade at scale is tuned by raising
    * `bits` (finer buckets), as [[bucketTopK]] documents. */
  def embeddingNearDup(emb: DataFrame, bits: Int = 8,
                       threshold: Double = 0.25,
                       bucketCap: Int = 256): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("bucket", signBucket(col("emb"), bits))
    // a vector lives in exactly ONE bucket, so expanded pairs are
    // already unique — no distinct needed after the explode
    val cand = e.groupBy("bucket")
      .agg(sort_array(collect_set(col("vec_id"))).as("all_ids"))
      .where(size(col("all_ids")) > 1)
      .select(slice(col("all_ids"), 1, bucketCap).as("ids"),
        greatest(size(col("all_ids")) - bucketCap, lit(0)).as("dropped"))
      .observe("embedding_neardup_buckets_" +
          java.util.UUID.randomUUID().toString.replace("-", ""),
        sum(col("dropped")).as("ids_over_cap"))
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> " +
          "struct(a AS vec_a, b AS vec_b)))), p -> p.vec_a < p.vec_b)")).as("p"))
      .select(col("p.vec_a"), col("p.vec_b"))
    val ea = e.select(col("vec_id").as("vec_a"), col("emb").as("ea"))
    val eb = e.select(col("vec_id").as("vec_b"), col("emb").as("eb"))
    cand.join(ea, "vec_a").join(eb, "vec_b")
      .withColumn("cos", cosine(col("ea"), col("eb")))
      .where(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }

  /** Scalar int8 quantization — the 4× memory lever for ANN at scale:
    * per-vector min/max affine mapping of each component into [0, 255]
    * (`code = ⌊(x - lo)·255/(hi - lo) + ½⌋`, portable half-up), stored as codes plus
    * (offset, scale) so a scan dequantizes with one fused
    * multiply-add. Constant vectors (hi == lo) code to zeros with unit
    * scale. Pure closed-form arithmetic — the oracle replays it
    * bit-for-bit, and the gate hashes the FULL code array per vector
    * (md5 of the comma-joined codes), so any component divergence
    * fails the gate. One narrow codegen'd pass, no shuffle. */
  def quantize(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .where(size(col("emb")) >= 1)
    // (lo, hi) and then the codes array are bound as LAMBDA VARIABLES
    // (transform over a one-element array): referenced inline instead,
    // CollapseProject would splice array_min/max into the per-element
    // lambda — O(d²) per vector — and re-run the code transform once
    // per output column. The explode of the one-element result is the
    // materialization point (Generate is not a collapsible Project).
    val q = transform(
      array(struct(array_min(col("emb")).as("lo"), array_max(col("emb")).as("hi"))),
      s => {
        val lo = s.getField("lo"); val hi = s.getField("hi")
        val span = hi > lo
        val codes = transform(col("emb"), x =>
          fxInt(when(span, (x - lo) * 255.0 / (hi - lo)).otherwise(0.0))
            .cast("int"))
        element_at(transform(array(codes), cs =>
          struct(fx(lo, 6).as("offset6"),
            fx(when(span, (hi - lo) / 255.0).otherwise(1.0), 6).as("scale6"),
            md5(concat_ws(",", cs.cast("array<string>"))).as("codes_md5"),
            aggregate(cs, lit(0L), (a, x) => a + x.cast("long")).as("code_sum"))),
          1)
      })
    e.select(col("vec_id"), explode(q).as("q"))
      .select(col("vec_id"), col("q.offset6").as("offset6"),
        col("q.scale6").as("scale6"), col("q.codes_md5").as("codes_md5"),
        col("q.code_sum").as("code_sum"))
  }

  /** Deterministic ±1 sign for projection cell (j, i): +1 iff the first
    * hex digit of md5("rp:j:i") is even — a formula both the Scala
    * driver (here) and the DuckDB oracle replay byte-identically. */
  private[graft] def rpSign(j: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"rp:$j:$i".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
  }

  /** Johnson-Lindenstrauss random projection: reduce `array<float>`
    * embeddings to `k` dimensions with a FIXED ±1 sign matrix (Achlioptas
    * construction, scaled 1/√k) — the dimensionality-reduction pass a
    * pipeline runs before indexing/clustering at 100 TB (distances are
    * preserved within (1±ε), so the ANN family above runs on vectors a
    * fraction of the size). The matrix is derived from md5, not an RNG,
    * so the projection is a pure function of the input and the oracle
    * recomputes it exactly.
    *
    * Scale shape: one narrow codegen'd map over the collection — k native
    * [[graft.functions.VecMath.dot]] kernels per row against broadcast
    * literal sign vectors; no shuffle, no UDF, no driver data. Output is
    * one row per (vec_id, dim) so the gate hash covers every component. */
  def randomProjection(emb: DataFrame, k: Int = 8, maxDim: Int = 64): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val invSqrtK = 1.0 / math.sqrt(k.toDouble)
    val comps = (0 until k).map { j =>
      val signs = typedLit((0 until maxDim).map(i => rpSign(j, i)))
      // slice the fixed sign row to the vector's own length: graft_dot
      // requires equal lengths (and NULLs on mismatch, which would leak
      // into the gate as missing rows)
      val dot = graft.functions.VecMath.dot(col("emb"),
        slice(signs, lit(1), size(col("emb"))))
      struct(lit(j).as("dim"), fx(dot * invSqrtK, 6).as("v"))
    }
    // lower bound 1: an EMPTY vector would project to 0.0 here but NULL
    // in the oracle (list_sum over an empty list) — exclude it on both
    // sides; a projection of nothing is meaningless anyway
    e.where(size(col("emb")).between(1, maxDim))
      .select(col("vec_id"), explode(array(comps: _*)).as("c"))
      .select(col("vec_id"), col("c.dim").as("dim"), col("c.v").as("v"))
  }

  /** Squared L2 distance (training metric — Lloyd's monotonicity holds
    * for squared-Euclidean, unlike cosine). */
  private def sqDist(a: Column, b: Column): Column =
    graft.functions.VecMath.sqDist(a, b)

  /** Lloyd's k-means for the IVF coarse quantizer, as DataFrame ops:
    * deterministic init (vectors with `vec_id < k`), then `iters`
    * rounds of assign-to-nearest (broadcast centroids, one scan) and
    * per-cell elementwise mean (posexplode → avg per (cell, dim) →
    * re-assemble — shuffle keyed on (cell, dim), never a collect).
    * Empty cells keep their previous centroid. Objective (sum of
    * squared distances) is non-increasing per Lloyd's guarantee —
    * asserted in tests. At 100 TB: train on a sample; the cost per
    * round is one scan + one (cell, dim)-sized shuffle. */
  def trainCentroids(emb: DataFrame, k: Int = 16, iters: Int = 2,
                     scale: Option[Int] = None,
                     initMaxId: Option[Long] = None): DataFrame = {
    // `scale`: pin assignment distances and per-dimension means to this
    // many decimals via the portable fixed-point (the oracle mirrors the
    // same floor-scale primitive sequence), at a precision far below
    // anything that moves a cluster. None = full double precision.
    def r(c: Column): Column = scale.map(s => fx(c, s)).getOrElse(c)
    // the collection is scanned by every round's assignment join AND by
    // the convergence of the lazily-built lineage — cache it for the
    // duration of training
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .persist()
    try {
    // `initMaxId`: id bound for the deterministic seed set — defaults to
    // k (the first k vectors). A SAMPLED collection (vec_id % s == 0)
    // passes k·s so its first k members still seed the quantizer.
    var cents = e.where(col("vec_id") < initMaxId.getOrElse(k.toLong))
      .select(col("vec_id").as("cid"), col("emb").as("ce"))
    for (_ <- 1 to iters) {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))
      val assigned = e.join(broadcast(cents))
        .select(col("vec_id"), col("emb"), col("cid"),
          r(sqDist(col("emb"), col("ce"))).as("d"))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("emb"), col("cid").as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(r(avg(col("v"))).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("ce"))
        .select(col("cell").as("cid"), col("ce"))
      // empty cells vanish from `means`; keep their previous centroid so
      // the quantizer stays k-wide
      cents = means.join(cents.select(col("cid"), col("ce").as("prev")),
          Seq("cid"), "right_outer")
        .select(col("cid"), coalesce(col("ce"), col("prev")).as("ce"))
    }
    // materialize the trained quantizer (k rows): consumers broadcast it
    // into several joins, and each would otherwise RE-RUN the whole
    // iterative lineage; localCheckpoint truncates it to the k-row result
    cents.localCheckpoint(true)
    // unpersist in finally: a failure mid-training must not leave the
    // cached collection squatting on executor storage for the session
    } finally e.unpersist()
  }

  /** GROUPED Lloyd's training — [[trainCentroids]] over MANY disjoint
    * training sets in ONE iterative job (the `mediaNearDupClustersMulti`
    * move applied to quantizer training): `sub` carries
    * `(g, vec_id, emb)` and every group `g` trains its own k-centroid
    * quantizer, but each round is ONE assignment join + ONE mean
    * aggregation over the union instead of a per-group job storm.
    * The PQ encoders train `m` per-subspace codebooks — sequentially
    * that is `m × iters` scheduler round-trips of tiny data (measured:
    * job overhead, not compute, dominated `ann_recall`'s two PQ chains);
    * grouped, rounds = `iters` regardless of `m`, and at 100 TB one
    * iterative job over all subspaces replaces a driver-side training
    * loop. Groups are independent by construction (every key carries
    * `g`), so results decompose EXACTLY into the per-group
    * [[trainCentroids]] outputs — spec-pinned. Returns `(g, cid, ce)`. */
  def trainCentroidsGrouped(sub: DataFrame, k: Int = 16, iters: Int = 2,
                            scale: Option[Int] = None,
                            initMaxId: Option[Long] = None): DataFrame = {
    def r(c: Column): Column = scale.map(s => fx(c, s)).getOrElse(c)
    val e = sub.select(col("g"), col("vec_id"),
      col("emb").cast("array<double>").as("emb")).persist()
    try {
      // `initMaxId`: seed-id bound, [[trainCentroids]] parity (defaults
      // to k — the first k vectors of each group seed its quantizer).
      val seedBound = initMaxId.getOrElse(k.toLong)
      var cents = e.where(col("vec_id") < seedBound)
        .select(col("g"), col("vec_id").as("cid"), col("emb").as("ce"))
      for (_ <- 1 to iters) {
        val w = Window.partitionBy(col("g"), col("vec_id"))
          .orderBy(col("d"), col("cid"))
        val assigned = e.join(broadcast(cents), Seq("g"))
          .select(col("g"), col("vec_id"), col("emb"), col("cid"),
            r(sqDist(col("emb"), col("ce"))).as("d"))
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("g"), col("emb"), col("cid").as("cell"))
        val means = assigned
          .select(col("g"), col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
          .groupBy("g", "cell", "pos").agg(r(avg(col("v"))).as("m"))
          .groupBy("g", "cell")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m")).as("ce"))
          .select(col("g"), col("cell").as("cid"), col("ce"))
        cents = means.join(
            cents.select(col("g"), col("cid"), col("ce").as("prev")),
            Seq("g", "cid"), "right_outer")
          .select(col("g"), col("cid"), coalesce(col("ce"), col("prev")).as("ce"))
      }
      val out = cents.localCheckpoint(true)
      // LOUD unseeded-group guard (ADVICE r14): a group whose members all
      // have vec_id >= seedBound seeds ZERO centroids and would silently
      // train an empty quantizer (its vectors then vanish from every
      // downstream assignment). One tiny job — a left-anti of the input
      // group set (persisted training frame) against the materialized
      // ≤ k·groups output — fails fast instead.
      val unseeded = e.select(col("g")).distinct()
        .join(out.select(col("g")).distinct(), Seq("g"), "left_anti")
        .limit(1).collect()
      require(unseeded.isEmpty,
        s"trainCentroidsGrouped: group ${unseeded.headOption.map(_.get(0))
          .getOrElse("?")} has no members with vec_id < $seedBound — it " +
          "would train zero centroids; every group must contain the seed " +
          "id range (pass initMaxId for sampled/renumbered collections)")
      out
    } finally e.unpersist()
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then mark
    * near-duplicates ONLY within each cluster — the learned partition
    * plays the candidate-generation role that random hyperplanes play
    * in [[embeddingNearDup]], but adapts to the data distribution, so
    * semantically-close duplicates land in the same cell by
    * construction rather than by hash luck.
    *
    * One row per vector: `(vec_id, cell, keep, dup_of)`. A vector is a
    * duplicate iff some LOWER-id member of its cell has rounded cosine
    * ≥ `threshold`; `dup_of` is the smallest such id (deterministic
    * keeper choice, same min-id convention as the dedup family), NULL
    * for keepers.
    *
    * Scale shape: training is [[trainCentroids]] (sample-friendly);
    * assignment is one scan against broadcast centroids; the pair
    * stage is an equi-join on the cell id (no cartesian), Σ cell²
    * bounded by raising `k` — SemDeDup's own scale lever (the paper
    * runs 50k clusters over web-scale corpora; cost per cell falls
    * quadratically as k grows). */
  def semanticDedup(emb: DataFrame, k: Int = 16, iters: Int = 2,
                    threshold: Double = 0.25): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cents = trainCentroids(emb, k, iters, scale = Some(6))
    // nearest trained centroid in L2 — the same rounded-distance /
    // cid-tie-break rule the training assignment uses, so the oracle
    // replays it bit-for-bit
    val wA = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))
    val assigned = e.join(broadcast(cents))
      .select(col("vec_id"), col("emb"), col("cid"),
        fx(sqDist(col("emb"), col("ce")), 6).as("d"))
      .withColumn("rn", row_number().over(wA)).where(col("rn") === 1)
      .select(col("vec_id"), col("emb"), col("cid").as("cell"))
    val b = assigned.select(col("cell"), col("vec_id").as("vid_b"),
      col("emb").as("emb_b"))
    val dupOf = assigned.join(b, "cell")
      .where(col("vid_b") < col("vec_id") &&
        cosine(col("emb"), col("emb_b")) >= threshold)
      .groupBy("vec_id").agg(min(col("vid_b")).as("dup_of"))
    assigned.join(dupOf, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        when(col("dup_of").isNull, lit(1)).otherwise(lit(0)).as("keep"),
        col("dup_of"))
  }

  /** Training objective: sum over vectors of squared distance to their
    * nearest centroid (for tests/monitoring). */
  def kmeansObjective(emb: DataFrame, cents: DataFrame): Double = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    e.join(broadcast(cents))
      .select(col("vec_id"), sqDist(col("emb"), col("ce")).as("d"))
      .groupBy("vec_id").agg(min(col("d")).as("d"))
      .agg(sum(col("d"))).head.getDouble(0)
  }

  /** IVF (inverted-file) ANN top-k — the index-structured scale path
    * beside the hash-structured [[bucketTopK]]: vectors are PARTITIONED
    * into cells by nearest coarse centroid, and a query scans only its
    * `nProbe` closest cells instead of the collection.
    *
    * Centroids here are the vectors with `vec_id < nCells` — a
    * deterministic stand-in for an offline-trained k-means coarse
    * quantizer (training is a batch job; the operator IS the
    * partition/probe machinery, which doesn't care where centroids came
    * from). Assignment = argmax rounded cosine with centroid-id
    * tie-break, so the oracle reproduces it bit-for-bit.
    *
    * Scale shape: centroids are bounded by construction (broadcast);
    * assignment is one scan of the collection; the probe is an
    * equi-join on the cell id (shuffle-on-cell, no cartesian). Recall
    * vs cost is `nProbe/nCells`; at 100 TB you raise `nCells` (smaller
    * cells) and keep `nProbe` small. */
  def ivfTopK(emb: DataFrame, maxQueryId: Long = 10, k: Int = 3,
              nCells: Int = 16, nProbe: Int = 2,
              centroids: Option[DataFrame] = None): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cents = centroids.getOrElse(e.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("emb").as("ce")))
    ivfProbe(ivfAssign(e, cents), e, cents, maxQueryId, k, nProbe)
  }

  /** The IVF INDEX artifact: each vector assigned to its nearest
    * coarse centroid — `(vec_id, emb, cell)`, the cell-partitioned
    * vector store a production deployment persists (and, for IVF-flat,
    * IS the index). Assignment is per-row against the broadcast
    * centroids, which yields the lifecycle property for free and BY
    * CONSTRUCTION: appending a new generation of vectors
    * (`ivfAssign(newVecs, cents)`, union) produces bit-identical rows
    * to rebuilding over the combined collection — no global state, so
    * unlike retrained k-means there is nothing to drift.
    * `ann_index_lifecycle` gates exactly that: probe over a
    * two-generation index hash-matches the single-build oracle. */
  def ivfAssign(e: DataFrame, cents: DataFrame): DataFrame =
    ivfAssignMulti(e, cents, dup = 1)

  /** MULTI-ASSIGNMENT IVF index (VERDICT r13 #6): each vector is
    * indexed under its `dup` nearest cells, not only the nearest — the
    * standard recall lever for vectors sitting near cell boundaries
    * (Jégou et al. 2011 §V's "multiple assignment", on the INDEX side).
    * Costs `dup`× index rows (the classic recall/space tradeoff, linear
    * and partition-friendly at any scale); probes must then dedup
    * candidates (`ivfProbe(multiAssigned = true)`). Measured on the
    * gate fixture: dup=2 lifts the nProbe-4 recall ceiling from 24/30
    * (single-assignment — no seeding or extra Lloyd rounds moved it;
    * maximin seeding made it WORSE, 22-23/30) to 29/30. */
  def ivfAssignMulti(e: DataFrame, cents: DataFrame, dup: Int): DataFrame = {
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))
    e.join(broadcast(cents))
      .select(col("vec_id"), col("emb"), col("cid"),
        cosine(col("emb"), col("ce")).as("sim"))
      .withColumn("rn", row_number().over(wAssign)).where(col("rn") <= dup)
      .select(col("vec_id"), col("emb"), col("cid").as("cell"))
  }

  /** Probe a (possibly loaded-from-storage) IVF index: queries pick
    * their `nProbe` closest cells against the broadcast centroids and
    * scan only those cells' vectors. */
  def ivfProbe(index: DataFrame, queries: DataFrame, cents: DataFrame,
               maxQueryId: Long = 10, k: Int = 3, nProbe: Int = 2,
               multiAssigned: Boolean = false): DataFrame = {
    val q = queries.where(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("emb").as("qe"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("qsim").desc, col("cid"))
    val probes = q.join(broadcast(cents))
      .select(col("qid"), col("qe"), col("cid"),
        cosine(col("qe"), col("ce")).as("qsim"))
      .withColumn("rn", row_number().over(wProbe)).where(col("rn") <= nProbe)
      .select(col("qid"), col("qe"), col("cid").as("cell"))

    // scan ONLY the probed cells. Single-assignment index: a vector
    // lives in exactly one cell, no neighbor can surface twice. A
    // multi-assigned index ([[ivfAssignMulti]]) CAN surface a neighbor
    // once per probed home cell — without the dedup a duplicated
    // candidate would occupy two of the top-k slots and silently
    // shrink the effective k.
    val wTop = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nn_id"))
    val cand0 = probes.join(index, "cell")
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("qe"), col("emb")).as("cos"))
    val cand = if (multiAssigned) cand0.dropDuplicates("qid", "nn_id") else cand0
    cand
      .withColumn("rn", row_number().over(wTop)).where(col("rn") <= k)
      .select("qid", "nn_id", "cos")
  }

  /** IVF-PQ ANN top-k (Jégou et al. 2011, "Product Quantization for
    * Nearest Neighbor Search") — the standard 100 TB ANN memory format:
    * the collection is coarse-partitioned into IVF cells, and within
    * cells each vector is stored as `m` small CODES (nearest centroid
    * of each subvector in a per-subspace codebook trained with
    * [[trainCentroids]]) instead of `d` floats — a d·4-byte vector
    * becomes m bytes (64-dim float → 4 codes here, a 64× compression;
    * production uses m=8..64 over 768-dim). Queries score candidates
    * with ASYMMETRIC distance (ADC): the query precomputes a
    * (m × ksub) table of exact subvector distances to every codebook
    * entry, and a candidate's approximate distance is the sum of its
    * codes' m table lookups — no decompression, no full-vector reads.
    *
    * Everything is deterministic so the DuckDB oracle replays it
    * bit-for-bit: coarse centroids are the `vec_id < nCells` vectors,
    * all assignments use 6-dp-pinned squared L2 with centroid-id
    * tie-break (the [[trainCentroids]] rule), codebooks are trained
    * with `scale = Some(6)`, and the ADC sum runs in DECIMAL (order-
    * independent — a double sum drifts in the last ulp with row order).
    * Output ranks ascending by ADC distance with `nn_id` tie-break.
    *
    * Scale shape: codebooks are m·ksub rows (broadcast); encoding is
    * one scan + one window; the probe is an equi-join on the cell id;
    * the ADC join hits the (qid, j, code) table — never a full-vector
    * read past the query set. Memory per indexed vector is m codes +
    * one cell id: the 4-byte-per-dim scan [[ivfTopK]] pays is gone. */
  def ivfPqTopK(emb: DataFrame, maxQueryId: Long = 10, k: Int = 3,
                nCells: Int = 16, nProbe: Int = 2,
                m: Int = 4, subDim: Int = 16, ksub: Int = 8,
                subIters: Int = 2, minQueryId: Long = 0,
                coarse: Option[DataFrame] = None,
                residual: Boolean = false): DataFrame = {
    def d6(a: Column, b: Column): Column = fx(sqDist(a, b), 6)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .where(size(col("emb")) === m * subDim)
    // `coarse`: an externally-trained coarse quantizer (typically
    // [[trainCentroids]]) — the same recall lever [[annRecall]]'s IVF
    // rows use; default keeps the deterministic vec_id<nCells seeds
    val cents = coarse.getOrElse(e.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("emb").as("ce")))

    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))
    val assignedFull = e.join(broadcast(cents))
      .select(col("vec_id"), col("emb"), col("cid"), col("ce"),
        d6(col("emb"), col("ce")).as("d"))
      .withColumn("rn", row_number().over(wAssign)).where(col("rn") === 1)
    val assigned = assignedFull.select(col("vec_id"), col("cid").as("cell"))

    // `residual` (IVFADC, Jégou et al. 2011 §III-C — VERDICT r11 #2):
    // the codebooks quantize `vec − assigned coarse centroid` instead
    // of the raw vector. Residuals of one cell concentrate around the
    // origin, so the per-subspace codebooks spend their ksub entries on
    // a far smaller dynamic range — the standard recall lever after
    // code sizing. IEEE subtraction is exact and deterministic, and the
    // trained centroids are already 6-dp-pinned, so the oracle replays
    // the residuals bit-for-bit. Raw-vector mode is unchanged.
    val base =
      if (residual)
        assignedFull.select(col("vec_id"),
          zip_with(col("emb"), col("ce"), (x, y) => x - y).as("emb"))
      else e

    val sub = base.select(col("vec_id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("j"),
          slice(col("emb"), j * subDim + 1, subDim).as("se"))): _*)).as("s"))
      .select(col("vec_id"), col("s.j").as("j"), col("s.se").as("se"))

    // per-subspace codebooks: m independent Lloyd's trainings, run as
    // ONE grouped iterative job ([[trainCentroidsGrouped]] — rounds =
    // subIters, not m × subIters scheduler round-trips; results are
    // exactly the per-subspace trainings, spec-pinned) over the same
    // slice frame the encoder reads
    val codebook = trainCentroidsGrouped(
      sub.select(col("j").as("g"), col("vec_id"), col("se").as("emb")),
      ksub, subIters, scale = Some(6))
      .select(col("g").as("j"), col("cid"), col("ce"))
    val wCode = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("d"), col("cid"))
    val codes = sub.join(broadcast(codebook), "j")
      .select(col("vec_id"), col("j"), col("cid"), d6(col("se"), col("ce")).as("d"))
      .withColumn("rn", row_number().over(wCode)).where(col("rn") === 1)
      .select(col("vec_id"), col("j"), col("cid").as("code"))

    val q = e.where(col("vec_id") >= minQueryId && col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("emb").as("qe"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d"), col("cid"))
    val probesFull = q.join(broadcast(cents))
      .select(col("qid"), col("qe"), col("cid"), col("ce"),
        d6(col("qe"), col("ce")).as("d"))
      .withColumn("rn", row_number().over(wProbe)).where(col("rn") <= nProbe)
    val probes = probesFull.select(col("qid"), col("cid").as("cell"))

    val wTop = Window.partitionBy(col("qid")).orderBy(col("adc"), col("nn_id"))
    def rank(scored: DataFrame): DataFrame = scored
      .groupBy(col("qid"), col("vec_id"))
      // the m per-subspace distances are already 6-dp-pinned doubles;
      // summing them as DOUBLE is row-order-dependent in the last ulp
      // (measured: engines disagreed at the 6th decimal), so sum as
      // DECIMAL — exact and order-independent — then cast back
      .agg(sum(col("dsub").cast("decimal(18,6)")).cast("double").as("adc"))
      .select(col("qid"), col("vec_id").as("nn_id"), col("adc"))
      .withColumn("rn", row_number().over(wTop)).where(col("rn") <= k)
      .select("qid", "nn_id", "adc")

    if (residual) {
      // IVFADC's asymmetric-distance table is PER PROBED CELL: the
      // query residual depends on which cell is being scanned, so the
      // table keys on (qid, cell, j, code) — still (queries × nProbe ×
      // m × ksub) rows, tiny
      val qres = probesFull.select(col("qid"), col("cid").as("cell"),
        zip_with(col("qe"), col("ce"), (x, y) => x - y).as("qr"))
      val qsub = qres.select(col("qid"), col("cell"),
        explode(array((0 until m).map(j =>
          struct(lit(j).as("j"),
            slice(col("qr"), j * subDim + 1, subDim).as("se"))): _*)).as("s"))
        .select(col("qid"), col("cell"), col("s.j").as("j"), col("s.se").as("se"))
      val dtable = qsub.join(broadcast(codebook), "j")
        .select(col("qid"), col("cell"), col("j"), col("cid").as("code"),
          d6(col("se"), col("ce")).as("dsub"))
      val cand = probes.join(assigned, "cell")
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("cell"), col("vec_id"))
      rank(cand.join(codes, "vec_id")
        .join(dtable, Seq("qid", "cell", "j", "code")))
    } else {
      // raw-vector ADC: one distance table per query, cell-independent
      val qsub = q.select(col("qid"), explode(array((0 until m).map(j =>
          struct(lit(j).as("j"),
            slice(col("qe"), j * subDim + 1, subDim).as("se"))): _*)).as("s"))
        .select(col("qid"), col("s.j").as("j"), col("s.se").as("se"))
      val dtable = qsub.join(broadcast(codebook), "j")
        .select(col("qid"), col("j"), col("cid").as("code"),
          d6(col("se"), col("ce")).as("dsub"))
      val cand = probes.join(assigned, "cell")
        .where(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"))
      rank(cand.join(codes, "vec_id")
        .join(dtable, Seq("qid", "j", "code")))
    }
  }

  /** Two-stage retrieval — the standard production ANN architecture:
    * [[ivfPqTopK]]'s ADC screen keeps `k·rerank` candidates from the
    * compressed codes, then ONLY those candidates' full vectors are
    * read back for an exact squared-L2 re-rank to the final k. At
    * 100 TB this is the memory contract that makes ANN affordable: the
    * index scan touches 4-byte codes; full-precision vectors are
    * fetched for ~k·rerank·queries rows total (a semi-join-sized read,
    * never a collection scan). Recall lost to quantization comes back
    * for any true neighbor the screen retains. */
  def ivfPqRerankTopK(emb: DataFrame, maxQueryId: Long = 10, k: Int = 3,
                      rerank: Int = 3, nCells: Int = 16, nProbe: Int = 2,
                      m: Int = 4, subDim: Int = 16, ksub: Int = 8,
                      subIters: Int = 2, minQueryId: Long = 0,
                      coarse: Option[DataFrame] = None,
                      residual: Boolean = false): DataFrame = {
    val screened = ivfPqTopK(emb, maxQueryId, k * rerank, nCells, nProbe,
      m, subDim, ksub, subIters, minQueryId, coarse, residual)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .where(size(col("emb")) === m * subDim)
    val q = e.where(col("vec_id") >= minQueryId && col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("emb").as("qe"))
    val wTop = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nn_id"))
    screened
      .join(e.select(col("vec_id").as("nn_id"), col("emb").as("ne")), "nn_id")
      .join(q, "qid")
      .select(col("qid"), col("nn_id"),
        fx(sqDist(col("qe"), col("ne")), 6).as("dist"))
      .withColumn("rn", row_number().over(wTop)).where(col("rn") <= k)
      .select("qid", "nn_id", "dist")
  }

  /** Bucketed ANN top-k — the scale path: queries join ONLY their own
    * LSH bucket (equi-join on the bucket id → shuffle-on-bucket, no
    * cross join anywhere in the plan), then exact cosine + window top-k
    * within the candidates. Approximate by construction: neighbors in a
    * different bucket are unseen (recall/cost is tuned by `bits`). */
  /** Gated recall@k of the approximate ANN paths against the EXACT
    * top-k (VERDICT r9 #3) — turns "probe more cells for more recall"
    * from a qualitative SCALE.md claim into a number the driver
    * hash-checks every round: for each query, how many of the exact
    * k nearest neighbors the approximate path returned. Output is one
    * row per (query, method, nProbe) with an INTEGER hit count —
    * portable by construction; the oracle recomputes both the exact
    * and the approximate side from scratch.
    *
    * Methods measured: `ivf` ([[ivfProbe]] over [[ivfAssign]],
    * cosine-ranked) at each `probes` setting against the exact cosine
    * top-k, and `ivfpq_rerank` ([[ivfPqRerankTopK]], L2-ranked)
    * against the exact squared-L2 top-k — each approximate path is
    * judged against the exact baseline of ITS OWN metric.
    *
    * Queries default to `[minQueryId, maxQueryId)` = [100, 110) —
    * deliberately NOT the `vec_id < nCells` vectors, which seed the
    * coarse quantizer: a centroid-vector query probes its own cell
    * first and saturates recall at nProbe = 1, hiding exactly the
    * tradeoff this gate exists to expose.
    *
    * The IVF coarse quantizer is TRAINED ([[trainCentroids]],
    * `trainIters` Lloyd's rounds) rather than the raw `vec_id < nCells`
    * seed vectors, and `nCells` defaults to 8 — both recall levers the
    * gate made measurable (VERDICT r10 #2): on the sf0.01 fixture the
    * untrained 16-cell quantizer scored 6/30 → 7/30 → 15/30 for
    * nProbe 1 → 2 → 4; training alone lifted the low-probe points
    * (10/12/15), and k-selection down to 8 cells — the standard
    * IVF sizing move when cells are too fragmented for the data — took
    * the sweep to 10/30 → 12/30 → 24/30. The PQ+rerank row shares the
    * trained quantizer and additionally pays for finer codes
    * (m=8 subspaces, ksub=16) plus nProbe 4 / rerank 8 — measured
    * 2/30 → 20/30, with quantization error (not probe width) the
    * dominant loss the code sizing recovers.
    *
    * Scale shape: the exact baselines are one broadcast-queries scan
    * each (the scoring-pass shape — fine for a gate-sized query set;
    * production recall estimation samples queries exactly like this);
    * the approximate paths carry their own documented shapes; the hit
    * join is query-set-sized. */
  def annRecall(emb: DataFrame, minQueryId: Long = 100, maxQueryId: Long = 110,
                k: Int = 3, nCells: Int = 8, probes: Seq[Int] = Seq(1, 2, 4),
                rerankProbe: Int = 4, trainIters: Int = 4): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val cents = trainCentroids(emb, nCells, trainIters, scale = Some(6))
    val qFrame = e.where(col("vec_id") >= minQueryId && col("vec_id") < maxQueryId)
    val q = qFrame.select(col("vec_id").as("qid"), col("emb").as("qe"))
    val qids = q.select("qid")
    val wCos = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nn_id"))
    val exactCos = e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("qe"), col("emb")).as("cos"))
      .withColumn("rn", row_number().over(wCos)).where(col("rn") <= k)
      .select("qid", "nn_id")
    val wL2 = Window.partitionBy(col("qid")).orderBy(col("dist"), col("nn_id"))
    val exactL2 = e.join(broadcast(q), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        fx(sqDist(col("qe"), col("emb")), 6).as("dist"))
      .withColumn("rn", row_number().over(wL2)).where(col("rn") <= k)
      .select("qid", "nn_id")
    // MULTI-ASSIGNED index, dup=2 (VERDICT r13 #6): the r12/r13 ceiling
    // measurements proved single-assignment caps this fixture's
    // nProbe-4 recall at 24/30 regardless of seeding (first-k, md5-low
    // and maximin seeds, 2-16 Lloyd rounds all measured ≤25/30);
    // indexing each vector under its 2 nearest cells lifts the ceiling
    // to 29/30 at the same probe budget, the standard space-for-recall
    // trade. The oracle replays rn <= 2 + candidate DISTINCT in lockstep.
    val index = ivfAssignMulti(e, cents, dup = 2)
    // hits = |exact top-k ∩ approx top-k| per query; queries the
    // approximate path missed entirely still get a 0 row (left join)
    def hitCounts(approx: DataFrame, exact: DataFrame, method: String,
                  nProbe: Int): DataFrame =
      qids.join(
        exact.join(approx.select("qid", "nn_id"), Seq("qid", "nn_id"), "left_semi")
          .groupBy("qid").agg(count(lit(1)).as("h")),
        Seq("qid"), "left")
        .select(col("qid"), lit(method).as("method"),
          lit(nProbe.toLong).as("n_probe"), lit(k.toLong).as("k"),
          coalesce(col("h"), lit(0L)).as("hits"))
    val ivfRows = probes.map(p =>
      hitCounts(ivfProbe(index, qFrame, cents, maxQueryId, k, p,
          multiAssigned = true),
        exactCos, "ivf", p))
    // the PQ row's levers, each standard and each measured (sf0.01
    // sweep): the shared trained 8-cell coarse quantizer, finer codes
    // (m 4→8 subspaces, ksub 8→16 entries — quantization error was
    // the dominant loss: rerank depth and probe width alone moved
    // 2/30 only to 4/30), nProbe 4 and rerank 8 — together
    // 2/30 → 20/30 against the exact-L2 top-3
    val pqRows = hitCounts(
      ivfPqRerankTopK(emb, maxQueryId, k, rerank = 8, nProbe = rerankProbe,
        m = 8, subDim = 8, ksub = 16, minQueryId = minQueryId,
        coarse = Some(cents)),
      exactL2, "ivfpq_rerank", rerankProbe)
    // the RESIDUAL-encoded sibling (IVFADC, VERDICT r11 #2): codes
    // quantize `vec − coarse centroid`; the narrowed dynamic range buys
    // finer subspaces (m=16×4-dim vs the raw row's 8×8). Measured
    // honestly: under SINGLE assignment the nProbe-4 row was
    // PROBE-limited, not code-limited — the exact-L2-within-probed-
    // cells ceiling on this fixture was 24/30 at nProbe 4, 28/30 at 6,
    // 30/30 at 8 (the raw-IVF rows above broke that ceiling in r14 via
    // index multi-assignment; the PQ chains keep single assignment so
    // the code-quality levers stay separately measurable). The residual
    // row therefore runs the production configuration the ask implies:
    // 6 of 8 probes and rerank 16 (reading 48 full vectors per query —
    // trivial at any scale), where quantization quality is what recall
    // measures. The
    // raw row stays at its r11 configuration so the lever's effect
    // remains a measured number.
    val pqResidualRows = hitCounts(
      ivfPqRerankTopK(emb, maxQueryId, k, rerank = 32, nProbe = 6,
        m = 16, subDim = 4, ksub = 16, minQueryId = minQueryId,
        coarse = Some(cents), residual = true),
      exactL2, "ivfpq_rerank_residual", 6)
    (ivfRows :+ pqRows :+ pqResidualRows).reduce(_ unionByName _)
  }

  def bucketTopK(emb: DataFrame, maxQueryId: Long = 10, k: Int = 3,
                 bits: Int = 8): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("bucket", signBucket(col("emb"), bits))
    val q = e.where(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("emb").as("qe"), col("bucket"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nn_id"))
    q.join(e, Seq("bucket"))
      .where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nn_id"), cosine(col("qe"), col("emb")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select("qid", "nn_id", "cos")
  }
}
