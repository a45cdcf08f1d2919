package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents(doc_id, text, ...)` — the
  * LLM-training-pipeline extensions (north star in SURVEY §0(b); nothing
  * analogous exists in the reference, whose only dedup is keyed upsert).
  *
  * Every construction here is deterministic and reproducible in portable
  * SQL (md5 + string/array ops), so the DuckDB oracle can run the SAME
  * pipeline and the t2 gate hash-compares full result sets — no "trust
  * me" randomized sketches.
  *
  * 100 TB posture: everything is shuffle-on-key; candidate generation is
  * banded LSH (join on band key), NEVER an all-pairs cartesian. The only
  * per-doc state is a bounded shingle set / signature.
  */
object Dedup {

  /** (doc_id, shingle set) with the words array MATERIALIZED behind a
    * repartition boundary. Two reasons, both measured: (a) an inline
    * `split()` inside the transform lambda is re-evaluated per element
    * (CollapseProject inlines projections — O(len²) work per doc);
    * (b) small single-file tables arrive as one input split, so the
    * CPU-heavy shingling would run in a single task. The exchange fixes
    * both: split computes once per row, and downstream work spreads
    * across the cluster. */
  private[ops] def shingleSets(docs: DataFrame, n: Int): DataFrame = {
    val parts = docs.sparkSession.sparkContext.defaultParallelism
    val cnt = size(col("w")) - (n - 1)
    docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .repartition(parts)
      .select(col("doc_id"),
        when(cnt > lit(0),
          array_distinct(transform(sequence(lit(0), cnt - 1),
            i => concat_ws(" ", (0 until n).map(j => element_at(col("w"), i + j + 1)): _*))))
          .otherwise(array().cast("array<string>")).as("sh"))
  }

  /** Exact dedup: group by content hash, keep the smallest doc_id as the
    * canonical representative (hash-groupBy — one shuffle on md5(text),
    * the design that holds at any scale). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Carter-Wegman hash family base: the shingle's md5 split into two
    * 48-bit integer halves; h_j = (h1 + j·h2) mod P. One md5 per shingle
    * total (vs one per shingle PER hash function) — 48-bit halves keep
    * j·h2 inside BIGINT for any j ≤ ~32k, portable to plain SQL. */
  private[graft] val MinhashP = 1000000007L

  /** MinHash + banded LSH near-dup pairs with an exact n-gram Jaccard
    * confirmation on the candidates.
    *
    * shingle → k minhashes (Carter-Wegman over the shingle md5, min over
    * ints) → b bands of r rows; docs sharing a band key become
    * candidates (equi-join on the band key = the bucket-join; with
    * k=12, b=4, r=3 a 0.9-Jaccard pair is missed with probability
    * (1-0.9³)⁴ ≈ 5e-3, a 0.98 pair with ≈ 1.3e-5) → exact Jaccard on
    * candidate pairs only, threshold filter kills LSH false positives.
    *
    * Shape at scale: explode shingles → per-shingle hash ONCE → map-side
    * partial min-agg, one shuffle on doc_id → band explode → shuffle
    * equi-join on band key. No cartesian anywhere.
    */
  def minhashLsh(docs: DataFrame, numHashes: Int = 12, bands: Int = 4,
                 shingleLen: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sh = shingleSets(docs, shingleLen).where(size(col("sh")) > 0)

    val hashed = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), md5(col("s")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 12), 16, 10).cast("bigint").as("h1"),
        conv(substring(col("m"), 13, 12), 16, 10).cast("bigint").as("h2"))
    val sigAggs = (0 until numHashes).map { j =>
      min(pmod(col("h1") + lit(j.toLong) * col("h2"), lit(MinhashP))).as(s"g$j")
    }
    val sig = hashed.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)

    val bandKeys = (0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until r).map(i => col(s"g${b * r + i}").cast("string")) :+ lit(b.toString): _*))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))

    // Candidate pairs via group-by-band + in-bucket pair expansion: the
    // same candidate set as a band-key self-join, but the (md5+agg-heavy)
    // signature pipeline runs ONCE instead of once per join side. Bucket
    // cardinality is bounded by band selectivity; a pathological band
    // would need the standard cap — deliberately NOT applied silently
    // (results would diverge from the exhaustive oracle).
    val cand = banded.groupBy("bk")
      .agg(collect_set(col("doc_id")).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> " +
          "struct(a AS doc_a, b AS doc_b)))), p -> p.doc_a < p.doc_b)")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()

    val sa = sh.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val sb = sh.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The dedup RESULT: documents surviving near-dedup. Greedy keep rule:
    * a doc is dropped iff it appears as the larger id of a confirmed
    * near-dup pair — deterministic, one anti-join, and every dropped doc
    * has a kept (or transitively kept) near-duplicate with a smaller id. */
  def nearDedupKeep(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val drops = minhashLsh(docs, threshold = threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(drops, Seq("doc_id"), "left_anti").select("doc_id")
  }

  /** 32-bit SimHash over word tokens: bit j of a token is the high bit
    * of hex nibble j of its md5; the fingerprint bit is the sign of the
    * token-sum. Pure string/arith ops → identical in any engine. */
  def simhash(docs: DataFrame): DataFrame = {
    val parts = docs.sparkSession.sparkContext.defaultParallelism
    val words = docs
      .select(col("doc_id"), col("text"))
      .repartition(parts) // spread single-split sources before CPU-heavy explode+md5
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), md5(col("w")).as("h"))
    val bitSums = (0 until 32).map { j =>
      sum(when(conv(substring(col("h"), j + 1, 1), 16, 10).cast("int") >= 8,
        1).otherwise(-1)).as(s"b$j")
    }
    val fingerprint = (0 until 32)
      .map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    words.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fingerprint.as("simhash"))
  }

  /** SimHash near-dup pairs: candidates share either 16-bit half of the
    * fingerprint (a Hamming-aware band join — a pair within distance 6
    * whose differing bits straddle both halves can be missed, like any
    * banding; NO cartesian), confirmed by exact Hamming distance. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val fp = simhash(docs)
    val halves = fp.select(col("doc_id"), col("simhash"),
      explode(array(
        concat(lit("hi:"), shiftright(col("simhash"), 16).cast("string")),
        concat(lit("lo:"), (col("simhash").bitwiseAND(lit(65535L))).cast("string"))
      )).as("half"))
    val a = halves.as("a"); val b = halves.as("b")
    a.join(b, col("a.half") === col("b.half") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("bigint"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }
}
