package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for write-time clustering — the piece that
  * makes a 100 TB table CHEAP to read later. A single-column sort gives
  * parquet min/max file stats on that column only; interleaving the bits
  * of two quantized dimensions (Morton / Z-order) gives every file a
  * small bounding BOX in both, so predicates on EITHER column prune
  * files. No reference analog (the reference copies rows in key order);
  * the formula is the classic space-filling-curve construction, kept in
  * closed form so the DuckDB oracle replays it bit-identically.
  */
object Layout {

  /** Quantize `expr` to `bits` bits over the CLOSED range [lo, hi]:
    * `(v - lo) * 2^bits DIV (hi - lo + 1)` — pure BIGINT arithmetic
    * (exact; no float rounding to diverge from the oracle), landing in
    * [0, 2^bits). Caller guarantees `(hi - lo) * 2^bits` fits in int64 —
    * true for any dimension span below 2^47 at the default 16 bits; a
    * wider key space should quantize on a coarser prefix first. */
  private def quantizeSql(v: String, lo: String, hi: String, bits: Int): String =
    s"(CAST($v AS BIGINT) - $lo) * ${1L << bits} DIV ($hi - $lo + 1)"

  /** Morton interleave of two pre-quantized coordinates: x occupies the
    * even output bits, y the odd. One codegen'd HOF over a
    * `bits`-element sequence — no UDF, no shuffle, no driver data. */
  private def interleaveSql(xq: String, yq: String, bits: Int): String =
    s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT), (acc, i) ->
       |  acc + shiftleft(CAST(shiftright($xq, i) & 1 AS BIGINT), 2*i)
       |      + shiftleft(CAST(shiftright($yq, i) & 1 AS BIGINT), 2*i+1))"""
      .stripMargin

  /** Z-value column over two numeric dimensions, quantized to `bits`
    * bits each against the frame's own min/max (one aggregate, joined
    * back as a broadcast single-row frame — the stats scan is the only
    * extra pass, same as any range partitioner's sampling).
    * Output: the input plus `zval`. */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(xCol).cast("bigint")).as("zstat_xlo"),
      max(col(xCol).cast("bigint")).as("zstat_xhi"),
      min(col(yCol).cast("bigint")).as("zstat_ylo"),
      max(col(yCol).cast("bigint")).as("zstat_yhi"))
    df.crossJoin(broadcast(stats))
      .withColumn("zq_x", expr(quantizeSql(xCol, "zstat_xlo", "zstat_xhi", bits)))
      .withColumn("zq_y", expr(quantizeSql(yCol, "zstat_ylo", "zstat_yhi", bits)))
      .withColumn("zval", expr(interleaveSql("zq_x", "zq_y", bits)))
      .drop("zstat_xlo", "zstat_xhi", "zstat_ylo", "zstat_yhi", "zq_x", "zq_y")
  }

  /** Static-range variant: quantize against CALLER-SUPPLIED bounds (no
    * stats pass) — the shape for incremental appends, where per-batch
    * min/max would shift the curve between batches. Values OUTSIDE the
    * declared range clamp to the curve's edge cells: an appended row
    * beyond the original bounds sorts to the end of the curve (correct
    * locality) instead of interleaving garbage bits — unclamped, an
    * overflowing quantile would spill past `bits` (silently dropped)
    * and a negative one would arithmetic-shift sign bits into every
    * lane. */
  def withZValueStatic(df: DataFrame, xCol: String, yCol: String,
                       xRange: (Long, Long), yRange: (Long, Long),
                       bits: Int = 16): DataFrame = {
    val cap = (1L << bits) - 1
    def clamped(q: String): String = s"GREATEST(0L, LEAST(${cap}L, $q))"
    df.withColumn("zq_x",
        expr(clamped(quantizeSql(xCol, s"${xRange._1}", s"${xRange._2}", bits))))
      .withColumn("zq_y",
        expr(clamped(quantizeSql(yCol, s"${yRange._1}", s"${yRange._2}", bits))))
      .withColumn("zval", expr(interleaveSql("zq_x", "zq_y", bits)))
      .drop("zq_x", "zq_y")
  }

  /** Small-files compaction: rewrite a fragmented parquet table into
    * ceil(totalBytes / targetBytes) files — the steady-state maintenance
    * op for any incrementally-appended table (each append lands small
    * files; a million of them turn every downstream scan's planning and
    * open() overhead into the bottleneck). With `sortCol` the rewrite
    * range-partitions and sorts, PRESERVING key clustering so parquet
    * min/max pruning keeps working after compaction — compacting with a
    * plain repartition would destroy the layout the scans depend on.
    *
    * Driver work is metadata only (one FileSystem content summary); the
    * data moves through a single shuffle, same as any repartition.
    * Returns the target file count. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetBytes: Long = 128L << 20,
              sortCol: String = null): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val bytes = p.getFileSystem(spark.sessionState.newHadoopConf())
      .getContentSummary(p).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val out =
      if (sortCol != null)
        df.repartitionByRange(n, col(sortCol)).sortWithinPartitions(sortCol)
      else df.repartition(n)
    out.write.mode("overwrite").parquet(outPath)
    n
  }

  /** Z-ordered parquet write: range-partition on the z-value into
    * `numFiles` files and sort within each — every output file covers a
    * compact z-range, hence a small bounding box in BOTH dimensions, and
    * the parquet min/max stats on xCol/yCol prune files for predicates
    * on either. The write itself is one range shuffle (the same cost a
    * plain global sort pays) — no extra passes over the data. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int, bits: Int = 16): Unit =
    withZValue(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
      .write.mode("overwrite").parquet(path)
}
