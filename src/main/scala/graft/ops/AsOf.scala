package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the single most recent
  * right row with `right.ts <= left.ts` on the same key — the standard
  * event-enrichment join (trades/quotes, session-attribute lookup,
  * point-in-time feature joins for training data).
  *
  * Spark has no native as-of join; the naive encodings are a range
  * join (O(n·m) BroadcastNestedLoop or a point-in-interval explosion)
  * or a per-left-row subquery. This implementation is the scalable
  * union + carry-forward form:
  *
  *   1. union right (side=0) and left (side=1) rows on (key, ts, side);
  *   2. one window per key ordered by (ts, side, tieBreak) carries the
  *      last non-null right payload forward (`last(_, ignoreNulls)` over
  *      unbounded-preceding..current);
  *   3. keep left rows; their carried payload IS the as-of match.
  *
  * Cost: ONE shuffle on the key (the same exchange a sort-merge join
  * would pay) + a per-partition sort — no candidate explosion at any
  * data size, and both inputs stream through the window. At 100 TB the
  * hazard is a monster key (all rows one user): mitigate upstream by
  * time-bucketing the key (join on (key, day) with a per-bucket seed
  * carried from the previous bucket) — the window itself never
  * materializes more than one partition's sort run.
  *
  * Semantics match DuckDB/kdb `ASOF JOIN` with an INCLUSIVE bound
  * (`l.ts >= r.ts`): side=0 sorts before side=1 at equal ts. LEFT
  * semantics: unmatched left rows keep a null payload.
  *
  * `right` must be unique per (key, ts) — duplicate right rows at one
  * instant have no deterministic winner in ANY as-of engine; pre-reduce
  * the right side (the gate keeps the max event_id per instant).
  * `tolerance`: an optional staleness bound — matches older than
  * `ts - tolerance` are nulled (unit-covered; oracle engines express it
  * as a post-join CASE).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               ts: String, tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.filterNot(c => key.contains(c)).toSeq
    val keyCols = key.map(col)

    val r2 = right.select(keyCols ++ Seq(col(ts).as("_ts"), lit(0).as("_side"),
      struct(rightPayload.map(col): _*).as("_r")): _*)
    val l2 = left.select(keyCols ++ Seq(col(ts).as("_ts"), lit(1).as("_side"),
      lit(null).cast(r2.schema("_r").dataType).as("_r"),
      struct(leftCols.map(col): _*).as("_l")): _*)
    val unioned = r2.withColumn("_l",
        lit(null).cast(l2.schema("_l").dataType))
      .unionByName(l2)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)

    val bounded = tolerance match {
      case Some(tol) => carried.withColumn("_asof",
        when(col("_asof")(ts) >= col("_ts") - lit(tol), col("_asof")))
      case None => carried
    }
    bounded.select(
      leftCols.map(c => col("_l")(c).as(c)) ++
        rightPayload.map(c => col("_asof")(c).as(s"asof_$c")): _*)
  }

  /** [[asofJoin]] with TIME-BUCKETED keys — the monster-key mitigation
    * the plain form documents, as code: partitioning moves from `key`
    * to `(key, floor(ts / bucketWidth))`, so one key's timeline spreads
    * across many partitions instead of one sort run. Each bucket is
    * seeded with the key's latest right row from any EARLIER bucket
    * (derived at BUCKET granularity — one row per non-empty bucket,
    * not per event), which restores exactly the carry the partition
    * split severed. Result-equal to [[asofJoin]] by construction; the
    * spec asserts it and the gate shares the same oracle.
    *
    * `right` must be unique per (key, ts) — the same contract as
    * [[asofJoin]]; the per-bucket "latest" seed uses `max_by(_, ts)`,
    * which that uniqueness makes deterministic. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: Seq[String],
                       ts: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.filterNot(c => key.contains(c)).toSeq
    val keyCols = key.map(col)
    val bucket = floor(col("_ts") / lit(bucketWidth)).cast("long").as("_bk")

    val r2 = right.select(keyCols ++ Seq(col(ts).as("_ts"), lit(0).as("_side"),
      struct(rightPayload.map(col): _*).as("_r")): _*)
      .withColumn("_bk", bucket)
    val l2 = left.select(keyCols ++ Seq(col(ts).as("_ts"), lit(1).as("_side"),
      lit(null).cast(r2.schema("_r").dataType).as("_r"),
      struct(leftCols.map(col): _*).as("_l")): _*)
      .withColumn("_bk", bucket)

    // the carry the partition split severed: for every (key, bucket)
    // the LEFT side touches, one seed row — the key's latest right row
    // from any earlier bucket. Derived bucket-level (one row per
    // non-empty right bucket), so the join below is over bucket
    // markers, not events; its B² worst case is buckets-per-key
    // squared, the knob `bucketWidth` controls. The seed keeps its
    // ORIGINAL ts (strictly below the bucket start), so the in-bucket
    // sort places it before every event of its target bucket.
    val perBucket = r2.groupBy(keyCols :+ col("_bk"): _*)
      .agg(max_by(struct(col("_ts"), col("_r")), col("_ts")).as("_last"))
      .withColumnRenamed("_bk", "_rbk")
    val seeds = l2.select(keyCols :+ col("_bk"): _*).distinct()
      .join(perBucket, key)
      .where(col("_rbk") < col("_bk"))
      .groupBy(keyCols :+ col("_bk"): _*)
      .agg(max_by(col("_last"), col("_last._ts")).as("_seed"))
      .select(keyCols ++ Seq(col("_seed._ts").as("_ts"), lit(0).as("_side"),
        col("_seed._r").as("_r"), col("_bk")): _*)

    val nullL = lit(null).cast(l2.schema("_l").dataType).as("_l")
    val unioned = seeds.withColumn("_l", nullL)
      .unionByName(r2.withColumn("_l", nullL))
      .unionByName(l2)

    val w = Window.partitionBy(keyCols :+ col("_bk"): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(
        leftCols.map(c => col("_l")(c).as(c)) ++
          rightPayload.map(c => col("_asof")(c).as(s"asof_$c")): _*)
  }
}
