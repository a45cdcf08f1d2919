package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-cell TTL preservation (K4) — the Cassandra engine reads each
  * cell's remaining TTL (`SELECT col, TTL(col)`, reference
  * `cassandra.go:558-573`) and re-applies it on insert
  * (`INSERT ... USING TTL ?`, `cassandra.go:677-679`).
  *
  * Spark/parquet has no cell TTL, so the engine carries the reference's
  * convention as SHADOW COLUMNS (SURVEY §1.3): a data column `c` may be
  * accompanied by `ttl_c` (seconds-remaining, bigint, null = no TTL).
  * Sinks writing to a TTL-capable store map `ttl_c` back to `USING TTL`;
  * file sinks persist the shadow columns verbatim; [[expire]] evaluates
  * them relative to a cutoff for engines that must materialize expiry.
  */
object TtlColumns {

  val Prefix = "ttl_"

  /** Data columns that carry a TTL shadow. */
  def ttlPairs(df: DataFrame): Seq[(String, String)] = {
    val cols = df.columns.toSet
    df.columns.filter(_.startsWith(Prefix))
      .flatMap(t => Some(t.stripPrefix(Prefix)).filter(cols.contains).map(_ -> t))
      .toSeq
  }

  /** Validate the convention: every `ttl_x` must shadow an existing `x`
    * with a numeric type. */
  def validate(df: DataFrame): Unit = {
    val cols = df.columns.toSet
    val orphans = df.columns.filter(_.startsWith(Prefix))
      .filter(t => !cols.contains(t.stripPrefix(Prefix)))
    require(orphans.isEmpty,
      s"TTL shadow column(s) without a data column: ${orphans.mkString(", ")}")
    // type check up front: a string-typed shadow would otherwise die in
    // expire()'s comparison with an ANSI cast error mid-job
    val nonNumeric = df.columns.filter(_.startsWith(Prefix)).filterNot(t =>
      df.schema(t).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    require(nonNumeric.isEmpty,
      s"TTL shadow column(s) must be numeric (seconds remaining): " +
        nonNumeric.map(t => s"$t: ${df.schema(t).dataType.simpleString}").mkString(", "))
  }

  /** Attach a TTL shadow to a column (engine-side producer API). */
  def withTtl(df: DataFrame, column: String, ttlSeconds: Column): DataFrame =
    df.withColumn(Prefix + column, ttlSeconds.cast("bigint"))

  /** Materialize expiry at a cutoff: cells whose `ttl_c` (seconds
    * remaining at snapshot time) is below `elapsedSeconds` become NULL,
    * and the shadow is reduced by the elapsed time (floor 0 → NULL pair).
    * This is what a TTL-less destination must do to be semantically
    * equivalent to the source store's clock advancing. */
  def expire(df: DataFrame, elapsedSeconds: Long): DataFrame = {
    validate(df)
    ttlPairs(df).foldLeft(df) { case (d, (c, t)) =>
      d.withColumn(c, when(col(t).isNotNull && col(t) <= elapsedSeconds,
          lit(null)).otherwise(col(c)))
        .withColumn(t, when(col(t).isNotNull && col(t) > elapsedSeconds,
          col(t) - elapsedSeconds).otherwise(lit(null).cast("bigint")))
    }
  }
}
