package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed last-writer-wins merge — the engine-level analog of the
  * reference's idempotent upsert sinks (MySQL `INSERT ... ON DUPLICATE KEY
  * UPDATE`, reference `mysql.go:417-498`; PostgreSQL `ON CONFLICT (pk) DO
  * UPDATE`, `postgresql.go:725-777`; Mongo `$set` upsert,
  * `mongodb.go:390-431`). Parquet is append-only, so upsert becomes a
  * merge: later writes win per key.
  *
  * Scale notes (100 TB posture): the merge is a single shuffle on the key
  * (window over `partitionBy(pk)`), no driver-side state; with AQE on,
  * skewed keys split automatically. When the base side is a bucketed table
  * bucketed by the same key, the shuffle on that side is elided.
  */
object Upsert {

  private val Prec = "__graft_precedence"
  private val Rn   = "__graft_rn"

  /** Merge `updates` into `base`: one row per `keys`, rows from `updates`
    * beat rows from `base`; ties inside a batch are broken by the highest
    * precedence (batch index), matching "re-applying any batch suffix is a
    * no-op" (SURVEY §5.2.4).
    */
  def resolve(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    resolveAll(Seq(base, updates), keys)

  /** N-way merge, later DataFrames win. All inputs must share a schema
    * (columns are aligned by name). */
  def resolveAll(batches: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(batches.nonEmpty, "resolveAll needs at least one batch")
    val cols = batches.head.columns.toSeq
    val tagged = batches.zipWithIndex.map { case (df, i) =>
      df.select(cols.map(col): _*).withColumn(Prec, lit(i))
    }
    val unioned = tagged.reduce(_ unionByName _)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(Prec).desc)
    unioned
      .withColumn(Rn, row_number().over(w))
      .where(col(Rn) === 1)
      .drop(Prec, Rn)
  }
}
