package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's
  * skew-join splitting can't apply (e.g. skewed aggregation keys, or
  * joins below AQE's thresholds). Salts are DETERMINISTIC (hash of the
  * remaining columns, not `rand()`), so retried tasks and resumed jobs
  * reproduce identical results — the same resume-safety rule the
  * transform validator enforces (P6).
  */
object Salting {

  private def saltCol(df: DataFrame, keys: Seq[String], salts: Int): Column = {
    val others = df.columns.filterNot(keys.contains).map(col).toSeq
    val basis = if (others.nonEmpty) others else keys.map(col)
    pmod(hash(basis: _*), lit(salts))
  }

  /** Two-phase skew-safe count: partial count per (key, salt) — spreading
    * a hot key over `salts` reducers — then final sum per key. Result is
    * exactly `df.groupBy(keys).count()`. */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(df, keys, salts))
    salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("cnt"))
  }

  /** Skew-safe equi-join: the big side is salted; the small side is
    * replicated once per salt value, so a hot key's rows spread over
    * `salts` join tasks. Result equals the plain inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val bigS = big.withColumn("__salt", saltCol(big, Seq(key), salts))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
