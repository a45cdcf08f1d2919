package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keyed last-writer-wins merge — the engine-level analog of the
  * reference's idempotent upsert sinks (MySQL `INSERT ... ON DUPLICATE KEY
  * UPDATE`, reference `mysql.go:417-498`; PostgreSQL `ON CONFLICT (pk) DO
  * UPDATE`, `postgresql.go:725-777`; Mongo `$set` upsert,
  * `mongodb.go:390-431`). Parquet is append-only, so upsert becomes a
  * merge: later writes win per key.
  *
  * Tie-break semantics: the reference applies rows in statement order, so
  * duplicates *within* one batch resolve last-in-batch-wins
  * (`mysql.go:455-476`). A shuffled DataFrame has no statement order, so
  * we impose a deterministic total order instead: within a batch,
  * duplicate keys resolve to the row with the greatest tuple of orderable
  * non-key columns (descending struct comparison). This diverges from
  * "arrival order" — which does not exist in a distributed batch — but is
  * stable across runs, partitionings, and retries, which is what the
  * resume/idempotence invariants need (SURVEY §5.2.4).
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
    * beat rows from `base`; duplicate keys within one input resolve by the
    * deterministic tie-break documented above.
    */
  def resolve(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    resolveAll(Seq(base, updates), keys)

  /** Join-based two-way merge: `FULL OUTER` on the keys, update columns
    * win where present. Semantically equal to [[resolve]] for inputs with
    * unique keys per side; its value is the physical plan: when BOTH
    * sides are bucketed tables bucketed+sorted by `keys` (same bucket
    * count), the sort-merge join runs with ZERO shuffle exchanges — the
    * read-merge-write amplification of the windowed merge disappears,
    * which is the design that holds at 100 TB (base stays bucketed on
    * disk; each merge shuffles only the delta at write time).
    * `UpsertSpec` asserts the no-Exchange plan. */
  def resolveJoined(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val b = base.as("b"); val u = updates.as("u")
    val joined = b.join(u, keys.map(k => col(s"b.$k") === col(s"u.$k")).reduce(_ && _),
      "full_outer")
    val out = cols.map { c =>
      if (keys.contains(c)) coalesce(col(s"u.$c"), col(s"b.$c")).as(c)
      else when(keys.map(k => col(s"u.$k").isNotNull).reduce(_ && _),
        col(s"u.$c")).otherwise(col(s"b.$c")).as(c)
    }
    joined.select(out: _*)
  }

  /** N-way merge, later DataFrames win. All inputs must share a schema
    * (columns are aligned by name). */
  def resolveAll(batches: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(batches.nonEmpty, "resolveAll needs at least one batch")
    val cols = batches.head.columns.toSeq
    val tagged = batches.zipWithIndex.map { case (df, i) =>
      df.select(cols.map(col): _*).withColumn(Prec, lit(i))
    }
    val unioned = tagged.reduce(_ unionByName _)
    // Orderable (atomic-typed) non-key columns give the deterministic
    // intra-batch tie-break; maps/arrays/structs are skipped (not
    // comparable or too wide to matter).
    val orderable: DataType => Boolean = {
      case _: StringType | _: NumericType | _: BooleanType | _: DateType |
           _: TimestampType | _: TimestampNTZType | _: BinaryType => true
      case _ => false
    }
    val tieCols = batches.head.schema.fields.collect {
      case StructField(n, dt, _, _) if orderable(dt) && !keys.contains(n) => col(n).desc
    }.toSeq
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(Prec).desc +: tieCols: _*)
    unioned
      .withColumn(Rn, row_number().over(w))
      .where(col(Rn) === 1)
      .drop(Prec, Rn)
  }
}
