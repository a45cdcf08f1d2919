package graft

import org.apache.spark.sql.functions._

import graft.functions.VecMath

/** The native vector kernels must be BIT-IDENTICAL to the higher-order-
  * function formulation they replaced (`aggregate(zip_with(...))` folds
  * left-to-right; so do the kernels) — the ann/dedup oracles were
  * derived against that formulation and any ulp drift would break
  * hash-match gates. */
class VecMathSpec extends SparkTestBase {

  import org.apache.spark.sql.Column

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def hofNorm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
  private def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / (hofNorm(a) * hofNorm(b))
  private def hofSqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  private lazy val emb = graft.sources.Tables(spark, sf, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  test("cosine kernel is bit-identical to the HOF fold on real embeddings") {
    val pairs = emb.select(col("vec_id"), col("emb"))
      .crossJoin(emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("emb").as("qe")))
    val diffs = pairs.select(
        VecMath.cosine(col("qe"), col("emb")).as("native"),
        hofCosine(col("qe"), col("emb")).as("hof"))
      // bit-level equality, not tolerance: NaN==NaN via <=> on the raw doubles
      .where(!(col("native") <=> col("hof")))
      .count()
    assert(diffs == 0L, s"$diffs pairs diverge from the HOF formulation")
  }

  test("sqDist kernel is bit-identical to the HOF fold") {
    val pairs = emb.crossJoin(emb.where(col("vec_id") < 5)
      .select(col("emb").as("qe")))
    val diffs = pairs.select(VecMath.sqDist(col("qe"), col("emb")).as("native"),
        hofSqDist(col("qe"), col("emb")).as("hof"))
      .where(!(col("native") <=> col("hof")))
      .count()
    assert(diffs == 0L)
  }

  test("degenerate inputs: mismatched lengths and null elements are NULL, zero vectors NaN") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)), // length mismatch
      (2L, Seq(0.0, 0.0), Seq(1.0, 2.0)),      // zero norm → NaN
      (3L, Seq(1.0, 2.0), Seq(2.0, 4.0))       // parallel → 1.0
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"), VecMath.cosine(col("a"), col("b")).as("c"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1), "length mismatch must be NULL")
    assert(rows(1).getDouble(1).isNaN, "zero-norm must be NaN (HOF 0/0 parity)")
    assert(math.abs(rows(2).getDouble(1) - 1.0) < 1e-12)

    val withNull = Seq((1L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("id", "a", "b")
      .select(VecMath.cosine(col("a").cast("array<double>"), col("b").cast("array<double>")))
    assert(withNull.collect()(0).isNullAt(0), "null element must be NULL")
  }

  test("interpreted eval matches codegen (eval path used by non-codegen parents)") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Array(0.5, -1.5, 2.25)
    val b = Array(1.0, 0.25, -0.75)
    val df = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
    val viaPlan = df.select(VecMath.cosine(col("a"), col("b"))).collect()(0).getDouble(0)
    // direct interpreted eval on the expression, from resolved literals
    val expr = graft.functions.CosineSim(
      Literal.create(a, ArrayType(DoubleType)),
      Literal.create(b, ArrayType(DoubleType)))
    val interp = expr.eval(null).asInstanceOf[Double]
    assert(java.lang.Double.doubleToLongBits(viaPlan) ==
      java.lang.Double.doubleToLongBits(interp))
  }
}
