package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst vector kernels for the ANN/embedding family, with
  * whole-stage codegen — the preferred extension tier (custom
  * `Expression` beats a Scala UDF, SURVEY §2.8).
  *
  * Why they exist: every ANN and embedding-dedup candidate pair pays a
  * cosine (or squared-L2) over the full vector. The previous
  * formulation (`aggregate(zip_with(...))`) is a higher-order function
  * — Catalyst evaluates HOF lambdas per element WITHOUT codegen
  * (`CodegenFallback`), allocating a lambda frame per step. These
  * kernels are one branch-free primitive loop over the two `ArrayData`,
  * inlined into the generated stage.
  *
  * Numeric parity: the loops accumulate left-to-right in `double`,
  * exactly the HOF fold order (`acc + x*y` ascending index), so results
  * are bit-identical to the old formulation and to the DuckDB oracle's
  * `list_sum(list_transform(list_zip(...)))` — asserted in
  * `VecMathSpec`. Mismatched lengths and null elements yield NULL (the
  * HOF chain's behavior under zip_with padding).
  */
object VecMath {

  /** Cosine similarity kernel (also called from generated code). Boxed
    * so the degenerate cases can signal SQL NULL; NaN (zero-norm input)
    * passes through as a value, matching `0/0` in the HOF form. */
  def cosineBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Dot-product kernel (projection / scoring passes). */
  def dotBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Squared L2 distance kernel (k-means training metric). */
  def sqDistBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Column API: exact cosine similarity over two `array<double>`. */
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column API: squared Euclidean distance over two `array<double>`. */
  def sqDist(a: Column, b: Column): Column =
    GraftShim.column(SqDist(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column API: dot product over two `array<double>`. */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(Dot(GraftShim.expression(a), GraftShim.expression(b)))
}

private[functions] trait VecBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Fully-qualified static kernel, e.g. `"graft.functions.VecMath.cosineBoxed"`. */
  protected def kernel: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecr")
      s"""
         |java.lang.Double $tmp = $kernel($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

case class CosineSim(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "graft_cosine"
  override protected def kernel: String = "graft.functions.VecMath.cosineBoxed"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.cosineBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

case class SqDist(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "graft_sqdist"
  override protected def kernel: String = "graft.functions.VecMath.sqDistBoxed"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.sqDistBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDist =
    copy(left = l, right = r)
}

case class Dot(left: Expression, right: Expression) extends VecBinary {
  override def prettyName: String = "graft_dot"
  override protected def kernel: String = "graft.functions.VecMath.dotBoxed"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Dot =
    copy(left = l, right = r)
}
