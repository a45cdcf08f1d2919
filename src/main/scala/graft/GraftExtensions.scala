package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{CosineSim, Dot, Fnv, Fnv1a32, SqDist}

/** `SparkSessionExtensions` entry point — makes the engine's native
  * Catalyst expressions first-class SQL functions, so the `expr()`-based
  * transform pipeline (P2) and any `spark.sql` user can call them by
  * name:
  *
  * {{{
  * spark.sql("SELECT graft_cosine(a, b) FROM pairs")
  * spark.sql("SELECT graft_fnv1a32(text) FROM docs")      // default seed
  * spark.sql("SELECT graft_fnv1a32(text, 99) FROM docs")  // explicit seed
  * }}}
  *
  * Wired via the standard config, no code change at the call site:
  * `spark.sql.extensions=graft.GraftExtensions` (set by
  * [[Sessions.builder]] for every engine session). This is the
  * documented extension tier below a custom Rule/Strategy (SURVEY §7.3:
  * none required) — injection only ADDS functions, no Spark behavior
  * changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_fnv1a32"),
      new ExpressionInfo(classOf[Fnv1a32].getName, "graft_fnv1a32"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => Fnv1a32(s, Fnv.Basis1)
        // any foldable integral expression works as a seed: the parser
        // hands `-1` over as UnaryMinus(Literal) and `2+1` as Add(..)
        // BEFORE constant folding runs, so matching bare Literals only
        // would reject visually-literal seeds
        case Seq(s, e) if e.foldable &&
            (e.dataType == LongType || e.dataType == IntegerType) =>
          Fnv1a32(s, e.eval() match {
            case l: java.lang.Long => l.longValue()
            case i: java.lang.Integer => i.longValue()
            case other => throw new IllegalArgumentException(
              s"graft_fnv1a32 seed evaluated to $other — integer required")
          })
        case _ => throw new IllegalArgumentException(
          "graft_fnv1a32(str[, constant integer seed])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSim(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_cosine(array<double>, array<double>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDist].getName, "graft_sqdist"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => SqDist(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_sqdist(array<double>, array<double>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[Dot].getName, "graft_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => Dot(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_dot(array<double>, array<double>)")
      }))
  }
}
