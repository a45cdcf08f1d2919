package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column ↔ Expression bridge (`classic.ExpressionUtils`)
  * `private[sql]`; custom Catalyst expressions (graft's `Fnv1a32`) still
  * need it to surface as `Column`s. This shim lives in the sql package
  * purely to re-export those two calls — the standard extension-point
  * workaround; no Spark behavior is touched. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
