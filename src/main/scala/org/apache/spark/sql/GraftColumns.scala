package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the sql-private Column ↔ Expression converters, so graft's
  * native expressions (plans.WinnowFingerprints) can be placed in a plan
  * directly — no function registration, correct on a vanilla session (the
  * driver's Verify/Bench build plain ANSI sessions). */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
