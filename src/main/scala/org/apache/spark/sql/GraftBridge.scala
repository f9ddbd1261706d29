package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ⇄ Expression converters.
  *
  * Spark 4 split Column construction behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; extension libraries
  * conventionally expose it via a same-package shim (see e.g. the
  * public DatasetFactory pattern). This is the only file outside the
  * `graft` namespace.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
