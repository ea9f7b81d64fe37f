package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * `ExpressionUtils.column` is private[sql]; a package-nested object is the
  * established pattern for libraries shipping custom Catalyst expressions
  * (cf. the public Qbeast `DatasetFactory` / Spark package objects).
  * Everything else in graft stays in the `graft.*` namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
