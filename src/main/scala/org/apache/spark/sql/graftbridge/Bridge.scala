package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 keeps these conversions
  * `private[sql]`, so extension libraries host a one-liner inside an
  * `org.apache.spark.sql` subpackage — the standard pattern for shipping
  * custom Catalyst expressions (no Spark internals are modified).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
