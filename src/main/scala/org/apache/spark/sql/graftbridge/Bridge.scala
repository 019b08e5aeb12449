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

  /** Materialize the driver's StateStoreCoordinator RPC endpoint (a
    * `private[sql]` lazy member that normally only a streaming query start
    * touches). BATCH `transformWithState` tasks still resolve it, so a
    * batch-first run in a fresh session would otherwise die with
    * RpcEndpointNotFound.
    */
  def ensureStateStoreCoordinator(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.streams match {
      case m: org.apache.spark.sql.classic.StreamingQueryManager =>
        m.stateStoreCoordinator: Unit
      case _ => ()
    }
}
