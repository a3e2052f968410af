package org.apache.spark.sql

/** Bridge into `private[sql]` Spark internals.
  *
  * `Dataset.ofRows` lets us re-bind a DataFrame's logical plan to a
  * *different* SparkSession. Graft uses this for its two-engine
  * topology (Mallard runs two Flight servers, reference
  * `demo.py:565-568`): a table GET from engine A's session-local
  * catalog can be PUT into engine B's catalog and registered as a temp
  * view *in B's session*, without materializing anything — the logical
  * plan is the transfer payload, and Catalyst keeps optimizing through
  * it.
  */
object GraftBridge {
  def rebind(target: SparkSession, df: DataFrame): DataFrame =
    classic.Dataset.ofRows(
      target.asInstanceOf[classic.SparkSession],
      df.queryExecution.analyzed)

  /** Column ⇄ catalyst Expression, for custom expressions like
    * graft.functions.DotProduct (`ExpressionUtils` is private[sql]).
    */
  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** Drop a session-local temp view WITHOUT the public API's cascade
    * uncache: `spark.catalog.dropTempView` uncaches any cached plan the
    * view resolves to, which in Graft's two-engine topology would let
    * engine B's DROP evict a cached table engine A still serves —
    * Mallard's servers are isolated (`flight_server.py:167-183`), so
    * ours must be too.
    */
  def dropTempView(spark: SparkSession, name: String): Boolean =
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.catalog.dropTempView(name)
}
