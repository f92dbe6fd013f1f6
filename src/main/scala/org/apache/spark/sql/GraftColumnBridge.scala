package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` classic Column↔Expression converters so
  * graft can use custom Catalyst expressions from the public DSL. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Frees the executor-storage blocks behind a `localCheckpoint()`'d Dataset.
  * `Dataset.unpersist` only talks to the cache manager and does not touch the
  * checkpoint RDD, so iterative algorithms (e.g. label propagation) would
  * otherwise accumulate one persisted RDD per round for the app's lifetime.
  * Works through projections: any LogicalRDD in the plan is unpersisted. */
object GraftCheckpointUtils {
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
