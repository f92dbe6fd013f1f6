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

/** Bridge to the `private[spark]` listener bus drain, so tests that count
  * jobs through a SparkListener can wait for in-flight events instead of
  * sleeping (listener delivery is asynchronous). */
object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
