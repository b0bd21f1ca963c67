package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column<->Expression conversion (Spark 4
  * moved Column onto ColumnNode; `new Column(expr)` no longer exists). This is
  * the supported classic-session path, just not public API — isolated here so
  * the rest of the codebase stays vanilla.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Whether a catalyst predicate translates to a v1 `Filter`
    * (`DataSourceStrategy.translateFilter` is protected within sql) — how
    * the DML rewrite decides if a DELETE condition can ride the
    * SupportsDelete pushed-filter path or must route through the COW/MoR
    * mutations.
    */
  def translatesToV1Filter(e: Expression): Boolean =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true).isDefined
}

/** Bridge for V1 streaming sinks: the Dataset handed to `Sink.addBatch` is
  * bound to the micro-batch's IncrementalExecution and cannot be re-planned
  * by arbitrary batch actions; re-wrapping its logical plan in a fresh
  * Dataset detaches it (the same move Spark's own ForeachBatchSink makes
  * before invoking user code). `Dataset.ofRows` is private[sql], hence the
  * bridge.
  */
object DatasetBridge {
  /** Wrap an analyzed logical plan as a DataFrame (`Dataset.ofRows` is
    * private[sql]) — how the DML rewrite re-materializes a MERGE source.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The last micro-batch's executed physical plan of a running streaming
    * query (`StreamingQueryWrapper.lastExecution` is private[sql]) — how
    * the Plans audit dumps the per-batch plan of streaming sources.
    */
  def lastMicroBatchPlan(q: org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.execution.SparkPlan =
    q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan

  def rebatch(data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.DataFrame = {
    val classic = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    // the micro-batch plan still carries isStreaming sources, so batch
    // actions on a plain re-wrap are rejected; pin the executed RDD into a
    // non-streaming LogicalRDD, exactly as ForeachBatchSink does
    val node = org.apache.spark.sql.execution.LogicalRDD.fromDataset(
      classic.queryExecution.toRdd, classic, isStreaming = false)
    org.apache.spark.sql.classic.Dataset.ofRows(classic.sparkSession, node)
  }
}

/** Test-only bridge to SparkSessionExtensions' private[sql] function
  * application, so the `spark.sql.extensions` entry point can be verified
  * without building a second SparkSession (extensions are applied only at
  * session construction).
  */
object ExtensionsBridge {
  def applyFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)
}
