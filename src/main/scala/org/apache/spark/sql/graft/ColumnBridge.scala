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
