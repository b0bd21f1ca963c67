package graft.sources.reftable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Batch SQL changefeed — the Delta-CDF `table_changes` table-valued
  * function, rewritten at PARSE time into the lazy batch diff
  * ([[Changefeed.between]]):
  *
  * {{{
  *   SELECT * FROM table_changes('graft.db.t', 'tag:last-audit')
  *   SELECT * FROM table_changes('graft.db.t', '<v1>', 'ts:2026-08-14')
  * }}}
  *
  * Arguments: the table name (resolved through the session's catalogs,
  * so `db.t` and bare `t` follow the current catalog/namespace), the
  * `from` version spec, and an optional `to` spec (default: current).
  * Both specs accept a version name, `tag:<name>`, or `ts:<timestamp>`.
  * Output is the table's schema plus `change_type` ∈ insert | update |
  * delete (after-images; before-image for deletes) — the same shape the
  * streaming `t$changefeed` suffix emits, but as one composable batch
  * DataFrame over the O(changed files) file delta: joins, aggregations
  * and filters plan against it like any relation, and at 100 TB the diff
  * reads only the files the two versions do NOT share.
  *
  * Spark has no public table-function catalog, and the analyzer's
  * ResolveFunctions fails EAGERLY on unknown TVF names (an injected
  * resolution rule never gets a chance), so the hook is a delegating
  * parser — the same extension point Delta uses for its SQL surface.
  * Injected by [[graft.functions.GraftExtensions]]; everything but the
  * `table_changes` node delegates verbatim.
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    TableChangesRewrite.rewrite(spark, delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    TableChangesRewrite.rewrite(spark, delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String) = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) = delegate.parseRoutineParam(sqlText)
}

object TableChangesRewrite {

  /** Replace every `table_changes(...)` TVF node with the analyzed diff
    * plan; all other nodes pass through (unknown TVFs keep Spark's error).
    */
  def rewrite(spark: SparkSession, plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case tvf: UnresolvedTableValuedFunction
        if tvf.name.lengthCompare(1) == 0 &&
          tvf.name.head.equalsIgnoreCase("table_changes") =>
      val args = tvf.functionArgs.map {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          "table_changes(table, from[, to]) takes string literals, got " + other.sql)
      }
      if (args.size < 2 || args.size > 3)
        throw new IllegalArgumentException(
          "table_changes(table, from[, to]): table name + from version spec " +
            "(+ optional to spec; version name, tag:<name> or ts:<timestamp>)")
      val table = spark.table(args.head).queryExecution.analyzed.collectFirst {
        case r: DataSourceV2Relation => r.table
      } match {
        case Some(rt: RefTable) => rt
        case _ => throw new IllegalArgumentException(
          s"table_changes: '${args.head}' is not a reftable catalog table")
      }
      if (table.opts.keyColumns.isEmpty)
        throw new IllegalArgumentException(
          s"table_changes: '${args.head}' declares no 'keyColumns' option — the diff " +
            "needs the merge key for insert/update/delete classification (declare at " +
            "CREATE, or ALTER TABLE SET TBLPROPERTIES ('option.keyColumns'='id'))")
      val opts = table.descriptorOptions ++ Map(
        "path" -> table.opts.path, "schema" -> table.opts.schema.toDDL)
      Changefeed.between(spark, opts, args(1), args.lift(2).getOrElse(""))
        .queryExecution.analyzed
  }
}
