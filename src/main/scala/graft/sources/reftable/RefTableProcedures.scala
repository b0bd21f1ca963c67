package graft.sources.reftable

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataTypes, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The SQL surface of the layout-maintenance loop (DSv2 `ProcedureCatalog`,
  * the Iceberg `CALL`-procedure shape):
  *
  * {{{
  *   CALL graft.system.maintain(table => 'corpus.docs')
  *   CALL graft.system.maintain(table => 'corpus.docs', dry_run => true)
  * }}}
  *
  * Returns one row `(action, reason, version)` — `action` is what
  * [[RefTableMaintenance.decide]] chose (`none`/`compact`/`recluster`/
  * `rebucket`), `version` the restoring publish when one ran. `dry_run`
  * reads the signals and reports the decision without executing it, so a
  * scheduler can census a warehouse cheaply and only spend cluster time on
  * tables that need work.
  */
final class MaintainProcedure(resolveTarget: String => (String, Seq[String]))
    extends UnboundProcedure with BoundProcedure {

  override def name: String = "maintain"

  override def description: String =
    "Reads a versioned table's layout signals and, when degraded past thresholds, " +
      "runs the restoring publish (compact / recluster / rebucket)"

  override def bind(inputType: StructType): BoundProcedure = this

  // mutates table state; never cache or reorder its invocation
  override def isDeterministic: Boolean = false

  override def parameters: Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", DataTypes.StringType)
      .comment("table reference inside this catalog, e.g. 'namespace.table'").build(),
    ProcedureParameter.in("dry_run", DataTypes.BooleanType).defaultValue("false")
      .comment("report the decision without executing it").build(),
    ProcedureParameter.in("target_file_bytes", DataTypes.LongType)
      .defaultValue((128L * 1024 * 1024).toString).build(),
    ProcedureParameter.in("max_small_files", DataTypes.IntegerType).defaultValue("64").build(),
    ProcedureParameter.in("max_read_amp", DataTypes.DoubleType).defaultValue("1.5").build(),
    ProcedureParameter.in("keep_versions", DataTypes.IntegerType).defaultValue("3").build())

  private val outputSchema =
    StructType.fromDDL("action STRING, reason STRING, version STRING")

  override def call(input: InternalRow): JIterator[Scan] = {
    val tableRef = input.getString(0)
    val dryRun = input.getBoolean(1)
    val targetFileBytes = input.getLong(2)
    val maxSmallFiles = input.getInt(3)
    val maxReadAmp = input.getDouble(4)
    val keepVersions = input.getInt(5)
    val (root, partitionColumns) = resolveTarget(tableRef)
    val decision =
      if (dryRun)
        RefTableMaintenance.decide(
          RefTableMaintenance.signals(root), targetFileBytes, maxSmallFiles, maxReadAmp)
      else
        RefTableMaintenance.maintain(SparkSession.active, root,
          targetFileBytes, maxSmallFiles, maxReadAmp, keepVersions, partitionColumns)
    val row = InternalRow(
      UTF8String.fromString(decision.action),
      UTF8String.fromString(decision.reason),
      decision.version.map(UTF8String.fromString).orNull)
    Collections.singletonList[Scan](new LocalScan {
      override def rows(): Array[InternalRow] = Array(row)
      override def readSchema(): StructType = outputSchema
      override def description(): String = s"maintain($tableRef)"
    }).iterator()
  }
}
