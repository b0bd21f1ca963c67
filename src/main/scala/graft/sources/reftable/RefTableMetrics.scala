package graft.sources.reftable

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}

/** DSv2 custom metrics for reftable batch scans — the observability that
  * makes pruning AUDITABLE at scale: a 100 TB scan that "should" have been
  * partition-pruned shows `filesPruned`/`filesListed` right in the SQL UI's
  * scan node, and a merge-on-read table shows how many rows its deletion
  * vectors actually masked. Without these, the only way to know whether
  * skipping worked is to eyeball input sizes.
  *
  * Driver-side (reported once per scan, after planning):
  *  - `filesListed`  — snapshot files in the resolved listing, pre-pruning
  *  - `filesPruned`  — removed by partition values, per-file stats ranges,
  *    bloom/categorical skipping, and runtime (DPP) filters
  *
  * Task-side (cumulative per partition reader, summed across tasks):
  *  - `filesRead`     — file splits actually opened
  *  - `splitBytes`    — bytes of the opened splits
  *  - `dvRowsSkipped` — rows masked by merge-on-read deletion vectors
  *
  * Spark wires these through `Scan.supportedCustomMetrics` (SQL-metric
  * declaration), `Scan.reportDriverMetrics` (posted after
  * `planInputPartitions`), and `PartitionReader.currentMetricsValues`
  * (polled by the scan RDD; values are CUMULATIVE per reader).
  */
object RefTableMetrics {
  val FilesListed = "filesListed"
  val FilesPruned = "filesPruned"
  val FilesRead = "filesRead"
  val SplitBytes = "splitBytes"
  val DvRowsSkipped = "dvRowsSkipped"

  private final class Sum(metricName: String, desc: String) extends CustomSumMetric {
    override def name(): String = metricName
    override def description(): String = desc
  }

  /** Fresh metric instances for one scan (Spark keys SQL metrics by name). */
  def scanMetrics: Array[CustomMetric] = Array(
    new Sum(FilesListed, "snapshot files listed (pre-pruning)"),
    new Sum(FilesPruned, "files pruned (partition/stats/runtime filters)"),
    new Sum(FilesRead, "file splits read"),
    new Sum(SplitBytes, "split bytes read"),
    new Sum(DvRowsSkipped, "rows masked by deletion vectors"))

  final case class TaskValue(metricName: String, v: Long) extends CustomTaskMetric {
    override def name(): String = metricName
    override def value(): Long = v
  }

  /** Planning-time counts, written by the Batch (which does the pruning)
    * and read back by the Scan's `reportDriverMetrics` — Spark posts driver
    * metrics after partitions are planned, so the order always holds.
    */
  final class DriverScanMetrics {
    @volatile var listed: Long = -1L
    @volatile var kept: Long = -1L
    def report: Array[CustomTaskMetric] =
      if (listed < 0) Array.empty
      else Array(TaskValue(FilesListed, listed), TaskValue(FilesPruned, listed - kept))
  }
}
