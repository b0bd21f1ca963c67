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

  // one top-level zero-arg class per metric: Spark's metrics layer
  // RE-INSTANTIATES CustomMetric implementations reflectively by class
  // name (SQLAppStatusListener aggregation), so parameterized or nested
  // classes fail with "did not have a zero-argument constructor"
  final class FilesListedMetric extends CustomSumMetric {
    override def name(): String = FilesListed
    override def description(): String = "snapshot files listed (pre-pruning)"
  }
  final class FilesPrunedMetric extends CustomSumMetric {
    override def name(): String = FilesPruned
    override def description(): String = "files pruned (partition/stats/runtime filters)"
  }
  final class FilesReadMetric extends CustomSumMetric {
    override def name(): String = FilesRead
    override def description(): String = "file splits read"
  }
  final class SplitBytesMetric extends CustomSumMetric {
    override def name(): String = SplitBytes
    override def description(): String = "split bytes read"
  }
  final class DvRowsSkippedMetric extends CustomSumMetric {
    override def name(): String = DvRowsSkipped
    override def description(): String = "rows masked by deletion vectors"
  }

  /** Fresh metric instances for one scan (Spark keys SQL metrics by name). */
  def scanMetrics: Array[CustomMetric] = Array(
    new FilesListedMetric, new FilesPrunedMetric, new FilesReadMetric,
    new SplitBytesMetric, new DvRowsSkippedMetric)

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
