package graft.sources.reftable

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** A snapshot file pinned at refresh time. Pinning (path, length) at the
  * refresh boundary is what gives a generation snapshot identity even if the
  * underlying table is overwritten mid-generation — parquet files are
  * immutable once written.
  */
final case class SnapshotFile(path: String, length: Long)

object SnapshotFiles {
  def list(dir: String): Seq[SnapshotFile] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(new Configuration())
    if (!fs.exists(p)) throw new IllegalArgumentException(s"reftable path does not exist: $dir")
    val it = fs.listStatus(p)
    it.toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.toString)
      .map(s => SnapshotFile(s.getPath.toString, s.getLen)) match {
      case Seq() if fs.getFileStatus(p).isFile => Seq(SnapshotFile(p.toString, fs.getFileStatus(p).getLen))
      case other => other
    }
  }
}

/** Offset = (batch counter, refresh generation). JSON-serialized into the
  * streaming checkpoint.
  */
final case class RefTableOffset(batch: Long, gen: Long) extends Offset {
  override def json(): String = s"""{"batch":$batch,"gen":$gen}"""
}

object RefTableOffset {
  def fromJson(s: String): RefTableOffset = {
    val n = new ObjectMapper().readTree(s)
    RefTableOffset(n.path("batch").asLong(), n.path("gen").asLong())
  }
}

/** The reference's snapshot/refresh semantics as a DSv2 MicroBatchStream
  * (reference core: TableInputDStream.scala:51-62).
  *
  *  - Refresh policy: generation = floor(now / refreshInterval) — refreshes
  *    align to interval multiples exactly like the reference's threshold
  *    arithmetic (`lastRefreshTime + refreshInterval − lastRefreshTime %
  *    refreshInterval`, TableInputDStream.scala:56-58), and the first poll
  *    always loads (reference resets lastRefreshTime in start(),
  *    TableInputDStream.scala:42-45).
  *  - The refresh decision is made once, on the driver, inside latestOffset()
  *    and recorded in the offset, so retried tasks always see a consistent
  *    generation (the reference decided per `compute` call with wall-clock).
  *  - emitMode=refresh (default): one micro-batch per generation — idiomatic
  *    Structured Streaming (no-data triggers are skipped, and
  *    processAllAvailable() terminates). emitMode=trigger reproduces the
  *    DStream cadence: every trigger re-emits the current snapshot.
  *  - commit(end) releases snapshot metadata for generations < end.gen — the
  *    reference never unpersisted old snapshots (leak at
  *    TableInputDStream.scala:59); here old generations are dropped as soon
  *    as they are committed.
  *  - Restart: planInputPartitions for an unknown generation re-lists the
  *    current table state — the reference's restart behavior (its pipeline
  *    test stops/restarts and expects current rows, PipelineTest.java:151-177).
  */
class RefTableMicroBatchStream(
    opts: RefTableOptions, required: StructType, pushed: Array[Filter] = Array.empty)
    extends MicroBatchStream {

  private var last: RefTableOffset = _
  private val snapshots = scala.collection.mutable.Map.empty[Long, Seq[SnapshotFile]]

  private def computeGen(nowMs: Long): Long =
    if (opts.refreshMs <= 0) 0L else nowMs / opts.refreshMs

  override def initialOffset(): Offset = RefTableOffset(-1L, -1L)

  override def latestOffset(): Offset = synchronized {
    val gen = computeGen(System.currentTimeMillis())
    val prev = Option(last).getOrElse(RefTableOffset(-1L, -1L))
    val genChanged = gen != prev.gen
    if (genChanged) snapshots.getOrElseUpdate(gen, SnapshotFiles.list(opts.path))
    val batch =
      if (genChanged || opts.emitPerTrigger) prev.batch + 1
      else prev.batch
    last = RefTableOffset(batch, if (genChanged) gen else prev.gen)
    last
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = synchronized {
    val e = end.asInstanceOf[RefTableOffset]
    if (e.batch < 0) return Array.empty
    val files = snapshots.getOrElseUpdate(e.gen, SnapshotFiles.list(opts.path))
    RefTablePartitions.plan(files, e.gen)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RefTableReaderFactory(opts, required, pushed)

  override def deserializeOffset(json: String): Offset = {
    val o = RefTableOffset.fromJson(json)
    synchronized { if (last == null || o.batch > last.batch) last = o }
    o
  }

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[RefTableOffset]
    snapshots.keys.filter(_ < e.gen).toList.foreach(snapshots.remove)
  }

  override def stop(): Unit = synchronized { snapshots.clear() }
}
