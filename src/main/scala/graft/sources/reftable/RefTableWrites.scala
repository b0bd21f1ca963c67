package graft.sources.reftable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.InsertableRelation

/** Write path for reftable: `INSERT INTO` / `INSERT OVERWRITE` /
  * `df.write.format("reftable")` publish VERSIONS of the table.
  *
  * The reference is read-only (a CDAP source plugin; writes happened
  * through separate sink plugins against the transactional Table). On
  * plain file storage the only safe write under concurrent snapshot
  * readers is the versioned publish — an in-place append or overwrite
  * deletes/mutates files a pinned generation listing may still be
  * reading. So:
  *
  *  - overwrite (SQL `INSERT OVERWRITE`, SaveMode.Overwrite): the data
  *    becomes the next version;
  *  - append (SQL `INSERT INTO`, SaveMode.Append): current ∪ data becomes
  *    the next version (the current snapshot is read back through the
  *    source itself, so partitioned layouts and schema evolution behave
  *    exactly as reads do);
  *  - a target holding bare parquet files that is NOT a versioned root is
  *    refused outright rather than corrupted in place;
  *  - `version`-pinned (time travel) relations and `genColumn` projections
  *    are read-only by construction.
  *
  * CONCURRENCY CONTRACT — single writer per table. The pointer swap is
  * last-writer-wins: two concurrent OVERWRITEs leave whichever finished
  * last (the natural overwrite semantics), but two concurrent APPENDs each
  * read the same base snapshot and publish base ∪ own-rows, so the loser's
  * rows are silently absent from the surviving version — a lost update,
  * which users expect from INSERT INTO far less than from overwrite. There
  * is no compare-and-swap primitive on plain file storage to close this
  * (HDFS rename cannot express "rename iff _CURRENT still names X");
  * engines with the same storage model (Delta on HDFS without a
  * coordination service, Hive on plain dirs) document the same
  * restriction. Serialize appends through one writer — e.g. the streaming
  * sink, or an external lock — when more than one process may INSERT INTO
  * the same root. Readers are never endangered: every version is complete
  * and immutable, the anomaly is only which version the pointer names.
  *
  * Implemented as a V1Write fallback: the insertable relation receives the
  * analyzed DataFrame (columns already aligned to the table schema) and
  * delegates to [[VersionedTable]], which also writes the `_STATS.json`
  * skipping manifest — so written tables are immediately prunable.
  * Streaming writes go through [[VersionedTable.completeModePublisher]].
  */
object RefTableWrites {

  def insert(opts: RefTableOptions, data: Dataset[Row], overwrite: Boolean): Unit = {
    if (opts.version.nonEmpty)
      throw new UnsupportedOperationException(
        "reftable: a version-pinned (time travel) relation is read-only")
    if (opts.genColumn.nonEmpty)
      throw new UnsupportedOperationException(
        "reftable: tables declaring genColumn are read-only projections of refresh generations")

    // files store the key under its storage name, not the rowField alias
    val stored: DataFrame = opts.rowField match {
      case Some(rf) => data.withColumnRenamed(rf, opts.keyColumn.get)
      case None => data.toDF()
    }

    val conf = new Configuration()
    val root = new Path(opts.path)
    val fs = root.getFileSystem(conf)
    val versioned = VersionedTable.resolve(opts.path, conf).isDefined
    // bare data = loose parquet files OR partition-style subdirectories
    // without a pointer. The latter matters: creating a pointer next to a
    // bare Hive layout would not corrupt it, but every reader of the root
    // would silently stop seeing it — shadowing is as wrong as deleting.
    def bareData(s: org.apache.hadoop.fs.FileStatus): Boolean = {
      val n = s.getPath.getName
      (s.isFile && n.endsWith(".parquet")) ||
        (s.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
          !n.matches("v\\d{19}_[0-9a-f]{8}"))
    }
    if (!versioned && fs.exists(root) && fs.listStatus(root).exists(bareData))
      throw new UnsupportedOperationException(
        s"reftable: ${opts.path} holds bare snapshot data without a ${VersionedTable.Pointer} " +
          "pointer; writing would mutate or shadow files under concurrent snapshot readers. " +
          "Publish it as a versioned root (VersionedTable.publish) or target a fresh directory.")

    val storageNames = opts.schema.fields.map(f => opts.storageColumn(f.name))
    val aligned = stored.select(storageNames.map(col).toIndexedSeq: _*)
    val payload =
      if (overwrite || !versioned) aligned
      else {
        // current snapshot through our own read path (storage-named schema)
        val ddl = org.apache.spark.sql.types.StructType(opts.schema.fields.map(f =>
          f.copy(name = opts.storageColumn(f.name)))).toDDL
        val reader = data.sparkSession.read.format("reftable")
          .option("path", opts.path).option("schema", ddl)
          .option("allowMissingColumns", opts.allowMissingColumns.toString)
        val cur = (if (opts.partitionColumns.nonEmpty)
          reader.option("partitionColumns", opts.partitionColumns.mkString(","))
        else reader).load()
        cur.select(storageNames.map(col).toIndexedSeq: _*).unionAll(aligned)
      }
    // layout options name OUTPUT fields; the payload carries storage names
    def storage(cols: Seq[String]): Seq[String] = cols.map(opts.storageColumn)
    if (opts.zorderBy.nonEmpty)
      VersionedTable.publishZOrdered(payload, opts.path, storage(opts.zorderBy), opts.clusterFiles)
    else if (opts.clusterBy.nonEmpty)
      VersionedTable.publishClustered(payload, opts.path, storage(opts.clusterBy), opts.clusterFiles)
    else if (opts.partitionColumns.nonEmpty)
      VersionedTable.publishPartitioned(payload, opts.path, opts.partitionColumns)
    else VersionedTable.publish(payload, opts.path)
    if (opts.categoricalStats.nonEmpty) {
      val resolved = SnapshotFiles.resolveDir(opts.path, None, conf)
      RefTableStats.augmentCategorical(
        data.sparkSession, resolved, storage(opts.categoricalStats))
    }
    ()
  }
}

/** V1 streaming sink: each complete-mode batch is published as a version —
  * `writeStream.format("reftable")` is now the sink-side of the loop the
  * source reads (a stream MAINTAINS a refreshable snapshot table, with the
  * same replay idempotency as [[VersionedTable.completeModePublisher]]).
  * Complete mode is required: append/update batches are deltas, and
  * publishing a delta as a table state would be silently wrong.
  */
class RefTableSink(
    opts: RefTableOptions, keepVersions: Int, partitionColumns: Seq[String])
    extends org.apache.spark.sql.execution.streaming.Sink {
  private val publish =
    VersionedTable.completeModePublisher(opts.path, keepVersions, partitionColumns)
  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    // the declared schema is the write contract, same as it is for reads;
    // a drifted stream must fail loudly, not publish a surprise layout
    val declared = opts.schema.fieldNames.toSeq
    if (data.columns.toSeq != declared)
      throw new IllegalStateException(
        s"reftable sink: batch columns ${data.columns.toSeq} do not match the " +
          s"declared schema $declared")
    val batch = org.apache.spark.sql.graft.DatasetBridge.rebatch(data)
    val stored = opts.rowField match {
      case Some(rf) => batch.withColumnRenamed(rf, opts.keyColumn.get)
      case None => batch
    }
    publish(stored, batchId)
  }
  override def toString: String = s"RefTableSink(${opts.path})"
}

class RefTableWriteBuilder(opts: RefTableOptions, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  // SaveMode.Overwrite / INSERT OVERWRITE arrive as truncate() on the
  // builder; the InsertableRelation flag covers older fallback call sites
  private var truncateAll = false
  override def truncate(): WriteBuilder = { truncateAll = true; this }
  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation = new InsertableRelation {
      override def insert(data: Dataset[Row], overwrite: Boolean): Unit =
        RefTableWrites.insert(opts, data, truncateAll || overwrite)
    }
  }
}
