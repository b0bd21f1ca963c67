package graft.sources.reftable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Idempotent landing-zone ingestion — the `COPY INTO` / Auto-Loader
  * batch shape: `CALL cat.system.ingest(table => 'db.t', source =>
  * '/landing/dir')` loads every data file in the source directory that
  * has not been loaded before, exactly once, through the table's declared
  * write gates. Re-running after new files land ingests only the delta;
  * re-running with nothing new is a no-op.
  *
  * File identity is `qualified-path:length` — a re-uploaded file with a
  * new length re-ingests (a changed file is new data); a byte-identical
  * re-upload under the same name is skipped.
  *
  * Exactly-once across crashes, with NO atomic multi-table commit
  * available, via log-first ordering over two versioned tables:
  *
  *  1. the ingest LOG (`<root>__ingest`, append-only rows
  *     `(seq, file, bytes)`) records the batch FIRST, under the replay
  *     marker `txn:ingest-log:<seq>`;
  *  2. the DATA lands second, under `txn:ingest:<seq>`.
  *
  * A crash between the two leaves `seq(log) > seq(data)` — the next call
  * detects it and completes the pending batch's data append before
  * ingesting anything new (the marker makes the completion replay-safe).
  * The failure mode is therefore always "logged but not yet loaded,
  * healed on the next call", never a silent duplicate load. Concurrent
  * callers serialize on the log append's marker: a caller that loses the
  * `seq` race re-reads the log and retries with the next seq.
  *
  * At 100 TB scale the call is O(new files) — the log read is the only
  * full-history cost and it is file METADATA (one tiny row per landed
  * file), never data bytes.
  */
object RefTableIngest {

  final case class Result(ingested: Int, recovered: Int, skipped: Int, seq: Long)

  private val LogSchema = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("file", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  /** The ingest-log sibling's options: append-only metadata rows, no
    * gates of its own, same retention as the table.
    */
  private def logOpts(opts: RefTableOptions): RefTableOptions =
    opts.copy(
      path = opts.path.stripSuffix("/") + "__ingest",
      schema = LogSchema,
      expectations = Nil, onViolation = "fail",
      partitionColumns = Nil, hiddenPartitions = Nil,
      zorderBy = Nil, clusterBy = Nil, bucketBy = Nil,
      rowField = None, keyColumn = None, columnMapping = Map.empty,
      categoricalStats = Nil, bloomStats = Nil,
      // the log's (seq, file, bytes) rows never carry the table's
      // generated columns — inheriting them would fail expr resolution
      generatedColumns = Nil)

  def ingest(spark: SparkSession, opts: RefTableOptions, source: String,
      format: String = "parquet"): Result = {
    require(Set("parquet", "orc", "json", "csv").contains(format),
      s"ingest: unsupported format '$format' (parquet, orc, json, csv)")
    val conf = new Configuration()
    val srcPath = new Path(source)
    val fs = srcPath.getFileSystem(conf)
    require(fs.exists(srcPath) && fs.getFileStatus(srcPath).isDirectory,
      s"ingest: source '$source' is not a directory")
    val qualified = fs.makeQualified(srcPath)
    // top-level, non-hidden data files (the landing-zone contract:
    // writers drop whole files; partial uploads use dot/underscore names)
    val listed = fs.listStatus(qualified).toIndexedSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s"${s.getPath.toString}:${s.getLen}", s.getPath.toString, s.getLen))
    val lo = logOpts(opts)

    def readLog(): Map[String, (Long, String)] =
      if (VersionedTable.resolve(lo.path, conf).isEmpty) Map.empty
      else spark.read.format("reftable")
        .option("path", lo.path).option("schema", LogSchema.toDDL).load()
        .collect()
        .map(r => (s"${r.getString(1)}:${r.getLong(2)}", (r.getLong(0), r.getString(1))))
        .toMap

    def readFiles(paths: Seq[String]) =
      spark.read.format(format).schema(opts.schema)
        .options(if (format == "csv") Map("header" -> "true") else Map.empty[String, String])
        .load(paths: _*)

    var attempt = 0
    while (true) {
      attempt += 1
      val logged = readLog()
      val sLog = if (logged.isEmpty) 0L else logged.values.map(_._1).max
      val sData = RefTableWrites.lastCommittedBatch(opts.path, "ingest", conf)
        .getOrElse(0L)
      // crash recovery: a logged batch whose data never landed — complete
      // it before anything new (the marker makes a replay a no-op)
      var recovered = 0
      if (sLog > sData) {
        val pending = logged.collect { case (_, (s, p)) if s == sLog => p }.toSeq
        val gone = pending.filterNot(p => fs.exists(new Path(p)))
        if (gone.nonEmpty) throw new IllegalStateException(
          s"ingest: logged batch $sLog was never loaded and its source file(s) " +
            s"${gone.mkString(", ")} are gone from the landing zone — data is " +
            "unrecoverable; restore the files or remove the log rows")
        RefTableWrites.appendVersion(opts, readFiles(pending),
          txn = Some(("ingest", sLog)))
        recovered = pending.size
      }
      val fresh = listed.filterNot { case (id, _, _) => logged.contains(id) }
      if (fresh.isEmpty)
        return Result(0, recovered, listed.size, math.max(sLog, sData))
      val seq = sLog + 1
      // LOG FIRST: the batch is durable before any data can land
      import spark.implicits._
      val logRows = fresh.map { case (_, p, b) => (seq, p, b) }
        .toDF("seq", "file", "bytes")
      RefTableWrites.appendVersion(lo, logRows, txn = Some(("ingest-log", seq)))
      // a concurrent caller may have won this seq's marker with a
      // DIFFERENT batch — confirm our files are the logged ones before
      // loading, else loop and take the next seq
      val after = readLog()
      val ours = fresh.forall { case (id, _, _) => after.get(id).exists(_._1 == seq) }
      if (ours) {
        RefTableWrites.appendVersion(opts, readFiles(fresh.map(_._2)),
          txn = Some(("ingest", seq)))
        return Result(fresh.size, recovered, listed.size - fresh.size, seq)
      }
      if (attempt >= 5) throw new IllegalStateException(
        "ingest: lost the log-append race 5 times; retry the call")
    }
    throw new IllegalStateException("unreachable")
  }
}
