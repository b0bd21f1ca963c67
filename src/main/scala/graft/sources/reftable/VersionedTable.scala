package graft.sources.reftable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.DataFrame

/** Snapshot isolation for refreshable tables on plain file storage.
  *
  * A bare parquet directory has no isolation: `mode("overwrite")` deletes
  * files a pinned generation listing may still be reading (the reference
  * got isolation from CDAP Table transactions; files give us none). This
  * layer supplies it with the standard versioned-directory pattern:
  *
  * {{{
  *   root/
  *     _CURRENT           <- pointer file, atomically replaced (rename)
  *     v00000000000000001/ ... parquet files of version 1
  *     v00000000000000002/ ... parquet files of version 2
  * }}}
  *
  * Writers publish a complete new version directory and then swap the
  * pointer with an atomic rename — readers resolve the pointer once per
  * listing and see either the old or the new version, never a mix.
  * Old versions are retained (`keepVersions`) so generations pinned by
  * running streams stay readable until their snapshot is committed;
  * pruning deletes oldest-first and never the current version.
  *
  * [[SnapshotFiles.list]] resolves the pointer transparently, so a
  * versioned root works everywhere a plain directory does (batch scans,
  * streaming generations, partitioned layouts inside the version dir).
  */
object VersionedTable {
  /** Pointer file name. ON-DISK FORMAT: line 1 is the current version
    * directory name; an optional line 2 is a publish marker (see
    * [[completeModePublisher]]). External tooling reading `_CURRENT`
    * must take the FIRST line only.
    */
  val Pointer = "_CURRENT"

  private def fc(conf: Configuration): FileContext = FileContext.getFileContext(conf)

  /** The version directory the pointer currently names, if `root` is a
    * versioned table root. One filesystem call: open the pointer directly
    * and treat file-not-found as "not a versioned root" (an exists-probe
    * first would double the RPCs on every listing of every table).
    */
  def resolve(root: String, conf: Configuration = new Configuration()): Option[String] =
    pointerLines(root, conf).flatMap(_.headOption.filter(_.nonEmpty))
      .map(name => new Path(root, name).toString)

  /** The publish marker recorded with the current pointer, if any — used
    * by [[completeModePublisher]] for replay idempotency.
    */
  def publishedMarker(root: String, conf: Configuration = new Configuration()): Option[String] =
    pointerLines(root, conf).flatMap(_.lift(1)).filter(_.nonEmpty)

  /** Pointer file content as lines: line 1 = version name, optional
    * line 2 = publish marker. Both written in ONE atomic rename, so the
    * marker can never disagree with the version it was published with.
    *
    * Retries on ChecksumException: the LOCAL ChecksumFs moves a file and
    * its .crc sidecar in two steps during the pointer swap, so a reader
    * racing a publisher can transiently see new bytes under the old
    * checksum. HDFS/object-store renames don't have the window; on local
    * storage the state settles within one swap, so a short retry is
    * correct rather than papering over real corruption (it rethrows after
    * 10 attempts).
    */
  private def pointerLines(root: String, conf: Configuration): Option[Seq[String]] = {
    val ptr = new Path(root, Pointer)
    val fs = ptr.getFileSystem(conf)
    var attempts = 0
    while (true) {
      try {
        val in = try fs.open(ptr)
        catch { case _: java.io.FileNotFoundException => return None }
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        return Some(text.split('\n').toIndexedSeq.map(_.trim))
      } catch {
        case e: org.apache.hadoop.fs.ChecksumException =>
          attempts += 1
          if (attempts >= 10) throw e
          Thread.sleep(5L * attempts)
      }
    }
    None // unreachable
  }

  /** Publish `df` as the next version of the table at `root`: write the
    * complete version directory (staged, then renamed into place),
    * atomically swap the pointer, prune old versions beyond
    * `keepVersions`. Returns the new version name.
    *
    * `keepVersions` counts the current version, so the minimum of 2
    * always retains the immediately-replaced version — a pinned reader of
    * the previous current must survive the publish, which is this layer's
    * whole purpose.
    *
    * Concurrent publishers are safe from corruption — version names carry
    * a unique suffix, so no two writers ever share a directory, and a
    * failed write leaves only an ignored staging dir — but the pointer is
    * last-writer-wins: coordinate writers if "latest" must be a total
    * order.
    */
  def publish(df: DataFrame, root: String, keepVersions: Int = 3): String =
    publishInternal(df, root, keepVersions, Nil)

  /** As [[publish]], writing a Hive-partitioned layout inside the version
    * directory (readers declare the matching `partitionColumns` option).
    */
  def publishPartitioned(
      df: DataFrame, root: String, partitionColumns: Seq[String],
      keepVersions: Int = 3): String =
    publishInternal(df, root, keepVersions, partitionColumns)

  /** Publish with a range-clustered layout: rows range-partitioned and
    * sorted on `clusterCols` across `numFiles` files. Each file then covers
    * a tight, near-disjoint [min,max] on the cluster key, which is what
    * makes the published `_STATS.json` effective — a selective filter on
    * the key plans O(matching) files instead of O(files)
    * ([[RefTableStats]]). The sort also helps parquet row-group/page skips
    * and compression inside each file. This is the data-layout half of
    * data skipping; the manifest is the metadata half — every publish
    * writes one, but un-clustered layouts rarely have prunable bounds.
    */
  def publishClustered(
      df: DataFrame, root: String, clusterCols: Seq[String], numFiles: Int,
      keepVersions: Int = 3): String = {
    require(clusterCols.nonEmpty, "publishClustered needs at least one cluster column")
    require(numFiles > 0, "numFiles must be positive")
    val cols = clusterCols.map(df.col)
    publishInternal(
      df.repartitionByRange(numFiles, cols: _*).sortWithinPartitions(cols: _*),
      root, keepVersions, Nil)
  }

  /** Publish clustered on the z-order (Morton) curve over `zCols` instead
    * of lexicographically: every file then covers a bounded window in EACH
    * clustered dimension, so the stats manifest prunes selective filters
    * on any of them — the multi-column layout [[publishClustered]] cannot
    * give (its trailing columns get no locality). See [[ZOrder]].
    */
  def publishZOrdered(
      df: DataFrame, root: String, zCols: Seq[String], numFiles: Int,
      keepVersions: Int = 3): String = {
    require(numFiles > 0, "numFiles must be positive")
    val zc = "__graft_z"
    val staged = df.withColumn(zc, ZOrder.zColumn(df, zCols))
    publishInternal(
      staged.repartitionByRange(numFiles, staged(zc)).sortWithinPartitions(zc).drop(zc),
      root, keepVersions, Nil)
  }

  /** Bare snapshot data directly under a would-be root: loose parquet
    * files or non-version, non-hidden subdirectories (a Hive layout).
    * Creating a pointer next to such data would not corrupt it — but every
    * reader of the root would silently stop seeing it, which is as wrong
    * as deleting it. First publishes refuse; [[adopt]] migrates.
    */
  private def bareEntries(rootPath: Path, fs: org.apache.hadoop.fs.FileSystem): Seq[Path] =
    fs.listStatus(rootPath).toIndexedSeq.filter { s =>
      val n = s.getPath.getName
      (s.isFile && n.endsWith(".parquet")) ||
        (s.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
          !n.matches("v\\d{19}_[0-9a-f]{8}"))
    }.map(_.getPath)

  private def publishInternal(
      df: DataFrame, root: String, keepVersions: Int, partitionColumns: Seq[String],
      marker: Option[String] = None): String =
    publishVia(root, keepVersions, marker) { staging =>
      writeParquetMicros(df, staging.toString, partitionColumns)
    }

  /** Write `df` as parquet with timestamps as INT64 micros, not Spark's
    * default INT96: micros are the modern standard (what Delta/Iceberg
    * write), and their footer min/max are exact integers the skipping
    * manifest can record — INT96 stats are untrustworthy and would leave
    * timestamp filters unprunable. Session conf is the only switch parquet
    * exposes, so set and restore around the write.
    */
  private[reftable] def writeParquetMicros(
      df: DataFrame, dir: String, partitionColumns: Seq[String] = Nil): Unit = {
    val tsConfKey = "spark.sql.parquet.outputTimestampType"
    val spark = df.sparkSession
    val prevTs = spark.conf.getOption(tsConfKey)
    spark.conf.set(tsConfKey, "TIMESTAMP_MICROS")
    try {
      val writer = df.write
      (if (partitionColumns.isEmpty) writer else writer.partitionBy(partitionColumns: _*))
        .parquet(dir)
    } finally prevTs match {
      case Some(v) => spark.conf.set(tsConfKey, v)
      case None => spark.conf.unset(tsConfKey)
    }
  }

  /** The publish protocol around an arbitrary staging populate step —
    * shared by DataFrame publishes and the file-granular copy-on-write
    * mutations ([[RefTableMutations]]), which stage a mix of rewritten and
    * carried-over files.
    */
  private[reftable] def publishVia(
      root: String, keepVersions: Int, marker: Option[String] = None)(
      populate: Path => Unit): String = {
    require(keepVersions >= 2,
      "keepVersions must be >= 2: retaining only the current version would delete " +
        "the previous one under readers still pinned to it")
    val conf = new Configuration()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (resolve(root, conf).isEmpty && fs.exists(rootPath) && bareEntries(rootPath, fs).nonEmpty)
      throw new IllegalStateException(
        s"$root holds bare snapshot data without a $Pointer pointer; publishing would " +
          "shadow it for every reader of the root. Run VersionedTable.adopt(root) once " +
          "(with readers quiesced) to migrate it into version form, or target a fresh dir.")
    fs.mkdirs(rootPath)
    // monotonic version names even under clock ties: bump past the max;
    // the random suffix keeps concurrent publishers out of each other's
    // directories
    val existing = versionDirs(root, conf)
    val next = math.max(System.currentTimeMillis(),
      existing.lastOption.map(versionNum(_) + 1).getOrElse(0L))
    val name = f"v$next%019d" + "_" + java.util.UUID.randomUUID().toString.take(8)
    // stage, then rename: a crashed write leaves a .staging dir that
    // versionDirs ignores, never a half-written version counted by
    // retention
    val staging = new Path(rootPath, s".staging-$name")
    populate(staging)
    // the statistics manifest is written into the staging dir, so the
    // version rename publishes data and stats as one atomic unit and the
    // manifest's relative file keys stay valid after the rename
    RefTableStats.writeManifest(staging.toString, conf)
    fc(conf).rename(staging, new Path(rootPath, name))
    // atomic pointer swap: write a temp file, rename over _CURRENT
    // (the optional marker rides the same rename — see pointerLines)
    swapPointer(rootPath, fs, conf, name + marker.fold("")("\n" + _))
    // prune: oldest first, never the just-published current, and never the
    // version _CURRENT names right now — a slow concurrent publisher may
    // have swapped the pointer to an older name after our swap, and
    // deleting its target would break readers until the next publish
    val pointed = resolve(root, conf).map(p => new Path(p).getName)
    val prunable = versionDirs(root, conf).filterNot(v => v == name || pointed.contains(v))
    prunable.dropRight(keepVersions - 1).foreach { old =>
      fs.delete(new Path(rootPath, old), true)
    }
    name
  }

  /** Compact the current version into ~`targetFileBytes` files and publish
    * the result as a new version. Small-file explosion is the classic
    * slow death of a frequently-refreshed table (every listing, footer
    * read and task launch scales with file count); with versioned roots,
    * compaction is just another publish — readers pinned to the
    * fragmented version keep draining it, new generations get the
    * compacted one.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, root: String,
      targetFileBytes: Long = 128L * 1024 * 1024, keepVersions: Int = 3,
      partitionColumns: Seq[String] = Nil): String = {
    val conf = new Configuration()
    val current = resolve(root, conf).getOrElse(
      throw new IllegalArgumentException(s"$root is not a versioned table root"))
    val bytes = SnapshotFiles.list(current, partitionColumns).map(_.length).sum
    val parts = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // Hive-partitioned versions must be compacted AS partitioned — a flat
    // rewrite would brick readers declaring partitionColumns. Partition
    // type INFERENCE must be off for the read: it would re-type
    // numeric-looking string values (bucket=007 → bucket=7) and rewrite
    // the directory names, silently changing what readers decode. The
    // conf is scoped to a child session (own SQLConf, shared context) so
    // concurrent queries on the caller's session are untouched.
    val df =
      if (partitionColumns.isEmpty) spark.read.parquet(current)
      else {
        // newSession() starts from SparkConf defaults, NOT the caller's
        // runtime SQL confs — copy them over (timezone, parquet write
        // options, …) before overriding the one key being scoped, or the
        // compacted rewrite silently diverges from directly-published
        // versions
        val scoped = spark.newSession()
        spark.conf.getAll.foreach { case (k, v) =>
          try scoped.conf.set(k, v)
          catch { case scala.util.control.NonFatal(_) => () } // static confs
        }
        scoped.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        scoped.read.parquet(current)
      }
    val compacted =
      if (partitionColumns.isEmpty) df.repartition(parts)
      else df.repartition(parts,
        partitionColumns.map(org.apache.spark.sql.functions.col): _*)
    publishInternal(compacted, root, keepVersions, partitionColumns)
  }

  /** Version history of the table — the DESCRIBE HISTORY analogue,
    * metadata-only: file counts and bytes come from the retained listings,
    * row counts from each version's stats manifest (null for a version
    * that predates manifests, never guessed). Zero data pages read.
    */
  def history(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val conf = new Configuration()
    val current = resolve(root, conf).map(p => new Path(p).getName)
    versionDirs(root, conf).zipWithIndex.map { case (name, i) =>
      val dir = new Path(root, name).toString
      val files = SnapshotFiles.list(dir)
      val nRows: Option[Long] = RefTableStats.load(dir, conf).map(_.values.map(_.rows).sum)
      (i, name, files.size, files.map(_.length).sum, nRows, current.contains(name))
    }.toDF("version_idx", "version", "n_files", "bytes", "n_rows", "is_current")
  }

  /** Explicit retention pass: delete versions beyond `keepVersions`
    * without publishing anything — the vacuum for tables whose writers
    * retain generously (publish-time pruning already runs with each
    * publish). Oldest first; never the pointer's current target. Returns
    * the deleted version names.
    */
  def vacuum(root: String, keepVersions: Int = 3): Seq[String] = {
    require(keepVersions >= 2,
      "keepVersions must be >= 2: retaining only the current version would delete " +
        "the previous one under readers still pinned to it")
    val conf = new Configuration()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    val pointed = resolve(root, conf).map(p => new Path(p).getName)
    val prunable = versionDirs(root, conf).filterNot(pointed.contains)
    val doomed = prunable.dropRight(keepVersions - 1)
    doomed.foreach(old => fs.delete(new Path(rootPath, old), true))
    doomed
  }

  /** Key-level changes (insert/delete/update) from `fromVersion` to the
    * current version — a changefeed between retained versions, composing
    * the versioned layer with [[graft.operators.SnapshotDiff]]: one
    * key-shuffle join, no storage changelog needed.
    */
  def changes(
      spark: org.apache.spark.sql.SparkSession, root: String,
      keyCols: Seq[String], fromVersion: String): org.apache.spark.sql.DataFrame = {
    val conf = new Configuration()
    val current = resolve(root, conf).getOrElse(
      throw new IllegalArgumentException(s"$root is not a versioned table root"))
    val from = new Path(root, fromVersion).toString
    graft.operators.SnapshotDiff.diff(
      spark.read.parquet(from), spark.read.parquet(current), keyCols)
  }

  /** As [[changes]], with both row images per value column
    * ([[graft.operators.SnapshotDiff.diffImages]]) — the input shape
    * [[graft.operators.IncrementalAgg.maintain]] needs, so an aggregate
    * over a versioned table can be advanced version-to-version for
    * O(changes) instead of recomputed for O(table).
    */
  def changesImages(
      spark: org.apache.spark.sql.SparkSession, root: String,
      keyCols: Seq[String], fromVersion: String): org.apache.spark.sql.DataFrame = {
    val conf = new Configuration()
    val current = resolve(root, conf).getOrElse(
      throw new IllegalArgumentException(s"$root is not a versioned table root"))
    val from = new Path(root, fromVersion).toString
    graft.operators.SnapshotDiff.diffImages(
      spark.read.parquet(from), spark.read.parquet(current), keyCols)
  }

  /** foreachBatch sink that publishes each micro-batch as a new version —
    * for COMPLETE-mode aggregation streams, where every batch is the full
    * current result, this closes the reference's loop end to end: a
    * stream maintains a refreshable snapshot table that the reftable
    * source (and its changefeeds) consume with snapshot isolation.
    * Append/update-mode batches are deltas, not snapshots — publishing
    * them as table states would be wrong, hence the name.
    */
  def completeModePublisher(
      root: String, keepVersions: Int = 3,
      partitionColumns: Seq[String] = Nil): (DataFrame, Long) => Unit = {
    // foreachBatch is at-least-once: a replayed batch must not publish a
    // duplicate version (it would burn a retention slot and could prune a
    // version a pinned reader still needs). The marker rides the
    // pointer's atomic rename, so marker and version can't diverge. It is
    // scoped to THIS publisher instance: a bare batch id would wrongly
    // skip batch 0 of a stream restarted with a fresh checkpoint (ids
    // reset), silently freezing the table — a new instance re-publishing
    // one replayed batch after a driver restart is the safer failure.
    // CONTRACT: create one publisher per query; sharing the returned
    // function across two queries on the same root would make their
    // batch ids collide and silently skip publishes.
    val instance = java.util.UUID.randomUUID().toString.take(8)
    (batch, batchId) => {
      val m = s"$instance:$batchId"
      if (!publishedMarker(root).contains(m)) {
        publishInternal(batch, root, keepVersions, partitionColumns, marker = Some(m))
      }
      ()
    }
  }

  /** One-time migration of a bare snapshot directory into a versioned
    * root: the existing files / Hive partition dirs are RENAMED into a
    * first version directory and the pointer is written. Run with readers
    * quiesced — mid-adoption a reader of the bare root could see a partial
    * listing (this is the one transition the pointer can't make atomic,
    * which is why it is an explicit operation and not an implicit side
    * effect of publishing). Returns the created version name.
    */
  def adopt(root: String): String = {
    val conf = new Configuration()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    require(resolve(root, conf).isEmpty, s"$root is already a versioned table root")
    val entries = if (fs.exists(rootPath)) bareEntries(rootPath, fs) else Nil
    require(entries.nonEmpty, s"$root has no bare snapshot data to adopt")
    val name = f"v${System.currentTimeMillis()}%019d" + "_" +
      java.util.UUID.randomUUID().toString.take(8)
    val versionDir = new Path(rootPath, name)
    fs.mkdirs(versionDir)
    entries.foreach(e => fc(conf).rename(e, new Path(versionDir, e.getName)))
    swapPointer(rootPath, rootPath.getFileSystem(conf), conf, name)
    name
  }

  /** Replace `_CURRENT` with `content` via tmp-file + rename. HDFS and
    * most object stores make the OVERWRITE rename atomic; the LOCAL
    * ChecksumFs implements it as delete-then-rename, so two concurrent
    * swappers can collide on FileAlreadyExistsException — caught and
    * retried, which preserves the documented last-writer-wins contract
    * (readers see one complete pointer or the other throughout; the race
    * spec drives six concurrent publishers through this path).
    */
  private def swapPointer(
      rootPath: Path, fs: org.apache.hadoop.fs.FileSystem, conf: Configuration,
      content: String): Unit = {
    val tmp = new Path(rootPath, s"._CURRENT.tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    var attempts = 0
    var done = false
    while (!done) {
      try {
        fc(conf).rename(tmp, new Path(rootPath, Pointer), Options.Rename.OVERWRITE)
        done = true
      } catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          attempts += 1
          if (attempts >= 10) throw e
          Thread.sleep(5L * attempts)
      }
    }
  }

  private def versionNum(name: String): Long = name.drop(1).take(19).toLong

  /** Publish time (epoch millis) embedded in a version directory name —
    * monotonic across publishes (a clock tie bumps past the max), which is
    * what makes TIMESTAMP AS OF resolution a pure name comparison.
    */
  def versionTimestampMs(name: String): Long = versionNum(name)

  /** Version directory names under `root`, oldest first. */
  def versionDirs(root: String, conf: Configuration = new Configuration()): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{19}_[0-9a-f]{8}"))
      .map(_.getPath.getName).sorted
  }
}
