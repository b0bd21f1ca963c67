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
  val Pointer = "_CURRENT"

  private def fc(conf: Configuration): FileContext = FileContext.getFileContext(conf)

  /** The version directory the pointer currently names, if `root` is a
    * versioned table root.
    */
  def resolve(root: String, conf: Configuration = new Configuration()): Option[String] = {
    val ptr = new Path(root, Pointer)
    val fs = ptr.getFileSystem(conf)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
      if (name.isEmpty) None else Some(new Path(root, name).toString)
    }
  }

  /** Publish `df` as the next version of the table at `root`: write the
    * complete version directory, atomically swap the pointer, prune old
    * versions beyond `keepVersions`. Returns the new version name.
    */
  def publish(df: DataFrame, root: String, keepVersions: Int = 3): String = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val conf = new Configuration()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    fs.mkdirs(rootPath)
    // monotonic version names even under clock ties: bump past the max
    val existing = versionDirs(root, conf)
    val next = math.max(System.currentTimeMillis(),
      existing.lastOption.map(versionNum(_) + 1).getOrElse(0L))
    val name = f"v$next%019d"
    df.write.parquet(new Path(rootPath, name).toString)
    // atomic pointer swap: write a temp file, rename over _CURRENT
    val tmp = new Path(rootPath, s"._CURRENT.tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(name.getBytes("UTF-8")) finally out.close()
    fc(conf).rename(tmp, new Path(rootPath, Pointer), Options.Rename.OVERWRITE)
    // prune: oldest first, never the just-published current
    val prunable = versionDirs(root, conf).filterNot(_ == name)
    prunable.dropRight(keepVersions - 1).foreach { old =>
      fs.delete(new Path(rootPath, old), true)
    }
    name
  }

  private def versionNum(name: String): Long = name.stripPrefix("v").toLong

  /** Version directory names under `root`, oldest first. */
  def versionDirs(root: String, conf: Configuration = new Configuration()): Seq[String] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toIndexedSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{19}"))
      .map(_.getPath.getName).sorted
  }
}
