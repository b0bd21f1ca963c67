package graft.sources.reftable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Options, Path}

/** The two atomic metadata operations the versioned-table commit protocol
  * actually needs, abstracted over what the storage can do — the same
  * factoring Delta Lake's LogStore uses: DATA files are the committer's
  * problem (object-store-safe committers exist independently); what the
  * TABLE protocol must own is (a) claiming a commit-log sequence exactly
  * once across concurrent writers and (b) refreshing small pointer/cache
  * files without a half-written read window.
  *
  * Two implementations:
  *
  *  - [[RenameCommit]] — POSIX/HDFS-class stores: claim by hard link
  *    (local, link(2) fails EEXIST) or rename-no-overwrite (HDFS
  *    namespace), overwrite by tmp + OVERWRITE rename. The historical
  *    behavior, and still the default for `file`/`hdfs` schemes.
  *  - [[ConditionalCommit]] — S3-class object stores, which have NEITHER
  *    atomic rename NOR hard links but DO have conditional writes
  *    (`If-None-Match: *` PUT — standard on S3, GCS and Azure): claim by
  *    conditional create of the final object, overwrite by plain PUT
  *    (whole-object visibility is the store's contract). No staging
  *    directory rename exists, so [[VersionedTable.publishVia]] stages
  *    IN PLACE under the final version-directory name — safe because
  *    visibility is governed by the commit-log claim, never by directory
  *    existence: an uncommitted version dir is exactly the same orphan
  *    state as a rename-mode publish that crashed between its staging
  *    rename and its claim, which the resolve/retention/vacuum paths
  *    already ignore.
  *
  * Selection: `graft.reftable.commit.primitive` = `rename` | `conditional`
  * in the Hadoop conf wins; otherwise object-store schemes (plus any in
  * `graft.reftable.commit.conditional.schemes`) default to conditional and
  * everything else to rename.
  *
  * Out of scope, by design: one-time quiesced migrations
  * ([[VersionedTable.adopt]]) and catalog RENAME TABLE still require a
  * rename-capable store, and the sharded-stats splice falls back to a
  * rename swap — all post-publish maintenance, never the commit path.
  */
sealed trait CommitPrimitive {
  def name: String

  /** Atomically create `dst` with exactly `content` iff `dst` does not
    * exist. True iff THIS caller created it — the primitive the commit
    * log's sequence claim (and CREATE TABLE's descriptor claim) rests on.
    */
  def putIfAbsent(dst: Path, content: Array[Byte], conf: Configuration): Boolean

  /** Replace (or create) `dst` with `content`, never observable
    * half-written by readers. Best-effort callers (pointer cache) swallow
    * failures themselves.
    */
  def overwrite(dst: Path, content: Array[Byte], conf: Configuration): Unit

  /** Whether the store renames a populated directory atomically into its
    * final name. False routes [[VersionedTable.publishVia]] to in-place
    * staging.
    */
  def atomicDirRename: Boolean
}

/** Rename/link-based primitive for POSIX and HDFS-class namespaces. */
object RenameCommit extends CommitPrimitive {
  val name = "rename"
  val atomicDirRename = true

  private def fc(conf: Configuration): FileContext = FileContext.getFileContext(conf)

  private def isLocal(p: Path): Boolean = {
    val s = p.toUri.getScheme
    s == null || s == "file"
  }

  /** Hard link on local POSIX (link(2) is atomic and fails EEXIST — the
    * local FileContext rename(NONE) and create(overwrite=false) are both
    * check-then-act and can silently replace a concurrent winner),
    * rename-no-overwrite elsewhere (atomic in the HDFS-class namespace).
    * The tmp sibling is consumed or deleted either way.
    */
  def putIfAbsent(dst: Path, content: Array[Byte], conf: Configuration): Boolean = {
    if (isLocal(dst)) {
      // all-NIO on the local scheme: the Hadoop create/delete calls this
      // path used to make fork subprocesses without native libhadoop
      // (see LocalFs) — ~16 ms per claim for two syscalls' worth of work
      val d = LocalFs.nio(dst)
      LocalFs.ensureParent(d)
      val tmp = d.resolveSibling(
        s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      java.nio.file.Files.write(tmp, content,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      val won = try {
        java.nio.file.Files.createLink(d, tmp)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      java.nio.file.Files.deleteIfExists(tmp)
      won
    } else {
      val fs = dst.getFileSystem(conf)
      val tmp = new Path(dst.getParent,
        s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      val out = fs.create(tmp, true)
      try out.write(content) finally out.close()
      try { fc(conf).rename(tmp, dst); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          fs.delete(tmp, false); false
      }
    }
  }

  /** Local scheme: NIO tmp + rename(2) — atomic replace, no forks (and no
    * delete-then-rename missing-file window, which the retry loop below
    * exists to paper over). Elsewhere: tmp + OVERWRITE rename, retried
    * briefly, then surfaced (best-effort callers catch).
    */
  def overwrite(dst: Path, content: Array[Byte], conf: Configuration): Unit = {
    if (isLocal(dst)) return LocalFs.overwriteAtomic(dst, content)
    val fs = dst.getFileSystem(conf)
    val tmp = new Path(dst.getParent, s".${dst.getName}.tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(content) finally out.close()
    var attempts = 0
    while (true) {
      try {
        fc(conf).rename(tmp, dst, Options.Rename.OVERWRITE)
        return
      } catch {
        case e: java.io.IOException =>
          attempts += 1
          if (attempts >= 10) { fs.delete(tmp, false); throw e }
          Thread.sleep(5L * attempts)
      }
    }
  }
}

/** Conditional-write primitive for stores without rename or links.
  *
  * The store contract is a conditional create: an attempt to create an
  * object that already exists must FAIL ATOMICALLY (S3 `If-None-Match: *`,
  * GCS `ifGenerationMatch=0`, Azure `If-None-Match`). Local `file` paths
  * implement it with `O_CREAT|O_EXCL` (`CREATE_NEW`) — truly atomic, used
  * when tests force this primitive onto a local root. Other schemes go
  * through `FileSystem.create(dst, overwrite = false)`, which the store's
  * Hadoop connector maps to its conditional write; a connector whose
  * non-overwrite create is check-then-act does NOT satisfy the contract
  * (use [[RenameCommit]] there if the namespace renames atomically).
  */
object ConditionalCommit extends CommitPrimitive {
  val name = "conditional"
  val atomicDirRename = false

  def putIfAbsent(dst: Path, content: Array[Byte], conf: Configuration): Boolean = {
    val scheme = dst.toUri.getScheme
    if (scheme == null || scheme == "file") {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(Option(dst.toUri.getPath).getOrElse(dst.toString)),
          content, java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      // a lost conditional write can surface at create OR at close (object
      // stores report the precondition failure at PUT completion — S3's
      // 412 arrives when the upload finishes)
      val fs = dst.getFileSystem(conf)
      try {
        val out = fs.create(dst, false)
        try out.write(content) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException if fs.exists(dst) => false
      }
    }
  }

  /** Plain whole-object PUT: atomic on object stores (their visibility
    * contract), which is the store class this primitive exists for. The
    * local fallback (tests forcing this primitive onto a file root) gets
    * the NIO atomic replace — a plain create-truncate would NOT model the
    * store's whole-object visibility.
    */
  def overwrite(dst: Path, content: Array[Byte], conf: Configuration): Unit = {
    val scheme = dst.toUri.getScheme
    if (scheme == null || scheme == "file") return LocalFs.overwriteAtomic(dst, content)
    val fs = dst.getFileSystem(conf)
    val out = fs.create(dst, true)
    try out.write(content) finally out.close()
  }
}

object CommitPrimitive {
  /** Hadoop conf key selecting the primitive: `rename` | `conditional`. */
  val ConfKey = "graft.reftable.commit.primitive"

  /** Comma-separated extra schemes to treat as conditional-write stores
    * (e.g. a vendor connector, or a test filesystem modeling one).
    */
  val ExtraSchemesKey = "graft.reftable.commit.conditional.schemes"

  /** Schemes whose stores have no atomic rename but do have conditional
    * writes — they default to [[ConditionalCommit]] without configuration.
    */
  private val ConditionalSchemes =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "oss", "cos", "wasb", "wasbs")

  def forPath(p: Path, conf: Configuration): CommitPrimitive =
    conf.get(ConfKey, "") match {
      case RenameCommit.name => RenameCommit
      case ConditionalCommit.name => ConditionalCommit
      case "" =>
        val extra = conf.get(ExtraSchemesKey, "")
          .split(',').map(_.trim).filter(_.nonEmpty).toSet
        val scheme = Option(p.toUri.getScheme).getOrElse("file")
        if (ConditionalSchemes(scheme) || extra(scheme)) ConditionalCommit
        else RenameCommit
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be 'rename' or 'conditional', got '$other'")
    }
}
