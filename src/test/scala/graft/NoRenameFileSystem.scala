package graft

import java.io.IOException
import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** A Hadoop filesystem modeling an S3-class object store's semantics over
  * local disk, for proving the commit protocol needs neither atomic rename
  * nor hard links:
  *
  *  - `rename` THROWS — except when the SOURCE is inside a Spark
  *    committer's `_temporary` tree. Data-file commit is the committer's
  *    problem (real deployments use multipart-upload committers that never
  *    rename); the local stand-in lets `FileOutputCommitter` do its
  *    internal mechanics while the TABLE protocol — commit-log claims,
  *    version publish, pointer cache, stats manifests — gets no rename at
  *    all. Hard links never reach this layer (java.nio on `file` paths
  *    only), so a protocol that links would fail on scheme mismatch.
  *  - `create(..., overwrite = false)` is ATOMIC (`O_CREAT|O_EXCL`),
  *    modeling the store's conditional write (`If-None-Match: *` PUT) —
  *    the primitive [[graft.sources.reftable.ConditionalCommit]] claims
  *    through.
  *
  * Registered as scheme `noren` via `src/test/resources/core-site.xml`,
  * which also lists `noren` in
  * `graft.reftable.commit.conditional.schemes` so roots on it select the
  * conditional primitive.
  */
class NoRenameFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("noren:///")

  private def underTemporary(p: Path): Boolean =
    p.toUri.getPath.contains("/_temporary/")

  override def rename(src: Path, dst: Path): Boolean = {
    if (!underTemporary(src))
      throw new IOException(
        s"NoRenameFileSystem refuses rename($src, $dst): object stores have no atomic rename")
    super.rename(src, dst)
  }

  // NOTE: the non-permission overload is the one FileSystem.create(f,
  // overwrite) actually reaches on RawLocalFileSystem (the permission
  // variant delegates TO it), so the conditional-PUT model lives here
  override def create(
      f: Path, overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    if (overwrite) return super.create(f, true, bufferSize, replication, blockSize, progress)
    // conditional write with OBJECT-PUT visibility: the object appears
    // complete-or-not-at-all, and a lost `If-None-Match` race surfaces at
    // PUT completion (close), exactly like S3's 412. Bytes buffer until
    // close, then an atomic link exposes them — the link is this model
    // store's INTERNAL mechanism (AWS's implementation is equally opaque);
    // the protocol under test never gets to request a link or rename.
    val local = java.nio.file.Paths.get(f.toUri.getPath)
    Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
    if (java.nio.file.Files.exists(local)) // advisory fast-fail; close re-checks atomically
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(s"$f already exists")
    val buf = new java.io.ByteArrayOutputStream()
    val stream = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      private var closed = false
      override def close(): Unit = {
        if (closed) return
        closed = true
        val shadow = local.resolveSibling(
          s".put-${java.util.UUID.randomUUID().toString.take(12)}")
        java.nio.file.Files.write(shadow, buf.toByteArray)
        try java.nio.file.Files.createLink(local, shadow)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            java.nio.file.Files.deleteIfExists(shadow)
            throw new org.apache.hadoop.fs.FileAlreadyExistsException(
              s"$f already exists (conditional PUT lost the race)")
        }
        java.nio.file.Files.deleteIfExists(shadow)
      }
    }
    new FSDataOutputStream(stream, statistics)
  }
}
