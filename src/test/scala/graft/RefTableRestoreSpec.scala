package graft

import java.nio.file.Files

import graft.sources.reftable._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RESTORE ([[VersionedTable.restore]]): rollback to an earlier committed
  * version must (a) read exactly that version's content, (b) be
  * metadata-only — the new version directory stages ZERO data files, only
  * a `_FILES.json` referencing the target wholesale, (c) preserve history
  * (rollback is a new commit, the superseded versions stay in the log),
  * and (d) keep the referenced version's bytes alive under later
  * retention (manifest-chain protection). Surface: programmatic +
  * `CALL cat.system.restore`.
  */
class RefTableRestoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()

  private def tmpDir(name: String): String =
    Files.createTempDirectory(s"graft_restore_$name").toString

  private def readCurrent(root: String): org.apache.spark.sql.DataFrame = {
    val files = SnapshotFiles.list(root, Nil, None)
    spark.read.parquet(files.map(_.path): _*)
  }

  test("restore re-publishes the old content via a zero-data-file commit") {
    val root = tmpDir("basic")
    import spark.implicits._
    val v1 = VersionedTable.publish((1L to 100L).toDF("id"), root)
    RefTableMutations.deleteWhere(spark, root, col("id") > 10)
    assert(readCurrent(root).count() == 10)

    val restored = VersionedTable.restore(root, v1)
    assert(restored != v1, "rollback must be a NEW commit, not a pointer rewind")
    assert(readCurrent(root).as[Long].collect().sorted.toSeq == (1L to 100L))

    // metadata-only: the restore version dir holds no parquet at all
    val dir = new java.io.File(root, restored)
    val staged = Option(dir.listFiles()).toSeq.flatten.map(_.getName)
    assert(staged.exists(_ == RefTableFileManifest.ManifestName))
    assert(!staged.exists(_.endsWith(".parquet")),
      s"restore staged data files: $staged")

    // history preserved: publish, delete, restore = 3 commits, marker set
    val log = VersionedTable.commitLog(root)
    assert(log.size == 3)
    assert(log.last.marker.exists(_ == s"restore=$v1"))
  }

  test("restore to an unknown version refuses") {
    val root = tmpDir("unknown")
    import spark.implicits._
    VersionedTable.publish((1L to 5L).toDF("id"), root)
    val e = intercept[IllegalArgumentException](
      VersionedTable.restore(root, "v0000000000000000000_deadbeef"))
    assert(e.getMessage.contains("not a committed version"))
  }

  test("restore to the current version is a no-op returning it") {
    val root = tmpDir("noop")
    import spark.implicits._
    val v1 = VersionedTable.publish((1L to 5L).toDF("id"), root)
    assert(VersionedTable.restore(root, v1) == v1)
    assert(VersionedTable.commitLog(root).size == 1)
  }

  test("restore to a manifest-referenced (mutated) version resolves its chain") {
    val root = tmpDir("chain")
    import spark.implicits._
    VersionedTable.publish((1L to 100L).toDF("id"), root)
    val v2 = RefTableMutations.deleteWhere(spark, root, col("id") % 2 === 0)
    RefTableMutations.deleteWhere(spark, root, col("id") > 50)
    assert(readCurrent(root).count() == 25)

    VersionedTable.restore(root, v2)
    assert(readCurrent(root).as[Long].collect().sorted.toSeq ==
      (1L to 100L).filter(_ % 2 == 1))
  }

  test("restore to a version already outside the retained window refuses") {
    val root = tmpDir("expired")
    import spark.implicits._
    val v1 = VersionedTable.publish((1L to 50L).toDF("id"), root)
    (1 to 3).foreach(i => VersionedTable.publish(Seq(i.toLong).toDF("id"), root))
    // keepVersions=3 already pruned v1's commit — restoring to an
    // uncommitted state must refuse, not resurrect whatever bytes remain
    val e = intercept[IllegalArgumentException](VersionedTable.restore(root, v1))
    assert(e.getMessage.contains("not a committed version"))
  }

  test("retention keeps the restored-to version's bytes alive past its own commit") {
    val root = tmpDir("retention")
    import spark.implicits._
    val v1 = VersionedTable.publish((1L to 50L).toDF("id"), root)
    VersionedTable.publish(Seq(-1L).toDF("id"), root)
    val v3 = VersionedTable.restore(root, v1, keepVersions = 3)
    // two more publishes expire v1's and v2's own commits (retained:
    // restore, v4, v5) — but the retained restore version references v1's
    // files, so its directory must survive retention AND vacuum
    VersionedTable.publish(Seq(-2L).toDF("id"), root)
    VersionedTable.publish(Seq(-3L).toDF("id"), root)
    VersionedTable.vacuum(root, keepVersions = 3)
    val files = SnapshotFiles.list(root, Nil, Some(v3))
    assert(spark.read.parquet(files.map(_.path): _*)
      .as[Long].collect().sorted.toSeq == (1L to 50L))
  }

  test("time-based retention: vacuumOlderThan drops old states, keeps a minimum") {
    val root = tmpDir("timedvac")
    import spark.implicits._
    (1 to 5).foreach(i =>
      VersionedTable.publish(Seq(i.toLong).toDF("id"), root, keepVersions = 10))
    val committed = VersionedTable.committedVersionDirs(root)
    assert(committed.size == 5)
    // cutoff younger than everything: ALL states are old, but minKeep
    // floors the deletion — a quiet table never vacuums to one version
    val removedAll = VersionedTable.vacuumOlderThan(root, Long.MaxValue, minKeep = 2)
    assert(VersionedTable.committedVersionDirs(root).size == 2)
    assert(removedAll.nonEmpty)
    assert(readCurrent(root).as[Long].collect().toSeq == Seq(5L))
    // cutoff older than everything: nothing else removed
    assert(VersionedTable.vacuumOlderThan(root, 0L).isEmpty)
    assert(VersionedTable.committedVersionDirs(root).size == 2)
  }

  test("CALL system.restore rolls a catalog table back by version name") {
    val cat = "grestore"
    val wh = Files.createTempDirectory("graft_restore_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, s STRING) USING reftable")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1,'a'),(2,'b'),(3,'c')")
    val v1 = spark.sql(s"SELECT version FROM $cat.db.`t$$commits` ORDER BY seq LIMIT 1")
      .collect().head.getString(0)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id > 1")
    assert(spark.table(s"$cat.db.t").count() == 1)

    val out = spark.sql(
      s"CALL $cat.system.restore(table => 'db.t', version => '$v1')").collect()
    assert(out.length == 1 && out.head.getString(0).startsWith("v"))
    assert(spark.table(s"$cat.db.t").count() == 3)
    // the rollback shows in $commits with its marker
    val markers = spark.sql(s"SELECT marker FROM $cat.db.`t$$commits` ORDER BY seq")
      .collect().map(r => Option(r.getString(0)))
    assert(markers.last.exists(_ == s"restore=$v1"))
  }
}
