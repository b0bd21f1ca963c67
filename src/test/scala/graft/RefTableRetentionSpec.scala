package graft

import java.nio.file.Files

import graft.sources.reftable.VersionedTable
import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Declared TIME-based retention (`retainFor '<duration>'`, the
  * reference's duration grammar): every retention pass — publish-time
  * pruning and vacuum — keeps versions younger than the window on top of
  * the `keepVersions` count floor; removing the declaration reverts to
  * count-only.
  */
class RefTableRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()

  private def write(root: String, retain: Option[String], n: Long): Unit = {
    import spark.implicits._
    val w = Seq((n, n)).toDF("id", "v").write.format("reftable")
      .option("path", root).option("schema", "id BIGINT, v BIGINT")
      .option("keepVersions", "2")
    retain.fold(w)(r => w.option("retainFor", r)).mode("append").save()
  }

  test("retainFor keeps every version inside the window beyond the count floor") {
    val root = Files.createTempDirectory("graft_retain1").toString + "/t"
    (1L to 5L).foreach(i => write(root, Some("1h"), i))
    // keepVersions=2 would leave 2 commits; the 1h window keeps all 5
    assert(VersionedTable.commitLog(root, conf).size == 5)
    // vacuum honors the same window
    VersionedTable.vacuum(root, keepVersions = 2)
    assert(VersionedTable.commitLog(root, conf).size == 5)
    // every retained version still reads (bytes protected, not just commits)
    val v1 = VersionedTable.commitLog(root, conf).head.version
    assert(spark.read.format("reftable").option("path", root)
      .option("schema", "id BIGINT, v BIGINT").option("version", v1).load().count() == 1)
  }

  test("an expired window prunes to the count floor; undeclaring reverts to count-only") {
    val root = Files.createTempDirectory("graft_retain2").toString + "/t"
    (1L to 4L).foreach(i => write(root, Some("1s"), i))
    Thread.sleep(1500)
    write(root, Some("1s"), 5L) // this publish's retention pass sees all expired
    val after = VersionedTable.commitLog(root, conf).size
    assert(after <= 3, s"expired window must prune to the count floor, kept $after")

    // undeclare: marker removed -> plain keepVersions pruning
    val rp = new org.apache.hadoop.fs.Path(root, VersionedTable.RetentionDecl)
    assert(rp.getFileSystem(conf).exists(rp))
    rp.getFileSystem(conf).delete(rp, false)
    write(root, None, 6L)
    assert(VersionedTable.commitLog(root, conf).size == 2)
  }

  test("declared on the catalog surface; bad duration literals refuse at CREATE") {
    val wh = Files.createTempDirectory("graft_retain3").toString
    val cat = "graftret_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT) USING reftable " +
      "OPTIONS (retainFor '2h', keepVersions '2')")
    val root = s"$wh/db/t"
    assert(VersionedTable.declaredRetentionMs(root, conf).contains(2L * 3600 * 1000))
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO $cat.db.t VALUES ($i)"))
    assert(VersionedTable.commitLog(root, conf).size == 4)

    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.bad (id BIGINT) USING reftable " +
        "OPTIONS (retainFor 'soon')")
    }
    assert(e.getMessage.contains("retainFor"), e.getMessage)

    // ALTER away the declaration: the marker goes, pruning reverts
    spark.sql(s"ALTER TABLE $cat.db.t UNSET TBLPROPERTIES('option.retainFor')")
    assert(VersionedTable.declaredRetentionMs(root, conf).isEmpty)
    spark.sql(s"INSERT INTO $cat.db.t VALUES (5)")
    assert(VersionedTable.commitLog(root, conf).size == 2)
  }
}
