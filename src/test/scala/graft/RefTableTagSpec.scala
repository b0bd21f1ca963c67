package graft

import java.nio.file.Files

import graft.sources.reftable._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Named immutable version references ([[VersionedTable.tag]]): a tag pins
  * a committed version by name, `version=tag:<name>` reads it everywhere
  * `version` is accepted, and BOTH retention paths (publish-time pruning
  * and vacuum) must keep the tagged version — commit, directory, and
  * manifest-chain closure — alive until the tag is dropped. The Iceberg
  * tag shape: "the monthly snapshot we audit against", protected without
  * having to widen keepVersions for the whole table.
  */
class RefTableTagSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()

  private def tmpDir(name: String): String =
    Files.createTempDirectory(s"graft_tag_$name").toString

  private def readRef(root: String, schema: String, extra: Map[String, String] = Map.empty) = {
    var r = spark.read.format("reftable").option("path", root).option("schema", schema)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  private def ids(root: String, extra: Map[String, String] = Map.empty): Seq[Long] = {
    import spark.implicits._
    readRef(root, "id BIGINT", extra).as[Long].collect().sorted.toSeq
  }

  test("tag pins a version; version=tag:<name> reads it; vacuum keeps it alive") {
    val root = tmpDir("basic")
    import spark.implicits._
    VersionedTable.publish((1L to 100L).toDF("id"), root)
    val v1 = VersionedTable.tag(root, "baseline")
    assert(VersionedTable.tags(root).map(t => (t._1, t._2)) == Seq(("baseline", v1)))

    // four more publishes with keepVersions=2: untagged old versions are
    // pruned at publish time, the tagged one must survive
    (2 to 5).foreach(i => VersionedTable.publish((1L to i * 100L).toDF("id"), root, keepVersions = 2))
    assert(new java.io.File(root, v1).isDirectory, "publish-time retention deleted the tagged version")
    assert(ids(root, Map("version" -> "tag:baseline")) == (1L to 100L))
    assert(ids(root) == (1L to 500L))

    // explicit vacuum at minimum retention: tagged version still survives
    val deleted = VersionedTable.vacuum(root, keepVersions = 2)
    assert(!deleted.contains(v1), s"vacuum collected the tagged version: $deleted")
    assert(ids(root, Map("version" -> "tag:baseline")) == (1L to 100L))

    // drop the tag: the next vacuum collects it
    assert(VersionedTable.dropTag(root, "baseline"))
    val deleted2 = VersionedTable.vacuum(root, keepVersions = 2)
    assert(deleted2.contains(v1), s"vacuum kept the untagged version: $deleted2")
    val e = intercept[IllegalArgumentException](ids(root, Map("version" -> "tag:baseline")))
    assert(e.getMessage.contains("no tag"), e.getMessage)
  }

  test("tag protects a manifest-referenced (MoR) version's whole chain") {
    val root = tmpDir("mor")
    import spark.implicits._
    VersionedTable.publish((1L to 1000L).toDF("id").repartition(2), root)
    // MoR delete: the new version references the publish's data files
    RefTableMutations.deleteWhereMergeOnRead(spark, root, col("id") % 10 === 0)
    val v2 = VersionedTable.tag(root, "after-delete")
    (1 to 4).foreach(i =>
      VersionedTable.publish((1L to 50L).toDF("id"), root, keepVersions = 2))
    VersionedTable.vacuum(root, keepVersions = 2)
    // the tagged MoR version still reads: its own dir AND the hosting
    // data-file dir survived (manifest-chain protection from the tag)
    assert(ids(root, Map("version" -> s"tag:after-delete")) ==
      (1L to 1000L).filterNot(_ % 10 == 0))
    assert(v2.nonEmpty)
  }

  test("create-once semantics; explicit version; replace; validation") {
    val root = tmpDir("sem")
    import spark.implicits._
    VersionedTable.publish((1L to 10L).toDF("id"), root)
    val v1 = VersionedTable.resolve(root, conf).map(p => new org.apache.hadoop.fs.Path(p).getName).get
    VersionedTable.publish((1L to 20L).toDF("id"), root)

    VersionedTable.tag(root, "a", version = Some(v1))
    assert(ids(root, Map("version" -> "tag:a")) == (1L to 10L))
    // duplicate refused; replace moves it
    val dup = intercept[IllegalArgumentException](VersionedTable.tag(root, "a"))
    assert(dup.getMessage.contains("already exists"), dup.getMessage)
    VersionedTable.tag(root, "a", replace = true)
    assert(ids(root, Map("version" -> "tag:a")) == (1L to 20L))
    // invalid names and uncommitted versions refuse
    intercept[IllegalArgumentException](VersionedTable.tag(root, "no/slash"))
    intercept[IllegalArgumentException](
      VersionedTable.tag(root, "b", version = Some("v0000000000000000000_00000000")))
    // dropping a tag that never existed reports false
    assert(!VersionedTable.dropTag(root, "ghost"))
  }

  test("restore accepts tag:<name>") {
    val root = tmpDir("restore")
    import spark.implicits._
    VersionedTable.publish((1L to 100L).toDF("id"), root)
    VersionedTable.tag(root, "golden")
    VersionedTable.publish((1L to 999L).toDF("id"), root)
    VersionedTable.restore(root, "tag:golden")
    assert(ids(root) == (1L to 100L))
  }

  test("changefeedFrom=tag:<name> streams the tagged-version -> current delta") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("cf")
    import spark.implicits._
    VersionedTable.publish((1L to 5L).toDF("id"), root)
    VersionedTable.tag(root, "start")
    // one row removed, two added since the tag
    VersionedTable.publish((2L to 7L).toDF("id"), root)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("reftable")
      .option("path", root).option("schema", "id BIGINT")
      .option("refreshInterval", "1s")
      .option("changefeed", "true").option("keyColumns", "id")
      .option("changefeedFrom", "tag:start")
      .load()
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= b.select("id", "change_type").collect()
            .map(r => (r.getLong(0), r.getString(1)))
        }
        ()
      }
      .option("checkpointLocation", tmpDir("cf_ck"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    assert(got.sorted.toSeq == Seq((1L, "delete"), (6L, "insert"), (7L, "insert")),
      got.toString)
  }

  test("t$tags metadata table lists tags through SQL") {
    val cat = "gtagcat"
    val wh = tmpDir("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.tt (id BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $cat.db.tt VALUES (1), (2)")
    val root = s"$wh/db/tt"
    val v = VersionedTable.tag(root, "rel-1.0")
    val rows = spark.sql(s"SELECT tag, version FROM $cat.db.`tt$$tags`").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("rel-1.0", v)))
    val ts = spark.sql(s"SELECT created_ts FROM $cat.db.`tt$$tags`").collect()
    assert(ts.head.getTimestamp(0) != null)
  }
}
