package graft

import java.nio.file.Files

import graft.sources.reftable._
import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** TIMESTAMP AS OF on every surface: `version=ts:<spec>` reader option,
  * `restore("ts:...")`, `changefeedFrom=ts:...`, and SQL
  * `VERSION AS OF 'tag:<name>'` through the catalog. Resolution is a pure
  * name comparison — publish millis are embedded in version names and
  * monotonic under clock ties ([[VersionedTable.versionTimestampMs]]) —
  * so no file reads, and the answer is stable under retention as long as
  * the resolved version is retained.
  */
class RefTableTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()

  private def tmpDir(name: String): String =
    Files.createTempDirectory(s"graft_tt_$name").toString

  private def ids(root: String, extra: Map[String, String] = Map.empty): Seq[Long] = {
    import spark.implicits._
    var r = spark.read.format("reftable").option("path", root).option("schema", "id BIGINT")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load().as[Long].collect().sorted.toSeq
  }

  private def versions(root: String): Seq[String] =
    VersionedTable.committedVersionDirs(root, conf)

  test("version=ts: resolves the newest version at or before the timestamp") {
    val root = tmpDir("basic")
    import spark.implicits._
    VersionedTable.publish((1L to 10L).toDF("id"), root)
    VersionedTable.publish((1L to 20L).toDF("id"), root)
    VersionedTable.publish((1L to 30L).toDF("id"), root)
    val Seq(v1, v2, v3) = versions(root)
    val Seq(t1, t2, t3) = Seq(v1, v2, v3).map(VersionedTable.versionTimestampMs)
    assert(t1 < t2 && t2 < t3, "publish times must be strictly monotonic")

    assert(ids(root, Map("version" -> s"ts:$t1")) == (1L to 10L))
    assert(ids(root, Map("version" -> s"ts:$t2")) == (1L to 20L))
    // between two publishes: the earlier one is the state AS OF that time
    assert(ids(root, Map("version" -> s"ts:${t2 - 1}")) == (1L to 10L))
    assert(ids(root, Map("version" -> s"ts:${t3 + 60000}")) == (1L to 30L))
    // before the first publish: loud failure naming the earliest retained
    val e = intercept[Exception](ids(root, Map("version" -> s"ts:${t1 - 1}")))
    assert(e.getMessage.contains("at or before"), e.getMessage)
    assert(e.getMessage.contains("earliest retained"), e.getMessage)
  }

  test("timestamp spec grammar: millis, ISO instant, UTC date-time, UTC date") {
    val ms = 1765800000000L // 2025-12-15T12:00:00Z
    assert(VersionedTable.parseTimestampSpec(ms.toString) == ms)
    assert(VersionedTable.parseTimestampSpec("2025-12-15T12:00:00Z") == ms)
    assert(VersionedTable.parseTimestampSpec("2025-12-15 12:00:00") == ms)
    assert(VersionedTable.parseTimestampSpec("2025-12-15T12:00:00") == ms)
    assert(VersionedTable.parseTimestampSpec("2025-12-15") == ms - 12 * 3600 * 1000L)
    val bad = intercept[IllegalArgumentException](
      VersionedTable.parseTimestampSpec("noon yesterday"))
    assert(bad.getMessage.contains("invalid timestamp spec"), bad.getMessage)
  }

  test("restore accepts ts:<timestamp>") {
    val root = tmpDir("restore")
    import spark.implicits._
    VersionedTable.publish((1L to 100L).toDF("id"), root)
    val t1 = VersionedTable.versionTimestampMs(versions(root).head)
    VersionedTable.publish((1L to 999L).toDF("id"), root)
    VersionedTable.restore(root, s"ts:$t1")
    assert(ids(root) == (1L to 100L))
  }

  test("changefeedFrom=ts: streams the as-of-version -> current delta") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tmpDir("cf")
    import spark.implicits._
    VersionedTable.publish((1L to 5L).toDF("id"), root)
    val t1 = VersionedTable.versionTimestampMs(versions(root).head)
    VersionedTable.publish((2L to 7L).toDF("id"), root)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = spark.readStream.format("reftable")
      .option("path", root).option("schema", "id BIGINT")
      .option("refreshInterval", "1s")
      .option("changefeed", "true").option("keyColumns", "id")
      .option("changefeedFrom", s"ts:$t1")
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

  test("SQL VERSION AS OF accepts tag:<name>; TIMESTAMP AS OF unchanged") {
    val cat = "gttcat"
    val wh = tmpDir("wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.tv (id BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $cat.db.tv VALUES (1), (2)")
    VersionedTable.tag(s"$wh/db/tv", "rel")
    spark.sql(s"INSERT INTO $cat.db.tv VALUES (3)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.tv VERSION AS OF 'tag:rel'")
      .head().getLong(0) == 2L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.db.tv").head().getLong(0) == 3L)
    val gone = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.db.tv VERSION AS OF 'tag:ghost'").collect())
    assert(gone.getMessage.contains("no tag"), gone.getMessage)
  }
}
