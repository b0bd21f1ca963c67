package graft

import java.nio.file.Files

import graft.sources.reftable._
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Batch changefeed ([[Changefeed.between]]): the key-level change set
  * between two retained versions as one LAZY DataFrame — the Delta
  * `table_changes(from, to)` shape. Both endpoints accept the version-spec
  * grammar (plain name, `tag:<name>`, `ts:<timestamp>`); the diff core is
  * the streaming changefeed's O(changed files) file-delta
  * ([[ChangefeedDiff]]), so a MoR delete between the endpoints surfaces
  * through its deletion-vector delta without reading carried files.
  */
class RefTableBatchChangefeedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()

  private def tmpDir(name: String): String =
    Files.createTempDirectory(s"graft_bcf_$name").toString

  private def opts(root: String) = Map(
    "path" -> root, "schema" -> "id BIGINT, v DOUBLE", "keyColumns" -> "id")

  private def publish(root: String, rows: Seq[(Long, Double)]): String = {
    import spark.implicits._
    VersionedTable.publish(rows.toDF("id", "v"), root)
  }

  private def changes(root: String, from: String, to: String = ""): Set[(Long, Double, String)] =
    Changefeed.between(spark, opts(root), from, to)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet

  test("between classifies insert/update/delete across two versions") {
    val root = tmpDir("basic")
    val v1 = publish(root, Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    publish(root, Seq((2L, 2.0), (3L, 30.0), (4L, 4.0)))
    assert(changes(root, v1) == Set(
      (1L, 1.0, "delete"),   // before-image
      (3L, 30.0, "update"),  // after-image
      (4L, 4.0, "insert")))
  }

  test("endpoints accept tag: and ts: specs; to pins an intermediate version") {
    val root = tmpDir("specs")
    publish(root, Seq((1L, 1.0), (2L, 2.0)))
    VersionedTable.tag(root, "base")
    val v2 = publish(root, Seq((1L, 1.0), (2L, 20.0)))
    val t2 = VersionedTable.versionTimestampMs(v2)
    publish(root, Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)))

    // tag: from, explicit version to — only the v1→v2 update
    assert(changes(root, "tag:base", v2) == Set((2L, 20.0, "update")))
    // ts: endpoints — v1→v2 via the publish timestamp
    assert(changes(root, "tag:base", s"ts:$t2") == Set((2L, 20.0, "update")))
    // tag: from to current — update + the later insert
    assert(changes(root, "tag:base") == Set((2L, 20.0, "update"), (3L, 3.0, "insert")))
  }

  test("from == to is an empty change set; reversed endpoints invert") {
    val root = tmpDir("inv")
    val v1 = publish(root, Seq((1L, 1.0)))
    val v2 = publish(root, Seq((1L, 1.0), (2L, 2.0)))
    assert(changes(root, v1, v1).isEmpty)
    assert(changes(root, v1, v2) == Set((2L, 2.0, "insert")))
    assert(changes(root, v2, v1) == Set((2L, 2.0, "delete")))
  }

  test("MoR deletes between the endpoints surface via the DV delta") {
    val root = tmpDir("mor")
    import spark.implicits._
    val v1 = publish(root, Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    RefTableMutations.deleteWhereMergeOnRead(spark, root, col("id") === 2L)
    assert(changes(root, v1) == Set((2L, 2.0, "delete")))
    // the diff is lazy and composes: count through an aggregation
    val n = Changefeed.between(spark, opts(root), v1)
      .groupBy("change_type").count().as[(String, Long)].collect().toSet
    assert(n == Set(("delete", 1L)))
  }

  test("compaction between the endpoints cancels to an empty change set") {
    val root = tmpDir("compact")
    val v1 = publish(root, Seq((1L, 1.0), (2L, 2.0)))
    VersionedTable.compact(spark, root, targetFileBytes = 1L << 20)
    assert(changes(root, v1).isEmpty)
  }

  test("a vacuumed or unknown endpoint fails loudly") {
    val root = tmpDir("gone")
    publish(root, Seq((1L, 1.0)))
    val e = intercept[IllegalArgumentException](changes(root, "v0000000000000000000_deadbeef"))
    assert(e.getMessage.contains("not a retained committed version"), e.getMessage)
    val missingKeys = intercept[IllegalArgumentException](
      Changefeed.between(spark, Map("path" -> root, "schema" -> "id BIGINT"), "x"))
    assert(missingKeys.getMessage.contains("keyColumns"), missingKeys.getMessage)
  }
}
