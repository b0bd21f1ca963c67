package graft

import java.nio.file.Files

import graft.sources.reftable.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** `SELECT * FROM table_changes('t', from[, to])` — the batch SQL
  * changefeed (Delta-CDF shape) resolved by TableChangesRewrite into the
  * lazy O(changed files) diff.
  */
class TableChangesSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  private def freshTable(): (String, String) = {
    val i = n.incrementAndGet()
    val root = Files.createTempDirectory(s"graft_tc$i").toString + "/t"
    val tbl = s"graft_tc_$i"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', " +
      "schema 'id BIGINT, v BIGINT', keyColumns 'id')")
    (tbl, root)
  }

  test("table_changes classifies insert/update/delete between two versions") {
    val (tbl, root) = freshTable()
    import spark.implicits._
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .createOrReplaceTempView(s"feed_$tbl")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM feed_$tbl")
    VersionedTable.tag(root, "base")
    spark.sql(s"UPDATE $tbl SET v = 99 WHERE id = 2")
    spark.sql(s"DELETE FROM $tbl WHERE id = 3")
    val got = spark.sql(
      s"SELECT id, v, change_type FROM table_changes('$tbl', 'tag:base') ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((2L, 99L, "update"), (3L, 30L, "delete")))

    // explicit to-spec pins an intermediate version; the diff composes
    // with aggregation like any relation
    val versions = VersionedTable.versionDirs(root,
      new org.apache.hadoop.conf.Configuration()).sorted
    val afterUpdate = versions(versions.size - 2)
    val agg = spark.sql(
      s"""SELECT change_type, count(*) AS n
         |FROM table_changes('$tbl', 'tag:base', '$afterUpdate')
         |GROUP BY change_type ORDER BY change_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(agg == Seq(("update", 1L)))
  }

  test("table_changes argument and contract errors are loud") {
    val (tbl, _) = freshTable()
    import spark.implicits._
    Seq((1L, 10L)).toDF("id", "v").createOrReplaceTempView(s"feed_$tbl")
    spark.sql(s"INSERT INTO $tbl SELECT * FROM feed_$tbl")
    val e1 = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$tbl')").collect()
    }
    assert(e1.getMessage.contains("table_changes"))
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$tbl', 'no_such_version')").collect()
    }
    assert(e2.getMessage.contains("no_such_version"))
    // a table without keyColumns is refused with the declaration hint
    val root3 = Files.createTempDirectory("graft_tc_nokey").toString + "/t"
    spark.sql(s"DROP TABLE IF EXISTS graft_tc_nokey")
    spark.sql(s"CREATE TABLE graft_tc_nokey USING reftable OPTIONS (path '$root3', " +
      "schema 'id BIGINT, v BIGINT')")
    spark.sql(s"INSERT INTO graft_tc_nokey VALUES (1, 1)")
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('graft_tc_nokey', 'x')").collect()
    }
    assert(e3.getMessage.contains("keyColumns"))
  }

  test("unknown TVF names still raise Spark's own error") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM no_such_tvf('x')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("no_such_tvf"))
  }
}
