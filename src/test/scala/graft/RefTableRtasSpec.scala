package graft

import java.nio.file.Files

import graft.sources.reftable.VersionedTable
import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Atomic CTAS / RTAS through StagingTableCatalog: the SELECT stages into
  * an ignored `.rtas-<uuid>/` dir inside the table root; commit adopts it
  * as a full version under the CAS and swaps the descriptor last. No
  * drop-then-create window: a failed or aborted statement leaves the
  * previous table fully intact.
  */
class RefTableRtasSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()

  private def withCatalog(f: (String, String) => Unit): Unit = {
    val wh = Files.createTempDirectory("graft_rtas_spec").toString
    val cat = "graftrtas_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    f(cat, wh)
  }

  test("CTAS creates atomically; RTAS replaces data and schema in place") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.t USING reftable AS " +
        "SELECT id, id * 10 AS v FROM range(5)")
      assert(spark.table(s"$cat.db.t").count() == 5)
      val root = s"$wh/db/t"
      val v1 = VersionedTable.resolve(root, conf).get

      spark.sql(s"CREATE OR REPLACE TABLE $cat.db.t USING reftable AS " +
        "SELECT id, CAST(id AS STRING) AS s FROM range(3)")
      val got = spark.table(s"$cat.db.t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((0L, "0"), (1L, "1"), (2L, "2")))
      // the replace is a NEW VERSION of the same root (time travel to the
      // pre-replace table still works), not a deleted-and-recreated dir
      val v2 = VersionedTable.resolve(root, conf).get
      assert(v2 != v1)
      assert(VersionedTable.commitLog(root, conf).size == 2,
        "CTAS + RTAS = two commits on one root")
      // no staging crumbs left behind
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
      assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .exists(_.getPath.getName.startsWith(".rtas-")), "rtas staging cleaned up")
    }
  }

  test("a FAILING replace SELECT leaves the old table fully intact") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE TABLE $cat.db.f USING reftable AS " +
        "SELECT id, id * 2 AS v FROM range(10)")
      val before = VersionedTable.resolve(s"$wh/db/f", conf).get
      intercept[Exception] {
        spark.sql(s"CREATE OR REPLACE TABLE $cat.db.f USING reftable AS " +
          "SELECT id, CAST(raise_error('boom') AS BIGINT) AS v FROM range(10)")
      }
      // old data, schema and current version untouched; no partial state
      assert(VersionedTable.resolve(s"$wh/db/f", conf).get == before)
      assert(spark.table(s"$cat.db.f").count() == 10)
      assert(spark.table(s"$cat.db.f").columns.toSeq == Seq("id", "v"))
    }
  }

  test("plain CTAS refuses an existing table; IF NOT EXISTS is a no-op") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.e USING reftable AS SELECT 1L AS id")
      val e = intercept[Exception](
        spark.sql(s"CREATE TABLE $cat.db.e USING reftable AS SELECT 2L AS id"))
      assert(e.getMessage.toLowerCase.contains("already exists"), e.getMessage)
      spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.db.e USING reftable AS SELECT 3L AS id")
      assert(spark.table(s"$cat.db.e").collect().map(_.getLong(0)).toSeq == Seq(1L))
    }
  }

  test("RTAS with declared options: partitioned layout and expectations gate") {
    withCatalog { (cat, wh) =>
      spark.sql(s"CREATE OR REPLACE TABLE $cat.db.p USING reftable " +
        "OPTIONS (partitionColumns 'p', " +
        "expect.positive 'id >= 2', onViolation 'drop') AS " +
        "SELECT id, CAST(id % 2 AS INT) AS p FROM range(10)")
      // gate dropped ids 0 and 1 in the staged write itself
      assert(spark.table(s"$cat.db.p").count() == 8)
      // the adopted version carries the Hive layout
      val cur = VersionedTable.resolve(s"$wh/db/p", conf).get
      val fs = new org.apache.hadoop.fs.Path(cur).getFileSystem(conf)
      val parts = fs.listStatus(new org.apache.hadoop.fs.Path(cur))
        .filter(_.isDirectory).map(_.getPath.getName).filter(_.contains("=")).sorted
      assert(parts.toSeq == Seq("p=0", "p=1"), s"got ${parts.toSeq}")
      // partition pruning works on the result
      assert(spark.table(s"$cat.db.p").where("p = 1").count() == 4)
    }
  }

  test("empty-SELECT RTAS publishes an empty, readable version") {
    withCatalog { (cat, _) =>
      spark.sql(s"CREATE TABLE $cat.db.mt USING reftable AS " +
        "SELECT id, id AS v FROM range(5)")
      spark.sql(s"CREATE OR REPLACE TABLE $cat.db.mt USING reftable AS " +
        "SELECT id, id AS v FROM range(5) WHERE id < 0")
      assert(spark.table(s"$cat.db.mt").count() == 0)
    }
  }
}
