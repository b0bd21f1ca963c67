package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** SQL metadata surfaces over catalog tables: SHOW CREATE TABLE,
  * DESCRIBE EXTENDED, SHOW TBLPROPERTIES.
  */
class RefTableShowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("SHOW CREATE TABLE / DESCRIBE EXTENDED / SHOW TBLPROPERTIES surface the descriptor") {
    val wh = Files.createTempDirectory("graft_show_wh").toString
    val cat = "graftshow_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, grp STRING) USING reftable " +
      "OPTIONS (partitionColumns 'grp', keyColumns 'id')")

    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.db.t").collect().head.getString(0)
    assert(ddl.contains("id BIGINT") || ddl.contains("id` BIGINT"), ddl)

    val desc = spark.sql(s"DESCRIBE EXTENDED $cat.db.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.contains("id"), desc.toString)

    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.db.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(props.exists(_._1.toLowerCase.contains("partitioncolumns")), props.toString)
  }
}
