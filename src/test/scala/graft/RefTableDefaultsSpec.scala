package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** DEFAULT column values through the catalog: declared at CREATE or added
  * by ALTER, applied by INSERTs that omit the column or write the DEFAULT
  * keyword, and null-distinct (an explicit NULL stays NULL).
  */
class RefTableDefaultsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshCatalog(): String = {
    val wh = Files.createTempDirectory("graft_defs_wh").toString
    val cat = "graftdefs_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    cat
  }

  test("CREATE with DEFAULT: omitted columns and the DEFAULT keyword fill in") {
    val cat = freshCatalog()
    val t = s"$cat.db.d1"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT DEFAULT 42, s STRING DEFAULT 'x') " +
      "USING reftable")
    spark.sql(s"INSERT INTO $t (id) VALUES (1)")
    spark.sql(s"INSERT INTO $t VALUES (2, DEFAULT, DEFAULT)")
    spark.sql(s"INSERT INTO $t VALUES (3, 7, NULL)")
    val got = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2))).toSeq
    assert(got == Seq((1L, 42L, "x"), (2L, 42L, "x"), (3L, 7L, null)))
  }

  test("ADD COLUMN with DEFAULT refuses; ADD then SET DEFAULT covers future INSERTs") {
    val cat = freshCatalog()
    val t = s"$cat.db.d2"
    spark.sql(s"CREATE TABLE $t (id BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    // existing rows can't backfill — refused loudly, same contract as Delta
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING DEFAULT 'new'")
    }
    assert(e.getMessage.contains("backfill"), e.getMessage)
    // the documented path: add the column (old rows null), then declare the
    // default for FUTURE inserts
    spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN tag SET DEFAULT 'new'")
    spark.sql(s"INSERT INTO $t (id) VALUES (2)")
    val got = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.get(1))).toSeq
    assert(got == Seq((1L, null), (2L, "new")), got.toString)
    // DROP DEFAULT: back to plain nulls for omitted columns
    spark.sql(s"ALTER TABLE $t ALTER COLUMN tag DROP DEFAULT")
    spark.sql(s"INSERT INTO $t (id) VALUES (3)")
    assert(spark.table(t).where("id = 3").collect().head.get(1) == null)
  }

  test("defaults survive RENAME COLUMN and die with DROP COLUMN") {
    val cat = freshCatalog()
    val t = s"$cat.db.d3"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT DEFAULT 7, w BIGINT DEFAULT 9) " +
      "USING reftable")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN v TO v2")
    spark.sql(s"INSERT INTO $t (id) VALUES (1)")
    val r = spark.table(t).collect().head
    assert((r.getLong(0), r.get(1), r.get(2)) == (1L, 7L, 9L), r.toString)
    spark.sql(s"ALTER TABLE $t DROP COLUMN w")
    spark.sql(s"INSERT INTO $t (id) VALUES (2)")
    val r2 = spark.table(t).where("id = 2").collect().head
    assert((r2.getLong(0), r2.get(1)) == (2L, 7L), r2.toString)
  }
}
