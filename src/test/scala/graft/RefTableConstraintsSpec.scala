package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** ANSI CHECK constraints ride the declared-expectations machinery:
  * `CONSTRAINT c CHECK (pred)` at CREATE (or ALTER ADD CONSTRAINT) persists
  * as the `expect.c` option, so the same gates that enforce `expect.*` on
  * every write surface enforce the SQL declaration; DROP CONSTRAINT
  * retires it. Non-CHECK constraints refuse loudly.
  */
class RefTableConstraintsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshCatalog(): (String, String) = {
    val wh = Files.createTempDirectory("graft_ck_wh").toString
    val cat = "graftck_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    (cat, wh)
  }

  test("CREATE with CHECK refuses violating INSERTs through the gate") {
    val (cat, _) = freshCatalog()
    val t = s"$cat.db.c1"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT, " +
      "CONSTRAINT nonneg CHECK (v >= 0)) USING reftable")
    spark.sql(s"INSERT INTO $t VALUES (1, 10)")
    val e = intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (2, -5)") }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(m => m.contains("nonneg")), e.toString)
    assert(spark.table(t).count() == 1)
  }

  test("CHECK composes with the declared onViolation mode (drop routes, not refuses)") {
    val (cat, _) = freshCatalog()
    val t = s"$cat.db.c2"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT, " +
      "CONSTRAINT nonneg CHECK (v >= 0)) USING reftable " +
      "OPTIONS (onViolation 'drop')")
    spark.sql(s"INSERT INTO $t VALUES (1, 10), (2, -5), (3, 30)")
    assert(spark.table(t).orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("ALTER ADD CONSTRAINT audits existing rows, then gates; DROP retires it") {
    val (cat, _) = freshCatalog()
    val t = s"$cat.db.c3"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $t VALUES (1, -1)")
    // Spark audits existing data at ADD CONSTRAINT (AddCheckConstraintExec
    // scans through our source) and refuses when violated
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT nonneg CHECK (v >= 0)")
    }
    assert(e.getMessage.contains("existing"), e.getMessage)
    spark.sql(s"DELETE FROM $t WHERE v < 0")
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT nonneg CHECK (v >= 0)")
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (2, -2)") }
    assert(spark.table(t).count() == 0)
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT nonneg")
    spark.sql(s"INSERT INTO $t VALUES (3, -3)")
    assert(spark.table(t).count() == 1)
  }

  test("non-CHECK constraints refuse loudly, naming the keyColumns alternative") {
    val (cat, _) = freshCatalog()
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.c4 (id BIGINT, " +
        "CONSTRAINT pk PRIMARY KEY (id)) USING reftable")
    }
    def msgs(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)
    assert(msgs(e).exists(_.contains("keyColumns")), e.toString)
  }
}
