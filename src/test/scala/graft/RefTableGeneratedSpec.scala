package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** GENERATED ALWAYS AS columns: declared at CREATE (catalog capability),
  * persisted in the descriptor, computed by every write surface; provided
  * non-null values that differ from the computed one refuse loudly; the
  * mutation surfaces refuse touches that would leave the stored value
  * stale.
  */
class RefTableGeneratedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshCatalog(): String = {
    val wh = Files.createTempDirectory("graft_gen_wh").toString
    val cat = "graftgen_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    cat
  }

  private def msgs(x: Throwable): Seq[String] =
    if (x == null) Nil else Option(x.getMessage).toSeq ++ msgs(x.getCause)

  test("the engine computes GENERATED ALWAYS AS on insert; mismatches refuse") {
    val cat = freshCatalog()
    val t = s"$cat.db.g1"
    spark.sql(s"CREATE TABLE $t (id BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (id * 2), " +
      "tag STRING GENERATED ALWAYS AS (concat('k', CAST(id AS STRING)))) USING reftable")
    spark.sql(s"INSERT INTO $t (id) VALUES (1), (2)")
    val got = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq((1L, 2L, "k1"), (2L, 4L, "k2")), got.toString)

    // a provided EQUAL value is accepted; a differing one refuses
    spark.sql(s"INSERT INTO $t VALUES (3, 6, 'k3')")
    assert(spark.table(t).count() == 3)
    val e = intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (4, 99, 'k4')") }
    assert(msgs(e).exists(_.contains("GENERATED ALWAYS AS")), e.toString)
    assert(spark.table(t).count() == 3)
  }

  test("a generation expression referencing another generated column refuses at CREATE") {
    val cat = freshCatalog()
    // alphabetical compute order is not dependency order: `a` computes
    // before `b` only by name accident — a cross-generated reference would
    // read the caller-provided (typically null) input and land silently
    // wrong. Spark's own analyzer refuses the SQL declaration surface
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.gx (id BIGINT, " +
        "b BIGINT GENERATED ALWAYS AS (id * 2), " +
        "a BIGINT GENERATED ALWAYS AS (b + 1)) USING reftable")
    }
    assert(msgs(e).exists(m => m.contains("references generated") ||
      m.contains("cannot reference another generated column")), e.toString)
    // ...and the raw OPTIONS descriptor path (path tables, hand-written
    // columnGenerated JSON) refuses at option parse — it bypasses the
    // analyzer's check entirely, so without the parse-time rule the value
    // would land silently wrong
    import scala.jdk.CollectionConverters._
    val e2 = intercept[Exception] {
      graft.sources.reftable.RefTableOptions.from(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(Map(
          "path" -> "/tmp/never", "schema" -> "id BIGINT, a BIGINT, b BIGINT",
          "columnGenerated" -> """{"b": "id * 2", "a": "b + 1"}""").asJava))
    }
    assert(msgs(e2).exists(_.contains("references generated")), e2.toString)
    // self-reference is the degenerate case of the same rule
    val e3 = intercept[Exception] {
      graft.sources.reftable.RefTableOptions.from(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(Map(
          "path" -> "/tmp/never", "schema" -> "id BIGINT, a BIGINT",
          "columnGenerated" -> """{"a": "a + 1"}""").asJava))
    }
    assert(msgs(e3).exists(_.contains("references generated")), e3.toString)
  }

  test("generated columns compose with expectations and partitioning") {
    val cat = freshCatalog()
    val t = s"$cat.db.g2"
    // generated partition column (the Delta classic: derive the partition
    // key) + an expectation over the generated value
    spark.sql(s"CREATE TABLE $t (id BIGINT, bucket BIGINT GENERATED ALWAYS AS (id % 4)) " +
      "USING reftable OPTIONS (partitionColumns 'bucket', " +
      "\"expect.small\" 'bucket < 4')")
    spark.sql(s"INSERT INTO $t (id) SELECT explode(sequence(0, 19))")
    assert(spark.table(t).count() == 20)
    assert(spark.table(t).where("bucket = 2").collect()
      .map(_.getLong(0)).toSet == Set(2L, 6L, 10L, 14L, 18L))
  }

  test("mutations that would stale the generated value refuse; others work") {
    val cat = freshCatalog()
    val t = s"$cat.db.g3"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (id * 2)) USING reftable")
    spark.sql(s"INSERT INTO $t (id, v) VALUES (1, 10), (2, 20)")
    // updating an unrelated column is fine
    spark.sql(s"UPDATE $t SET v = v + 1 WHERE id = 1")
    assert(spark.table(t).where("id = 1").collect().head.getLong(1) == 11L)
    // SET on the generated column, or its source, refuses
    val e1 = intercept[Exception] { spark.sql(s"UPDATE $t SET twice = 99 WHERE id = 1") }
    assert(msgs(e1).exists(_.contains("GENERATED")), e1.toString)
    val e2 = intercept[Exception] { spark.sql(s"UPDATE $t SET id = 9 WHERE id = 1") }
    assert(msgs(e2).exists(_.contains("GENERATED")), e2.toString)
    // MERGE on a generated table refuses up front
    import spark.implicits._
    Seq((1L, 5L)).toDF("id", "v").createOrReplaceTempView("gen_src")
    val e3 = intercept[Exception] {
      spark.sql(s"MERGE INTO $t USING gen_src s ON $t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET v = s.v")
    }
    assert(msgs(e3).exists(_.contains("GENERATED")), e3.toString)
    // DELETE is unaffected
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    assert(spark.table(t).count() == 1)
  }

  test("landing-zone ingest computes generated columns; the ingest LOG never inherits them") {
    val cat = freshCatalog()
    val t = s"$cat.db.g5"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT, " +
      "twice BIGINT GENERATED ALWAYS AS (id * 2)) USING reftable")
    val wh = spark.conf.get(s"spark.sql.catalog.$cat.warehouse")
    val landing = s"$wh/landing_g5"
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_gen_land").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = new org.apache.hadoop.fs.Path(landing).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath
    fs.rename(part, new org.apache.hadoop.fs.Path(landing, "a.parquet"))
    val row = spark.sql(
      s"CALL $cat.system.ingest(table => 'db.g5', source => '$landing')").collect().head
    assert(row.getInt(0) == 1, row.toString)
    val got = spark.table(t).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 10L, 2L), (2L, 20L, 4L)), got.toString)
  }

  test("generated columns refuse to combine with keyColumns (stale-image hazard)") {
    val cat = freshCatalog()
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.db.g4 (id BIGINT, " +
        "twice BIGINT GENERATED ALWAYS AS (id * 2)) USING reftable " +
        "OPTIONS (keyColumns 'id')")
    }
    assert(msgs(e).exists(_.contains("keyColumns")), e.toString)
  }
}
