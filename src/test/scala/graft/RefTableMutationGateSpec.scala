package graft

import java.nio.file.Files

import graft.sources.reftable.{RefTableMutations, RefTableOptions, VersionedTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Declared `expect.<name>` rules enforced on the MUTATION write paths —
  * UPDATE / MERGE / upsert / applyChanges, copy-on-write AND merge-on-read.
  * The contract matches the INSERT surfaces (q179/q180): fail refuses the
  * whole commit naming the broken rules (nothing lands), drop SKIPS the
  * violating row's mutation (the old image survives — a failed quality
  * gate must never delete a row), quarantine appends the violating
  * after-image to the sibling `__quarantine` table first.
  */
class RefTableMutationGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val ddl = "id BIGINT, v BIGINT"

  private val n = new java.util.concurrent.atomic.AtomicInteger(0)
  private def freshTable(onViolation: String, mode: String = ""): (String, String) = {
    import spark.implicits._
    val i = n.incrementAndGet()
    val root = Files.createTempDirectory(s"graft_gate$i").toString + "/t"
    val tbl = s"graft_gate_$i"
    val modeOpts = if (mode.isEmpty) ""
      else s", updateMode '$mode', mergeMode '$mode', deleteMode '$mode'"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', schema '$ddl', " +
      s"""expect.non_negative 'v >= 0', onViolation '$onViolation'$modeOpts)""")
    (0L until 10L).map(i => (i, i)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .mode("overwrite").save()
    (tbl, root)
  }

  private def rows(tbl: String): Seq[(Long, Long)] =
    spark.table(tbl).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  for (mode <- Seq("", "mergeOnRead")) {
    val label = if (mode.isEmpty) "COW" else "MoR"

    test(s"$label MERGE: onViolation=fail refuses the commit, nothing lands") {
      val (tbl, root) = freshTable("fail", mode)
      import spark.implicits._
      Seq((1L, -5L), (2L, 20L), (100L, 100L)).toDF("id", "nv")
        .createOrReplaceTempView(s"src_$tbl")
      val before = rows(tbl)
      val nv = VersionedTable.versionDirs(root, new org.apache.hadoop.conf.Configuration()).size
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO $tbl t USING src_$tbl s ON t.id = s.id
          WHEN MATCHED THEN UPDATE SET v = s.nv
          WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""")
      }
      assert(e.getMessage.contains("non_negative"), e.getMessage)
      assert(rows(tbl) == before, "a refused MERGE must land nothing")
      assert(VersionedTable.versionDirs(root,
        new org.apache.hadoop.conf.Configuration()).size == nv)
    }

    test(s"$label MERGE: onViolation=fail names a violating INSERT too") {
      val (tbl, _) = freshTable("fail", mode)
      import spark.implicits._
      Seq((200L, -1L)).toDF("id", "nv").createOrReplaceTempView(s"srci_$tbl")
      val e = intercept[Exception] {
        spark.sql(s"""MERGE INTO $tbl t USING srci_$tbl s ON t.id = s.id
          WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""")
      }
      assert(e.getMessage.contains("non_negative"), e.getMessage)
    }

    test(s"$label MERGE: onViolation=drop skips the violating row's mutation") {
      val (tbl, _) = freshTable("drop", mode)
      import spark.implicits._
      // id=1 update violates (skipped: old value survives), id=2 passes,
      // id=100 insert violates (never lands), id=101 insert passes
      Seq((1L, -5L), (2L, 20L), (100L, -1L), (101L, 50L)).toDF("id", "nv")
        .createOrReplaceTempView(s"srcd_$tbl")
      spark.sql(s"""MERGE INTO $tbl t USING srcd_$tbl s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""")
      val got = rows(tbl)
      assert(got.contains((1L, 1L)), "violating update must keep the OLD image")
      assert(got.contains((2L, 20L)), "passing update applies")
      assert(!got.exists(_._1 == 100L), "violating insert never lands")
      assert(got.contains((101L, 50L)), "passing insert lands")
      assert(got.size == 11)
    }

    test(s"$label MERGE: onViolation=quarantine logs rejects with rule names") {
      val (tbl, root) = freshTable("quarantine", mode)
      import spark.implicits._
      Seq((1L, -5L), (100L, -1L), (101L, 50L)).toDF("id", "nv")
        .createOrReplaceTempView(s"srcq_$tbl")
      spark.sql(s"""MERGE INTO $tbl t USING srcq_$tbl s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.nv
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""")
      val got = rows(tbl)
      assert(got.contains((1L, 1L)) && !got.exists(_._1 == 100L) &&
        got.contains((101L, 50L)))
      val q = spark.read.format("reftable")
        .option("path", root + "__quarantine")
        .option("schema", ddl + ", _violated STRING").load()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(q == Set((1L, -5L, "non_negative"), (100L, -1L, "non_negative")),
        s"quarantine must hold the violating AFTER-images, got $q")
    }

    test(s"$label UPDATE: fail refuses; drop keeps old images for violating hits") {
      val (tbl, _) = freshTable("fail", mode)
      val e = intercept[Exception] {
        spark.sql(s"UPDATE $tbl SET v = v - 100 WHERE id < 3")
      }
      assert(e.getMessage.contains("non_negative"), e.getMessage)
      assert(rows(tbl).take(3) == Seq((0L, 0L), (1L, 1L), (2L, 2L)))

      val (tbl2, _) = freshTable("drop", mode)
      // after-image v-5: violates for id<5, passes for id>=5
      spark.sql(s"UPDATE $tbl2 SET v = v - 5 WHERE id < 7")
      val got = rows(tbl2)
      assert(got.take(5) == (0L until 5L).map(i => (i, i)),
        s"violating hits keep old images, got ${got.take(5)}")
      assert(got.slice(5, 7) == Seq((5L, 0L), (6L, 1L)), "passing hits update")
    }

    test(s"$label NOT MATCHED BY SOURCE UPDATE: drop skips violating images, " +
        "delete is never gated") {
      val (tbl, _) = freshTable("drop", mode)
      import spark.implicits._
      // source matches ids 0..2 only; NMBS after-image v-5 violates for
      // target ids 3..7 (v<5 goes negative... v-5<0 for v<5 → ids 3,4),
      // passes for 5..7; ids 8..9 are deleted (deletes bypass the gate)
      Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("id", "nv")
        .createOrReplaceTempView(s"src_nmbs_$tbl")
      spark.sql(s"""MERGE INTO $tbl t USING src_nmbs_$tbl s ON t.id = s.id
        WHEN NOT MATCHED BY SOURCE AND t.id < 8 THEN UPDATE SET v = v - 5
        WHEN NOT MATCHED BY SOURCE AND t.id >= 8 THEN DELETE""")
      val got = rows(tbl)
      assert(got.take(3) == Seq((0L, 0L), (1L, 1L), (2L, 2L)), "matched rows untouched")
      assert(got.slice(3, 5) == Seq((3L, 3L), (4L, 4L)),
        s"violating NMBS images skipped (old rows survive), got ${got.slice(3, 5)}")
      assert(got.slice(5, 8) == Seq((5L, 0L), (6L, 1L), (7L, 2L)), "passing NMBS update")
      assert(!got.exists(_._1 >= 8L), "NMBS delete applies regardless of the gate")
    }
  }

  test("API upsert (COW) honors the gate; applyChangesMergeOnRead skips violating upserts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_gate_api").toString + "/t"
    VersionedTable.publish((0L until 5L).map(i => (i, i)).toDF("id", "v"), root)
    val gateOpts = RefTableOptions.from(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(Map(
          "path" -> root, "schema" -> ddl,
          "expect.non_negative" -> "v >= 0", "onViolation" -> "drop")).asJava))
    RefTableMutations.upsert(spark, root,
      Seq((1L, -9L), (2L, 22L), (9L, 99L)).toDF("id", "v"), Seq("id"),
      gate = Some(gateOpts))
    def read() = spark.read.format("reftable")
      .option("path", root).option("schema", ddl).load()
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(read() == Seq((0L, 0L), (1L, 1L), (2L, 22L), (3L, 3L), (4L, 4L), (9L, 99L)))

    // changefeed apply: delete id=0 applies, violating update id=3 skipped
    val changes = Seq(
      (0L, 0L, "delete"), (3L, -3L, "update"), (4L, 44L, "update"))
      .toDF("id", "v", "change_type")
    RefTableMutations.applyChangesMergeOnRead(spark, root, changes, Seq("id"),
      gate = Some(gateOpts))
    assert(read() == Seq((1L, 1L), (2L, 22L), (3L, 3L), (4L, 44L), (9L, 99L)))
  }

  test("fail-mode census runs BEFORE any commit: version count is unchanged") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_gate_nc").toString + "/t"
    VersionedTable.publish((0L until 5L).map(i => (i, i)).toDF("id", "v"), root)
    val gateOpts = RefTableOptions.from(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        scala.jdk.CollectionConverters.MapHasAsJava(Map(
          "path" -> root, "schema" -> ddl,
          "expect.non_negative" -> "v >= 0", "onViolation" -> "fail")).asJava))
    val conf = new org.apache.hadoop.conf.Configuration()
    val nv = VersionedTable.versionDirs(root, conf).size
    intercept[Exception] {
      RefTableMutations.upsert(spark, root,
        Seq((1L, -9L)).toDF("id", "v"), Seq("id"), gate = Some(gateOpts))
    }
    intercept[Exception] {
      RefTableMutations.upsertMergeOnRead(spark, root,
        Seq((1L, -9L)).toDF("id", "v"), Seq("id"), gate = Some(gateOpts))
    }
    assert(VersionedTable.versionDirs(root, conf).size == nv)
  }
}
