package graft

import java.nio.file.Files

import graft.sources.reftable.VersionedTable
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL `UPDATE` / `MERGE INTO` through the analyzer rewrite
  * (RefTableDmlRewrite, injected by GraftExtensions): resolved plans over
  * reftable relations become driver commands over the COW mutations.
  */
class RefTableDmlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()
  private val ddl = "id BIGINT, v BIGINT, s STRING"

  private def freshTable(name: String): (String, String) = {
    import spark.implicits._
    val root = Files.createTempDirectory(s"graft_dml_$name").toString + "/t"
    val tbl = s"graft_dml_$name"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', schema '$ddl')")
    (0L until 100L).map(i => (i, i * 10, s"s$i")).toDF("id", "v", "s")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .mode("overwrite").save()
    (tbl, root)
  }

  test("SQL DML over a Hive-partitioned table: DELETE, UPDATE and MERGE thread the layout") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dml_part").toString + "/t"
    val tbl = "graft_dml_part"
    val pddl = "id BIGINT, v BIGINT, dt STRING"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING reftable OPTIONS " +
      s"(path '$root', schema '$pddl', partitionColumns 'dt')")
    try {
      (0L until 300L).map(i => (i, i * 10, s"d${i % 3}")).toDF("id", "v", "dt")
        .write.format("reftable").option("path", root).option("schema", pddl)
        .option("partitionColumns", "dt").mode("overwrite").save()

      // DELETE narrowed by the partition predicate: only d1 files rewrite
      spark.sql(s"DELETE FROM $tbl WHERE dt = 'd1' AND id < 150")
      assert(spark.table(tbl).count() == 300 - 50)
      assert(spark.table(tbl).where("dt = 'd1'").count() == 50)
      // untouched partitions are carried by reference, not rewritten
      val cur = VersionedTable.resolve(root, conf).get
      val staged = graft.sources.reftable.SnapshotFiles.listPhysical(cur, Seq("dt"))
      assert(staged.forall(_.partitionValues("dt") == "d1"),
        s"only d1 may be physically rewritten, got ${staged.map(_.partitionValues)}")

      // UPDATE moving rows across partitions (dt is a data column in the rewrite)
      spark.sql(s"UPDATE $tbl SET dt = 'd9' WHERE dt = 'd0' AND id < 30")
      assert(spark.table(tbl).where("dt = 'd9'").count() == 10)
      assert(spark.table(tbl).where("dt = 'd0' AND id < 30").count() == 0)

      // MERGE: update one partition's row, insert into a brand-new partition
      Seq((3L, -1L, "d0"), (9999L, 1L, "dNEW")).toDF("id", "nv", "ndt")
        .createOrReplaceTempView("dml_part_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_part_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (id, v, dt) VALUES (s.id, s.nv, s.ndt)
           |""".stripMargin)
      val got = spark.table(tbl).where("id IN (3, 9999)").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      // row 3 was moved to d9 by the UPDATE above; MERGE updates v in place
      assert(got == Seq((3L, -1L, "d9"), (9999L, 1L, "dNEW")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL MERGE with the partition column in ON rewrites only its partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dml_pk").toString + "/t"
    val tbl = "graft_dml_pk"
    val pddl = "id BIGINT, v BIGINT, dt STRING"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING reftable OPTIONS " +
      s"(path '$root', schema '$pddl', partitionColumns 'dt')")
    try {
      (0L until 300L).map(i => (i, i * 10, s"d${i % 3}")).toDF("id", "v", "dt")
        .write.format("reftable").option("path", root).option("schema", pddl)
        .option("partitionColumns", "dt").mode("overwrite").save()
      // the source touches ONLY partition d2, but its ids (2, 299) span the
      // whole table's id range — key bounds alone cannot prune a single
      // file; partition-keyed pruning (dt is part of the ON key) must
      Seq((2L, -2L, "d2"), (299L, -299L, "d2")).toDF("id", "nv", "dt")
        .createOrReplaceTempView("dml_pk_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_pk_src s ON t.dt = s.dt AND t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (id, v, dt) VALUES (s.id, s.nv, s.dt)
           |""".stripMargin)
      assert(spark.table(tbl).where("id IN (2, 299)").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((2L, -2L), (299L, -299L)))
      assert(spark.table(tbl).count() == 300)
      val cur = VersionedTable.resolve(root, conf).get
      val staged = graft.sources.reftable.SnapshotFiles.listPhysical(cur, Seq("dt"))
      assert(staged.nonEmpty && staged.forall(_.partitionValues("dt") == "d2"),
        s"only d2 may stage, got ${staged.map(_.partitionValues)}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL MERGE on a bucketBy table rewrites only the source keys' buckets") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dml_bkt").toString + "/t"
    val tbl = "graft_dml_bkt"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', " +
      "schema 'id BIGINT, v BIGINT', bucketBy 'id', bucketCount '16')")
    try {
      (0L until 8000L).map(i => (i, i)).toDF("id", "v")
        .write.format("reftable").option("path", root)
        .option("schema", "id BIGINT, v BIGINT")
        .option("bucketBy", "id").option("bucketCount", "16")
        .mode("overwrite").save()
      val cur1 = VersionedTable.resolve(root, conf).get
      val before = graft.sources.reftable.SnapshotFiles.list(cur1)
        .map(f => new org.apache.hadoop.fs.Path(f.path).getName).toSet
      assert(before.size == 16, s"bucketed publish: ${before.size} files")

      // two scattered keys: range narrowing would rewrite everything
      Seq((3L, -3L), (7777L, -7L)).toDF("k", "nv").createOrReplaceTempView("bkt_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING bkt_src s ON t.id = s.k
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.k, s.nv)""".stripMargin)
      val cur2 = VersionedTable.resolve(root, conf).get
      val after = graft.sources.reftable.SnapshotFiles.list(cur2)
        .map(f => new org.apache.hadoop.fs.Path(f.path).getName).toSet
      assert(after.intersect(before).size >= 14,
        s"at least 14 of 16 buckets must carry by reference, carried ${after.intersect(before).size}")
      val got = spark.table(tbl).where("id IN (3, 7777)").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((3L, -3L), (7777L, -7L)))
      assert(spark.table(tbl).count() == 8000)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL UPDATE applies SET expressions where the condition holds") {
    val (tbl, _) = freshTable("upd")
    try {
      spark.sql(s"UPDATE $tbl SET v = v + 1, s = concat(s, '!') WHERE id < 10")
      val got = spark.table(tbl).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got(5) == ((5L, 51L, "s5!")), s"updated row wrong: ${got(5)}")
      assert(got(50) == ((50L, 500L, "s50")), "rows outside the condition untouched")
      assert(got.length == 100)
      // RHS sees the OLD row: v = v + 1 used pre-update v
      assert(got(0) == ((0L, 1L, "s0!")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL UPDATE without WHERE updates every row; unknown columns refuse") {
    val (tbl, _) = freshTable("updall")
    try {
      spark.sql(s"UPDATE $tbl SET v = 0")
      assert(spark.table(tbl).agg(sum("v")).first().getLong(0) == 0L)
      val e = intercept[Exception](spark.sql(s"UPDATE $tbl SET nope = 1"))
      assert(e.getMessage.toLowerCase.contains("nope"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL MERGE INTO: UPDATE SET, DELETE and INSERT clauses with conditions") {
    import spark.implicits._
    val (tbl, _) = freshTable("merge")
    try {
      Seq((5L, 999L, "u", "upd"), (6L, 0L, "x", "del"), (200L, 42L, "n", "ins"))
        .toDF("id", "nv", "ns", "op").createOrReplaceTempView("dml_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_src s ON t.id = s.id
           |WHEN MATCHED AND s.op = 'del' THEN DELETE
           |WHEN MATCHED AND s.op = 'upd' THEN UPDATE SET v = s.nv, s = s.ns
           |WHEN NOT MATCHED AND s.op = 'ins' THEN INSERT (id, v, s) VALUES (s.id, s.nv, s.ns)
           |""".stripMargin)
      val got = spark.table(tbl).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got.exists(_ == ((5L, 999L, "u"))), "matched upd row updated")
      assert(!got.exists(_._1 == 6L), "matched del row deleted")
      assert(got.exists(_ == ((200L, 42L, "n"))), "unmatched ins row inserted")
      assert(got.size == 100, "99 kept + 1 insert")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("SQL MERGE INTO a fresh (never-published) table bootstraps and inserts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dml_fresh").toString + "/t"
    val tbl = "graft_dml_fresh_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', schema '$ddl')")
    try {
      Seq((1L, 11L, "a"), (2L, 22L, "b")).toDF("id", "nv", "ns")
        .createOrReplaceTempView("dml_fresh_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_fresh_src s ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT (id, v, s) VALUES (s.id, s.nv, s.ns)""".stripMargin)
      assert(spark.table(tbl).count() == 2)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("unsupported MERGE shapes refuse loudly") {
    import spark.implicits._
    val (tbl, _) = freshTable("refuse")
    try {
      Seq((1L, 1L)).toDF("id", "nv").createOrReplaceTempView("dml_bad_src")
      // target-referencing SET value
      val e1 = intercept[Exception](spark.sql(
        s"""MERGE INTO $tbl t USING dml_bad_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = t.v + s.nv""".stripMargin))
      assert(e1.getMessage.contains("only the MERGE source"), e1.getMessage)
      // non-equi ON clause
      val e2 = intercept[Exception](spark.sql(
        s"""MERGE INTO $tbl t USING dml_bad_src s ON t.id > s.id
           |WHEN MATCHED THEN DELETE""".stripMargin))
      assert(e2.getMessage.contains("conjunction"), e2.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("MERGE refuses a source column shadowed by a differently-derived key alias") {
    import spark.implicits._
    val (tbl, _) = freshTable("shadow")
    try {
      // the source has its OWN column named 'id', but the ON clause joins
      // target.id to a DIFFERENT source expression (other_id). The key
      // alias would shadow source.id in the re-projection, so the UPDATE
      // value s.id would silently re-resolve to other_id's values
      Seq((9999L, 5L, 123L)).toDF("id", "other_id", "nv")
        .createOrReplaceTempView("dml_shadow_src")
      val e = intercept[Exception](spark.sql(
        s"""MERGE INTO $tbl t USING dml_shadow_src s ON t.id = s.other_id
           |WHEN MATCHED THEN UPDATE SET v = s.id""".stripMargin))
      assert(e.getMessage.contains("shadow"), e.getMessage)
      // the benign same-name case still works: ON t.id = s.id
      Seq((5L, 777L)).toDF("id", "nv").createOrReplaceTempView("dml_same_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_same_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv""".stripMargin)
      assert(spark.table(tbl).where("id = 5").first().getLong(1) == 777L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: full-sync with all five clauses (COW)") {
    import spark.implicits._
    val (tbl, _) = freshTable("nmbs")
    try {
      // desired state: ids 0..49 (evens updated), plus fresh id 500
      (0L until 50L).map(i => (i, i * 100)).toDF("id", "nv")
        .union(Seq((500L, 1L)).toDF("id", "nv"))
        .createOrReplaceTempView("dml_nmbs_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_nmbs_src s ON t.id = s.id
           |WHEN MATCHED AND s.id % 2 = 0 THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED THEN INSERT (id, v, s) VALUES (s.id, s.nv, 'new')
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 90 THEN UPDATE SET s = 'stale'
           |WHEN NOT MATCHED BY SOURCE AND t.id < 90 THEN DELETE""".stripMargin)
      val got = spark.table(tbl).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      // 0..49 survive (evens v=i*100, odds v=i*10), 50..89 deleted,
      // 90..99 kept with s='stale', 500 inserted
      assert(got.size == 50 + 10 + 1, s"got ${got.size}")
      assert(got.filter(_._1 < 50).forall { case (i, v, _) =>
        v == (if (i % 2 == 0) i * 100 else i * 10) })
      assert(!got.exists(g => g._1 >= 50 && g._1 < 90))
      assert(got.filter(g => g._1 >= 90 && g._1 < 100)
        .forall { case (i, v, s) => v == i * 10 && s == "stale" })
      assert(got.exists(_ == ((500L, 1L, "new"))))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("MERGE NOT MATCHED BY SOURCE on mergeOnRead: positions die by DV, no rewrite") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_dml_nmbs_mor").toString + "/t"
    val tbl = "graft_dml_nmbs_mor"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl USING reftable OPTIONS (path '$root', " +
      s"schema '$ddl', mergeMode 'mergeOnRead')")
    try {
      (0L until 100L).map(i => (i, i * 10, s"s$i")).toDF("id", "v", "s")
        .write.format("reftable").option("path", root).option("schema", ddl)
        .mode("overwrite").save()
      val before = VersionedTable.resolve(root, conf).get
      (0L until 40L).map(i => (i, -1L)).toDF("id", "nv")
        .createOrReplaceTempView("dml_nmbs_mor_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_nmbs_mor_src s ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND t.id < 70 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 70 THEN UPDATE SET v = -7""".stripMargin)
      // 0..39 untouched (matched, no matched clause), 40..69 deleted,
      // 70..99 new images with v=-7
      val got = spark.table(tbl).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got.size == 70, s"got ${got.size}")
      assert(got.filter(_._1 < 40).forall { case (i, v) => v == i * 10 })
      assert(got.filter(_._1 >= 70).forall(_._2 == -7L))
      // merge-on-read: the base files are carried by reference, a DV
      // sidecar marks the dead positions — nothing is rewritten
      val cur = VersionedTable.resolve(root, conf).get
      assert(cur != before)
      val fs = new org.apache.hadoop.fs.Path(cur).getFileSystem(conf)
      assert(fs.exists(new org.apache.hadoop.fs.Path(cur, "_DV")),
        "NMBS on mergeOnRead must stage a deletion-vector sidecar")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("NMBS clauses apply in DECLARED order when both conditions overlap") {
    import spark.implicits._
    // SQL merge applies the FIRST matching clause in declaration order:
    // a statement declaring UPDATE before DELETE must UPDATE a row both
    // conditions hit, never silently delete it
    val (tbl, _) = freshTable("nmbs_order")
    try {
      Seq((0L, 0L)).toDF("id", "nv").createOrReplaceTempView("dml_nmbs_ord_src")
      // unmatched rows 1..99: UPDATE condition hits id >= 50, DELETE
      // condition hits id >= 90 — overlap on 90..99
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_nmbs_ord_src s ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 50 THEN UPDATE SET s = 'upd'
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 90 THEN DELETE""".stripMargin)
      val got = spark.table(tbl).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq
      assert(got.size == 100, s"update-first must not delete: got ${got.size}")
      assert(got.filter(_._1 >= 50).forall(_._2 == "upd"))
      assert(got.filter(_._1 < 50).forall { case (i, s) => s == s"s$i" })
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")

    // delete declared first: the overlap dies (and on mergeOnRead too)
    val root = Files.createTempDirectory("graft_dml_nmbs_ord2").toString + "/t"
    val tbl2 = "graft_dml_nmbs_order2"
    spark.sql(s"DROP TABLE IF EXISTS $tbl2")
    spark.sql(s"CREATE TABLE $tbl2 USING reftable OPTIONS (path '$root', " +
      s"schema '$ddl', mergeMode 'mergeOnRead')")
    try {
      (0L until 100L).map(i => (i, i * 10, s"s$i")).toDF("id", "v", "s")
        .write.format("reftable").option("path", root).option("schema", ddl)
        .mode("overwrite").save()
      Seq((0L, 0L)).toDF("id", "nv").createOrReplaceTempView("dml_nmbs_ord_src2")
      spark.sql(
        s"""MERGE INTO $tbl2 t USING dml_nmbs_ord_src2 s ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 90 THEN DELETE
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 50 THEN UPDATE SET s = 'upd'""".stripMargin)
      val got = spark.table(tbl2).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq
      assert(got.size == 90, s"delete-first kills the overlap: got ${got.size}")
      assert(got.filter(g => g._1 >= 50 && g._1 < 90).forall(_._2 == "upd"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl2")
  }

  test("MERGE NOT MATCHED BY SOURCE with an EMPTY source applies to every row") {
    import spark.implicits._
    val (tbl, _) = freshTable("nmbs_empty")
    try {
      Seq.empty[(Long, Long)].toDF("id", "nv").createOrReplaceTempView("dml_nmbs_mt")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_nmbs_mt s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.nv
           |WHEN NOT MATCHED BY SOURCE AND t.id >= 10 THEN DELETE""".stripMargin)
      assert(spark.table(tbl).count() == 10, "empty source: all ids >= 10 deleted")
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("NOT MATCHED BY SOURCE clauses refuse source references and key SETs") {
    import spark.implicits._
    val (tbl, _) = freshTable("nmbs_bad")
    try {
      Seq((1L, 1L)).toDF("id", "nv").createOrReplaceTempView("dml_nmbs_bad")
      val e1 = intercept[Exception](spark.sql(
        s"""MERGE INTO $tbl t USING dml_nmbs_bad s ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE AND s.nv > 0 THEN DELETE""".stripMargin))
      // Spark's analyzer itself rejects source references in NMBS
      // conditions (it resolves them against the target side only);
      // our rewrite's targetOnly guard is the second line of defense
      assert(e1.getMessage.contains("only the MERGE target") ||
        e1.getMessage.contains("cannot be resolved"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        s"""MERGE INTO $tbl t USING dml_nmbs_bad s ON t.id = s.id
           |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET id = -1""".stripMargin))
      assert(e2.getMessage.contains("key column"), e2.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("MERGE UPDATE SET * / INSERT *: the no-op key self-assignment is dropped") {
    import spark.implicits._
    val (tbl, _) = freshTable("star")
    try {
      // SET * expands to id = s.id, v = s.v, s = s.s; the id assignment
      // is the ON expression itself — a no-op for matched rows — and must
      // not trip the key-update refusal
      Seq((5L, 555L, "five"), (200L, 2L, "two")).toDF("id", "v", "s")
        .createOrReplaceTempView("dml_star_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING dml_star_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = spark.table(tbl).where("id IN (5, 200)").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
      assert(got == Seq((5L, 555L, "five"), (200L, 2L, "two")), s"got $got")
      // a key assignment that is NOT the ON expression still refuses
      Seq((1L, 2L)).toDF("id", "other").createOrReplaceTempView("dml_star_bad")
      val e = intercept[Exception](spark.sql(
        s"""MERGE INTO $tbl t USING dml_star_bad s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET id = s.other""".stripMargin))
      assert(e.getMessage.contains("key column"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns on catalog tables") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_dml_evo").toString
    val cat = "graftdmlevo"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    for ((mode, t) <- Seq("" -> "cow", ", mergeMode 'mergeOnRead'" -> "mor")) {
      spark.sql(s"CREATE TABLE $cat.db.$t (id BIGINT, v BIGINT) USING reftable " +
        s"OPTIONS (path '$wh/db/$t'$mode)")
      spark.sql(s"INSERT INTO $cat.db.$t VALUES (1, 10), (2, 20)")
      Seq((2L, 99L, "x"), (3L, 30L, "y")).toDF("id", "v", "extra")
        .createOrReplaceTempView(s"dml_evo_src_$t")
      // Spark's ResolveMergeIntoSchemaEvolution sees our
      // AUTOMATIC_SCHEMA_EVOLUTION capability, ALTERs the table (ADD
      // COLUMN), and re-resolves; the engines then assign the declared
      // column no committed file carries yet (old rows null-fill)
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.db.$t t
           |USING dml_evo_src_$t s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = spark.table(s"$cat.db.$t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSeq
      assert(got == Seq((1L, 10L, None), (2L, 99L, Some("x")), (3L, 30L, Some("y"))),
        s"[$t] got $got")
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION on a path (non-catalog) table refuses loudly") {
    import spark.implicits._
    val (tbl, _) = freshTable("evopath")
    try {
      Seq((1L, 99L, 7L)).toDF("id", "v", "extra")
        .createOrReplaceTempView("dml_evopath_src")
      val e = intercept[Exception](spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t USING dml_evopath_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
      // the session-catalog relation cannot evolve its OPTIONS-declared
      // descriptor; Spark refuses during analysis — never a silent narrow
      assert(e.getMessage.contains("SCHEMA_EVOLUTION") ||
        e.getMessage.contains("cannot be resolved"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("DELETE with subquery conditions routes through the mutations (COW + MoR)") {
    import spark.implicits._
    // COW: IN-subquery and correlated EXISTS
    val (tbl, _) = freshTable("subq")
    try {
      Seq(1L, 3L, 5L).toDF("k").createOrReplaceTempView("dml_subq_keys")
      spark.sql(s"DELETE FROM $tbl WHERE id IN (SELECT k FROM dml_subq_keys)")
      assert(spark.table(tbl).count() == 97)
      assert(spark.table(tbl).where("id IN (1, 3, 5)").count() == 0)
      // correlated subqueries cannot be detached — loud analysis refusal,
      // never an executor binding error
      val e = intercept[Exception](spark.sql(s"DELETE FROM $tbl WHERE EXISTS " +
        s"(SELECT 1 FROM dml_subq_keys WHERE k + 10 = $tbl.id)"))
      assert(e.getMessage.contains("correlated"), e.getMessage)
      val e2 = intercept[Exception](spark.sql(s"UPDATE $tbl SET v = -1 WHERE EXISTS " +
        s"(SELECT 1 FROM dml_subq_keys WHERE k = $tbl.id)"))
      assert(e2.getMessage.contains("correlated"), e2.getMessage)
      // uncorrelated UPDATE subqueries stay supported
      spark.sql(s"UPDATE $tbl SET v = -1 WHERE id IN (SELECT k + 1 FROM dml_subq_keys)")
      assert(spark.table(tbl).where("v = -1").count() == 3)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")

    // MoR: the same shape dies by DV positions, no rewrite
    val root = Files.createTempDirectory("graft_dml_subq_mor").toString + "/t"
    val mtbl = "graft_dml_subq_mor"
    spark.sql(s"DROP TABLE IF EXISTS $mtbl")
    spark.sql(s"CREATE TABLE $mtbl USING reftable OPTIONS (path '$root', " +
      s"schema '$ddl', deleteMode 'mergeOnRead')")
    try {
      (0L until 50L).map(i => (i, i, s"s$i")).toDF("id", "v", "s")
        .write.format("reftable").option("path", root).option("schema", ddl)
        .mode("overwrite").save()
      spark.sql(s"DELETE FROM $mtbl WHERE id IN (SELECT k * 2 FROM dml_subq_keys)")
      assert(spark.table(mtbl).count() == 47)
      val cur = VersionedTable.resolve(root, conf).get
      val fs = new org.apache.hadoop.fs.Path(cur).getFileSystem(conf)
      assert(fs.exists(new org.apache.hadoop.fs.Path(cur, "_DV")),
        "subquery DELETE on deleteMode=mergeOnRead stages a DV sidecar")
    } finally spark.sql(s"DROP TABLE IF EXISTS $mtbl")
  }

  test("DELETE with a non-Filter-translatable condition routes through the mutations") {
    // `id % 3 = 0` has no v1 Filter form: the SupportsDelete path would die
    // with "Cannot delete from table"; the rewrite sends it to the COW
    // mutation, which evaluates the arbitrary Column over the pinned read
    val (tbl, _) = freshTable("expr")
    try {
      spark.sql(s"DELETE FROM $tbl WHERE id % 3 = 0 AND v < 50")
      assert(spark.table(tbl).where("id % 3 = 0 AND v < 50").count() == 0)
      val gone = (i: Long) => i % 3 == 0 && i * 10 < 50
      assert(spark.table(tbl).count() == (0L until 100L).count(i => !gone(i)))
      // a still-translatable conjunct set keeps the SupportsDelete path
      spark.sql(s"DELETE FROM $tbl WHERE id >= 90")
      assert(spark.table(tbl).count() == (0L until 90L).count(i => !gone(i)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("UPDATE through the graft TableCatalog works and is CAS-committed") {
    val wh = Files.createTempDirectory("graft_dml_cat").toString
    val cat = "graftdmlcat"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 10), (2, 20)")
    spark.sql(s"UPDATE $cat.db.t SET v = v * 2 WHERE id = 2")
    val got = spark.table(s"$cat.db.t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (2L, 40L)))
    // two commits: the INSERT and the UPDATE (CREATE publishes nothing)
    val root = wh + "/db/t"
    assert(VersionedTable.commitLog(root, conf).size == 2)
  }
}
