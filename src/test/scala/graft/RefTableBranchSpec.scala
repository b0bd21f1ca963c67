package graft

import java.nio.file.Files

import graft.sources.reftable.{RefTableMutations, VersionedTable}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Writable branches: a named, independently writable lineage forked
  * zero-copy off a committed version; every read/write surface targets it
  * via the `branch` option; fast-forward publishes the branch head back to
  * main CAS-guarded on the fork version (main moved ⇒ loud refusal).
  */
class RefTableBranchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_branch_$name").toString + "/t"

  private val ddl = "id BIGINT, v BIGINT"

  private def readMain(root: String) =
    spark.read.format("reftable").option("path", root).option("schema", ddl).load()
  private def readBranch(root: String, b: String) =
    spark.read.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", b).load()

  test("write to branch + fast-forward equals the linear history; main isolated") {
    import spark.implicits._
    val root = tmp("ff")
    VersionedTable.publish((1L to 10L).map(i => (i, i)).toDF("id", "v"), root)
    val fork = VersionedTable.createBranch(root, "dev")
    assert(VersionedTable.branches(root).map(_._1) == Seq("dev"))

    // branch work: an append THROUGH THE OPTION surface + a COW delete on
    // the branch root — main must see none of it
    Seq((11L, 11L), (12L, 12L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    RefTableMutations.deleteWhere(spark,
      VersionedTable.branchRoot(root, "dev"), col("id") <= 2L)
    assert(readMain(root).count() == 10, "main untouched by branch writes")
    assert(readBranch(root, "dev").count() == 10, "10 - 2 + 2")

    // fast-forward: branch head content becomes main's next version
    val promoted = VersionedTable.fastForward(root, "dev")
    val got = readMain(root).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == ((3L to 12L)), s"linear-history equivalent, got $got")
    // history preserved: the pre-FF main version is still time-travelable
    val before = readMain(root).count()
    assert(before == 10)
    assert(spark.read.format("reftable").option("path", root)
      .option("schema", ddl).option("version", fork).load().count() == 10)
    assert(VersionedTable.resolve(root, conf).exists(_.endsWith(promoted)))
  }

  test("main moving after the fork makes fast-forward refuse loudly") {
    import spark.implicits._
    val root = tmp("cas")
    VersionedTable.publish((1L to 5L).map(i => (i, i)).toDF("id", "v"), root)
    VersionedTable.createBranch(root, "dev")
    Seq((100L, 100L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    // concurrent main write AFTER the fork
    Seq((200L, 200L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .mode("append").save()
    val e = intercept[VersionedTable.CommitConflictException] {
      VersionedTable.fastForward(root, "dev")
    }
    assert(e.getMessage.contains("lost the claim") || e.getMessage.nonEmpty)
    // nothing landed: main keeps its own lineage, branch keeps its work
    assert(readMain(root).count() == 6)
    assert(readBranch(root, "dev").count() == 6)
  }

  test("a branch cycles: fast-forward, more branch work, fast-forward again") {
    import spark.implicits._
    val root = tmp("cycle")
    VersionedTable.publish(Seq((1L, 1L)).toDF("id", "v"), root)
    VersionedTable.createBranch(root, "dev")
    def appendBranch(i: Long): Unit =
      Seq((i, i)).toDF("id", "v").write.format("reftable")
        .option("path", root).option("schema", ddl).option("branch", "dev")
        .mode("append").save()
    appendBranch(2L)
    VersionedTable.fastForward(root, "dev")
    assert(readMain(root).count() == 2)
    // the fork re-pointed at the promoted version: another round works
    appendBranch(3L)
    VersionedTable.fastForward(root, "dev")
    assert(readMain(root).orderBy("id").collect().map(_.getLong(0)).toSeq
      == Seq(1L, 2L, 3L))
  }

  test("racing createBranch claims exactly one; drop releases the name") {
    import spark.implicits._
    val root = tmp("race")
    VersionedTable.publish(Seq((1L, 1L)).toDF("id", "v"), root)
    VersionedTable.createBranch(root, "dev")
    val e = intercept[IllegalArgumentException] {
      VersionedTable.createBranch(root, "dev")
    }
    assert(e.getMessage.contains("already exists"))
    assert(VersionedTable.dropBranch(root, "dev"))
    assert(VersionedTable.branches(root).isEmpty)
    VersionedTable.createBranch(root, "dev") // the name is reusable
    intercept[IllegalArgumentException] {
      VersionedTable.createBranch(root, "no/slash")
    }
  }

  test("SQL DML on a branch through the t$branch$<name> identifier") {
    val wh = Files.createTempDirectory("graft_branch_wh2").toString
    val cat = "graftbr2_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 10), (2, 20)")
    spark.sql(s"CALL $cat.system.create_branch(table => 'db.t', name => 'dev')")

    // the branch is a FULL relation: INSERT / UPDATE / DELETE in plain SQL
    spark.sql(s"INSERT INTO $cat.db.`t$$branch$$dev` VALUES (3, 3)")
    spark.sql(s"UPDATE $cat.db.`t$$branch$$dev` SET v = 30 WHERE id = 3")
    spark.sql(s"DELETE FROM $cat.db.`t$$branch$$dev` WHERE id = 1")
    val br = spark.sql(s"SELECT id, v FROM $cat.db.`t$$branch$$dev` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(br == Seq((2L, 20L), (3L, 30L)), br.toString)
    // main untouched until the fast-forward publishes the branch head
    assert(spark.table(s"$cat.db.t").count() == 2)
    spark.sql(s"CALL $cat.system.fast_forward(table => 'db.t', name => 'dev')")
    val main = spark.sql(s"SELECT id, v FROM $cat.db.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(main == br)
    // a never-created branch refuses loudly, naming the remedy
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.db.`t$$branch$$nope`").collect()
    }
    assert(msgsOf(e).exists(_.contains("create_branch")), e.toString)
  }

  private def msgsOf(x: Throwable): Seq[String] =
    if (x == null) Nil else Option(x.getMessage).toSeq ++ msgsOf(x.getCause)

  test("branches preserve a Hive-partitioned layout through fork and fast-forward") {
    val wh = Files.createTempDirectory("graft_branch_wh3").toString
    val cat = "graftbr3_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.p (id BIGINT, dt STRING) USING reftable " +
      "OPTIONS (partitionColumns 'dt')")
    spark.sql(s"INSERT INTO $cat.db.p VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"CALL $cat.system.create_branch(table => 'db.p', name => 'dev')")
    spark.sql(s"INSERT INTO $cat.db.`p$$branch$$dev` VALUES (3, 'a'), (4, 'c')")
    // the branch serves partition values (directory-encoded, not in the
    // data pages) — a mislaid layout would read them as null
    val br = spark.sql(s"SELECT id, dt FROM $cat.db.`p$$branch$$dev` ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(br == Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")), br.toString)
    spark.sql(s"CALL $cat.system.fast_forward(table => 'db.p', name => 'dev')")
    val main = spark.sql(s"SELECT id, dt FROM $cat.db.p WHERE dt = 'a' ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(main == Seq((1L, "a"), (3L, "a")), main.toString)
  }

  test("SQL surface: CALL create_branch / fast_forward / drop_branch + t$branches") {
    val wh = Files.createTempDirectory("graft_branch_wh").toString
    val cat = "graftbr_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 1), (2, 2)")
    spark.sql(s"CALL $cat.system.create_branch(table => 'db.t', name => 'dev')")
    val root = s"$wh/db/t"
    // branch write through the option surface, visible in t$branches
    import spark.implicits._
    Seq((3L, 3L)).toDF("id", "v").write.format("reftable")
      .option("path", root).option("schema", ddl).option("branch", "dev")
      .mode("append").save()
    val rows = spark.sql(s"SELECT * FROM $cat.db.`t$$branches`").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "dev")
    assert(rows(0).getString(1) != rows(0).getString(2),
      "branch head moved past the fork")
    // catalog reads take `branch` as a schema-preserving PER-SCAN option
    assert(spark.read.option("branch", "dev").table(s"$cat.db.t").count() == 3)
    assert(spark.table(s"$cat.db.t").count() == 2, "main still unforked")
    spark.sql(s"CALL $cat.system.fast_forward(table => 'db.t', name => 'dev')")
    assert(spark.table(s"$cat.db.t").count() == 3)
    spark.sql(s"CALL $cat.system.drop_branch(table => 'db.t', name => 'dev')")
    assert(spark.sql(s"SELECT * FROM $cat.db.`t$$branches`").collect().isEmpty)
  }

  test("a write to a never-created branch refuses instead of forging an orphan lineage") {
    import spark.implicits._
    val root = tmp("orphan")
    VersionedTable.publish((1L to 5L).map(i => (i, i)).toDF("id", "v"), root)
    // the `branch` option is a pure path rewrite — without the guard this
    // would silently publish under _BRANCHES/typo with no _FORK marker
    val e = intercept[IllegalArgumentException] {
      Seq((6L, 6L)).toDF("id", "v")
        .write.format("reftable").option("path", root).option("schema", ddl)
        .option("branch", "typo").mode("append").save()
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    // the direct branch-root path is guarded the same way
    val e2 = intercept[IllegalArgumentException] {
      Seq((6L, 6L)).toDF("id", "v")
        .write.format("reftable")
        .option("path", VersionedTable.branchRoot(root, "typo"))
        .option("schema", ddl).mode("append").save()
    }
    assert(e2.getMessage.contains("does not exist"), e2.getMessage)
    assert(VersionedTable.branches(root).isEmpty, "no orphan lineage landed")
    // after createBranch the same write goes through
    VersionedTable.createBranch(root, "typo")
    Seq((6L, 6L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "typo").mode("append").save()
    assert(readBranch(root, "typo").count() == 6)
  }

  test("fastForward self-heals the crash window between promote and fork re-point") {
    import spark.implicits._
    val root = tmp("heal")
    VersionedTable.publish((1L to 5L).map(i => (i, i)).toDF("id", "v"), root)
    val fork = VersionedTable.createBranch(root, "dev")
    Seq((6L, 6L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    // simulate the crash: the promote lands but the fork marker is never
    // re-pointed (exactly what a JVM dying between the two calls leaves)
    val promoted = VersionedTable.promote(
      VersionedTable.branchRoot(root, "dev"), root, expectedBase = Some(fork))
    assert(VersionedTable.branchFork(root, "dev", conf).contains(fork),
      "precondition: marker still at the old fork")
    // un-healed, this threw CommitConflictException forever; now it
    // recognizes main's head as this branch's own promote, re-points, and
    // returns the already-promoted version
    val healed = VersionedTable.fastForward(root, "dev")
    assert(healed == promoted)
    assert(VersionedTable.branchFork(root, "dev", conf).contains(promoted))
    // the branch cycles normally afterwards
    Seq((7L, 7L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    VersionedTable.fastForward(root, "dev")
    assert(readMain(root).count() == 7)
  }

  test("rebaseBranch replays a disjoint branch delta onto a moved main") {
    import spark.implicits._
    val root = tmp("rebase")
    // two range files: ids 1–10 and 11–20
    VersionedTable.publish(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").repartitionByRange(2, col("id")), root)
    VersionedTable.createBranch(root, "dev")
    // branch work: delete from the LOW file + append new rows
    RefTableMutations.deleteWhere(spark,
      VersionedTable.branchRoot(root, "dev"), col("id") <= 3L)
    Seq((21L, 21L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    // main moves concurrently: an append (new file — disjoint by nature)
    Seq((100L, 100L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .mode("append").save()
    // plain fast-forward refuses (main moved)...
    intercept[VersionedTable.CommitConflictException] {
      VersionedTable.fastForward(root, "dev")
    }
    // ...rebase replays the branch delta on top of main's append
    val promoted = VersionedTable.rebaseBranch(root, "dev")
    val got = readMain(root).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == ((4L to 21L) :+ 100L),
      s"main = head + branch delta (delete 1-3, add 21), got $got")
    assert(VersionedTable.resolve(root, conf).exists(_.endsWith(promoted)))
    // the branch re-synced and cycles: its content equals main, its fork
    // points at the promoted version, and further work fast-forwards
    assert(VersionedTable.branchFork(root, "dev", conf).contains(promoted))
    assert(readBranch(root, "dev").orderBy("id").collect().map(_.getLong(0)).toSeq == got)
    Seq((22L, 22L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    VersionedTable.fastForward(root, "dev")
    assert(readMain(root).count() == got.size + 1)
  }

  test("rebaseBranch cycles: a SECOND rebase diffs against the synced baseline") {
    import spark.implicits._
    val root = tmp("rebase2")
    VersionedTable.publish(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").repartitionByRange(2, col("id")), root)
    VersionedTable.createBranch(root, "dev")
    // round 1: branch appends 21, main appends 100 → rebase
    Seq((21L, 21L)).toDF("id", "v").write.format("reftable").option("path", root)
      .option("schema", ddl).option("branch", "dev").mode("append").save()
    Seq((100L, 100L)).toDF("id", "v").write.format("reftable").option("path", root)
      .option("schema", ddl).mode("append").save()
    VersionedTable.rebaseBranch(root, "dev")
    // round 2: branch appends 22, main appends 200 → rebase again. Without
    // the recorded baseline the second diff would re-apply round 1's delta
    // and refuse with a collision.
    Seq((22L, 22L)).toDF("id", "v").write.format("reftable").option("path", root)
      .option("schema", ddl).option("branch", "dev").mode("append").save()
    Seq((200L, 200L)).toDF("id", "v").write.format("reftable").option("path", root)
      .option("schema", ddl).mode("append").save()
    VersionedTable.rebaseBranch(root, "dev")
    val got = readMain(root).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == ((1L to 22L) ++ Seq(100L, 200L)), s"both rounds composed: $got")
  }

  test("rebaseBranch refuses overlapping rewrites and un-materialized DVs") {
    import spark.implicits._
    val root = tmp("rebase_refuse")
    VersionedTable.publish(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").repartitionByRange(2, col("id")), root)
    VersionedTable.createBranch(root, "dev")
    // both sides rewrite the LOW file → overlap
    RefTableMutations.deleteWhere(spark,
      VersionedTable.branchRoot(root, "dev"), col("id") === 2L)
    RefTableMutations.deleteWhere(spark, root, col("id") === 3L)
    val e = intercept[IllegalStateException] { VersionedTable.rebaseBranch(root, "dev") }
    assert(e.getMessage.contains("overlapping"), e.getMessage)
    // main untouched by the refusal
    assert(readMain(root).count() == 19)

    // a branch with un-materialized deletion vectors refuses with the remedy
    val root2 = tmp("rebase_dv")
    VersionedTable.publish(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").repartitionByRange(2, col("id")), root2)
    VersionedTable.createBranch(root2, "dev")
    RefTableMutations.deleteWhereMergeOnRead(spark,
      VersionedTable.branchRoot(root2, "dev"), col("id") === 2L)
    Seq((100L, 100L)).toDF("id", "v").write.format("reftable").option("path", root2)
      .option("schema", ddl).mode("append").save()
    val e2 = intercept[UnsupportedOperationException] {
      VersionedTable.rebaseBranch(root2, "dev")
    }
    assert(e2.getMessage.contains("compact"), e2.getMessage)
  }

  test("SQL surface: CALL rebase_branch") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_branch_sqlrb").toString
    val cat = "graftrb"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.reftable.RefTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    try {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING reftable")
      spark.sql(s"INSERT INTO $cat.db.t VALUES (1, 1), (2, 2)")
      spark.sql(s"CALL $cat.system.create_branch(table => 'db.t', name => 'dev')")
      spark.sql(s"INSERT INTO $cat.db.`t$$branch$$dev` VALUES (3, 3)")
      spark.sql(s"INSERT INTO $cat.db.t VALUES (10, 10)") // main moves
      val v = spark.sql(
        s"CALL $cat.system.rebase_branch(table => 'db.t', name => 'dev')").collect()
      assert(v.length == 1 && v.head.getString(0).nonEmpty)
      assert(spark.table(s"$cat.db.t").orderBy("id").collect().map(_.getLong(0)).toSeq ==
        Seq(1L, 2L, 3L, 10L))
    } finally {
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.warehouse")
    }
  }

  private def hPath(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Rewrite a branch's _FORK marker WITHOUT its "base" field — the state
    * every pre-round-16 branch is in (legacy discovery path).
    */
  private def stripForkBase(root: String, b: String): Unit = {
    val fork = VersionedTable.branchFork(root, b, conf).get
    val p = hPath(VersionedTable.branchRoot(root, b) + "/_FORK")
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write(s"""{"version":"$fork","created":0}""".getBytes("UTF-8"))
    finally out.close()
  }

  /** Delete the branch's seq-1 (clone) commit record — what log retention
    * does once keepVersions branch commits have landed.
    */
  private def expireCloneCommit(bRoot: String): Unit = {
    val dir = hPath(bRoot + "/" + VersionedTable.CommitsDir)
    val fs = dir.getFileSystem(conf)
    val min = fs.listStatus(dir).map(_.getPath).minBy(_.getName)
    fs.delete(min, false)
  }

  test("stale marker from a CONCURRENT promote: fastForward lands the missed commits") {
    import spark.implicits._
    val root = tmp("concheal")
    VersionedTable.publish((1L to 5L).map(i => (i, i)).toDF("id", "v"), root)
    val fork = VersionedTable.createBranch(root, "dev")
    Seq((6L, 6L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    // the concurrent caller's promote lands without the fork re-point...
    VersionedTable.promote(
      VersionedTable.branchRoot(root, "dev"), root, expectedBase = Some(fork))
    // ...and the branch advances PAST it before our fastForward runs
    Seq((7L, 7L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    // pre-fix: the heal returned the concurrent promote as "success",
    // silently leaving id=7 unpromoted and the rebase baseline stale
    val promoted = VersionedTable.fastForward(root, "dev")
    assert(readMain(root).orderBy("id").collect().map(_.getLong(0)).toSeq == (1L to 7L),
      "fastForward must land the branch commits the concurrent promote missed")
    assert(VersionedTable.branchFork(root, "dev", conf).contains(promoted))
    // and when the landed promote already IS the branch head's content,
    // the heal returns it AND records the baseline (no duplicate publish)
    val fork2 = VersionedTable.branchFork(root, "dev", conf).get
    Seq((8L, 8L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    val landed = VersionedTable.promote(
      VersionedTable.branchRoot(root, "dev"), root, expectedBase = Some(fork2))
    val healed = VersionedTable.fastForward(root, "dev")
    assert(healed == landed, "content-equal heal returns the landed promote")
    assert(VersionedTable.lastCommit(root, conf).exists(_.version == landed),
      "no duplicate promote published")
    assert(VersionedTable.branchBase(root, "dev", conf).nonEmpty,
      "content-equal heal records the rebase baseline")
  }

  test("rebaseBranch legacy fallback accepts the clone dir via its _CLONE marker") {
    import spark.implicits._
    val root = tmp("cloneok")
    VersionedTable.publish(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").repartitionByRange(2, col("id")), root)
    VersionedTable.createBranch(root, "dev")
    val bRoot = VersionedTable.branchRoot(root, "dev")
    RefTableMutations.deleteWhere(spark, bRoot, col("id") <= 3L)
    Seq((21L, 21L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .option("branch", "dev").mode("append").save()
    Seq((100L, 100L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .mode("append").save() // main moves
    // legacy state: no recorded base, clone commit record expired — but the
    // clone DIR survives, and its staged _CLONE marker proves what it is
    stripForkBase(root, "dev")
    expireCloneCommit(bRoot)
    val promoted = VersionedTable.rebaseBranch(root, "dev")
    assert(readMain(root).orderBy("id").collect().map(_.getLong(0)).toSeq ==
      ((4L to 21L) :+ 100L), "verified-clone fallback rebases correctly")
    assert(VersionedTable.resolve(root, conf).exists(_.endsWith(promoted)))
  }

  test("rebaseBranch REFUSES an unverifiable baseline instead of resurrecting rows") {
    import spark.implicits._
    val root = tmp("clonegone")
    VersionedTable.publish(
      (1L to 20L).map(i => (i, i)).toDF("id", "v").repartitionByRange(2, col("id")), root)
    VersionedTable.createBranch(root, "dev")
    val bRoot = VersionedTable.branchRoot(root, "dev")
    val cloneDir = VersionedTable.versionDirs(bRoot, conf).head
    // the branch rewrites EVERYTHING (no file of the clone survives), so
    // the clone dir is vacuum-collectable once its commit record expires
    VersionedTable.publish((50L to 60L).map(i => (i, i)).toDF("id", "v"), bRoot)
    Seq((100L, 100L)).toDF("id", "v")
      .write.format("reftable").option("path", root).option("schema", ddl)
      .mode("append").save() // main moves
    stripForkBase(root, "dev")
    expireCloneCommit(bRoot)
    hPath(bRoot + "/" + cloneDir).getFileSystem(conf)
      .delete(hPath(bRoot + "/" + cloneDir), true) // vacuumed clone
    // the earliest SURVIVING dir postdates the clone: diffing against it
    // would drop the branch's older removals and resurrect deleted rows on
    // main — the only safe answer is the loud re-branch remedy
    val e = intercept[IllegalStateException] { VersionedTable.rebaseBranch(root, "dev") }
    assert(e.getMessage.contains("re-branch from main and replay"))
    assert(readMain(root).count() == 21, "main untouched by the refused rebase")
  }
}
