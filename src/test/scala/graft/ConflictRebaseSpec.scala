package graft

import java.nio.file.Files

import graft.sources.reftable.{RefTableMutations, VersionedTable}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Conflict-aware commit resolution (logical OCC): a derived publish that
  * loses its CAS to a concurrent commit with a DISJOINT file delta rebases
  * its already-staged output onto the new head instead of re-running the
  * derivation job; overlapping deltas still re-derive. Each test lands the
  * concurrent commit deterministically in the CAS window through
  * VersionedTable.onBeforeClaim.
  */
class ConflictRebaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()
  private val ddl = "id BIGINT, name STRING"

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft_rebase_$name")
    Files.delete(d)
    d.toString
  }

  private def readRows(root: String): Seq[(Long, String)] = spark.read.format("reftable")
    .option("path", root).option("schema", ddl).load()
    .orderBy("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def append(root: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "name").write.format("reftable")
      .option("path", root).option("schema", ddl).mode("append").save()
  }

  /** Two-file base: ids 1–5 in one file, 6–10 in the other (range
    * partitioned so the stats manifests bound each file's ids exactly).
    */
  private def twoFileBase(root: String): Unit = {
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, s"n$i")).toDF("id", "name")
    VersionedTable.publish(df.repartitionByRange(2, col("id")), root)
  }

  /** Arm the one-shot concurrent commit: fires inside the CAS window of the
    * NEXT publish claim, self-clears before acting (its own publish claims
    * too), and records the populate count right after it lands so the test
    * can assert whether the outer mutation's derivation re-ran.
    */
  private def armConcurrent(action: () => Unit): () => Long = {
    @volatile var populatesAfter = -1L
    VersionedTable.onBeforeClaim = Some { _ =>
      VersionedTable.onBeforeClaim = None
      action()
      populatesAfter = VersionedTable.populateRuns.get
    }
    () => populatesAfter
  }

  private def disarm(): Unit = VersionedTable.onBeforeClaim = None

  test("COW delete + concurrent append: rebases, rewrite job runs exactly once") {
    val root = tmpDir("del_app")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    val after = armConcurrent(() => append(root, Seq((20L, "t"))))
    try RefTableMutations.deleteWhere(spark, root, col("id") === 5L)
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0 + 1, "the lost CAS must rebase")
    assert(VersionedTable.populateRuns.get == after(),
      "no populate after the concurrent append landed — the delete's rewrite ran once")
    assert(readRows(root).map(_._1) == ((1L to 10L).filterNot(_ == 5L) :+ 20L),
      "final state = sequential replay of append + delete")
    val log = VersionedTable.commitLog(root, conf)
    assert(log.size == 3, "base, append, rebased delete")
    assert(log.last.parent.contains(log(1).version),
      "the rebased delete's lineage points at the concurrent append")
  }

  test("COW deletes of disjoint files: the loser rebases") {
    val root = tmpDir("del_del_disjoint")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    // theirs touches the 6–10 file; ours the 1–5 file — disjoint rewrites
    val after = armConcurrent(() =>
      RefTableMutations.deleteWhere(spark, root, col("id") === 9L))
    try RefTableMutations.deleteWhere(spark, root, col("id") === 2L)
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0 + 1)
    assert(VersionedTable.populateRuns.get == after())
    assert(readRows(root).map(_._1) == (1L to 10L).filterNot(i => i == 2L || i == 9L))
  }

  test("COW deletes touching the same file: the loser re-derives (no rebase)") {
    val root = tmpDir("del_del_overlap")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    val after = armConcurrent(() =>
      RefTableMutations.deleteWhere(spark, root, col("id") === 4L))
    try RefTableMutations.deleteWhere(spark, root, col("id") === 5L)
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0, "overlapping rewrite must not rebase")
    assert(VersionedTable.populateRuns.get > after(),
      "the delete re-derived from the new head")
    assert(readRows(root).map(_._1) == (1L to 10L).filterNot(i => i == 4L || i == 5L),
      "re-derive is still correct")
  }

  test("upsert + concurrent append outside the key bounds: rebases") {
    import spark.implicits._
    val root = tmpDir("ups_app_far")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    val after = armConcurrent(() => append(root, Seq((100L, "z"))))
    try RefTableMutations.upsert(spark, root,
      Seq((5L, "updated")).toDF("id", "name"), Seq("id"))
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0 + 1,
      "added file [100,100] is provably outside the source key bounds [5,5]")
    assert(VersionedTable.populateRuns.get == after())
    val rows = readRows(root)
    assert(rows.contains((5L, "updated")) && rows.contains((100L, "z")))
    assert(rows.size == 11)
  }

  test("upsert + concurrent append INSIDE the key bounds: re-derives (no duplicate key)") {
    import spark.implicits._
    val root = tmpDir("ups_app_near")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    // blind append of the same key the upsert carries — a rebase would land
    // two id=5 rows, a state no serial order produces
    val after = armConcurrent(() => append(root, Seq((5L, "shadow"))))
    try RefTableMutations.upsert(spark, root,
      Seq((5L, "updated")).toDF("id", "name"), Seq("id"))
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0, "key-overlapping append must re-derive")
    assert(VersionedTable.populateRuns.get > after())
    val rows = readRows(root)
    assert(rows.count(_._1 == 5L) == 1 && rows.contains((5L, "updated")),
      "the re-derived upsert collapsed both id=5 images to the source row")
  }

  test("MoR delete + concurrent append: rebases; positions and append both land") {
    val root = tmpDir("mor_app")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    val after = armConcurrent(() => append(root, Seq((20L, "t"))))
    try RefTableMutations.deleteWhereMergeOnRead(spark, root, col("id") === 7L)
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0 + 1)
    assert(VersionedTable.populateRuns.get == after())
    assert(readRows(root).map(_._1) == ((1L to 10L).filterNot(_ == 7L) :+ 20L))
  }

  test("MoR delete racing a COW rewrite of the marked file: re-derives") {
    import spark.implicits._
    val root = tmpDir("mor_cow")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    // theirs rewrites the 6–10 file (upsert of key 8); our MoR positions
    // were computed against that file's OLD image — stale keys would make
    // our delete silently vanish
    val after = armConcurrent(() => RefTableMutations.upsert(spark, root,
      Seq((8L, "rewritten")).toDF("id", "name"), Seq("id")))
    try RefTableMutations.deleteWhereMergeOnRead(spark, root, col("id") === 7L)
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0,
      "a rewrite of a position-marked file must force a re-derive")
    assert(VersionedTable.populateRuns.get > after())
    val rows = readRows(root)
    assert(!rows.exists(_._1 == 7L), "the re-derived MoR delete still applies")
    assert(rows.contains((8L, "rewritten")))
  }

  test("COW delete racing a concurrent MoR delete on the same file: re-derives") {
    val root = tmpDir("cow_mor")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    // theirs marks positions in the 1–5 file; our staged rewrite of that
    // file derives from its pre-DV image — a rebase would resurrect their
    // deleted row
    val after = armConcurrent(() =>
      RefTableMutations.deleteWhereMergeOnRead(spark, root, col("id") === 3L))
    try RefTableMutations.deleteWhere(spark, root, col("id") === 5L)
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0,
      "new DV positions against our rewrite set must force a re-derive")
    assert(VersionedTable.populateRuns.get > after())
    assert(readRows(root).map(_._1) == (1L to 10L).filterNot(i => i == 3L || i == 5L))
  }

  test("SOAK: genuinely racing writers all land; rebases occur; no lost update") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val root = tmpDir("soak")
    twoFileBase(root) // ids 1..10
    val r0 = VersionedTable.rebasedCommits.get
    // 4 appenders × 3 batches of disjoint ids, racing 2 deleters removing
    // fixed base ids — every interleaving must converge to the same set
    val appenders = (1 to 4).map { t =>
      Future {
        (1 to 3).foreach { b =>
          val ids = (1L to 5L).map(i => t * 1000L + b * 100L + i)
          append(root, ids.map(i => (i, s"w$t")))
        }
      }
    }
    val deleters = Seq(3L, 8L).map { victim =>
      Future { RefTableMutations.deleteWhere(spark, root, col("id") === victim) }
    }
    Await.result(Future.sequence(appenders ++ deleters), 180.seconds)
    val expected = ((1L to 10L).filterNot(i => i == 3L || i == 8L) ++
      (for { t <- 1 to 4; b <- 1 to 3; i <- 1L to 5L } yield t * 1000L + b * 100L + i))
      .sorted
    assert(readRows(root).map(_._1) == expected,
      "every racing commit must land exactly once")
    assert(VersionedTable.rebasedCommits.get > r0,
      "genuine contention must exercise the rebase path")
    // the commit log records one commit per operation (12 appends +
    // 2 deletes + the base publish), less any retention pruning
    val conf2 = new Configuration()
    assert(VersionedTable.lastCommit(root, conf2).exists(_.seq == 15L),
      s"15 commits expected, got ${VersionedTable.lastCommit(root, conf2).map(_.seq)}")
  }

  // Randomized-interleaving soak: a seeded shuffle of {append, COW delete,
  // MoR upsert, changefeed-apply} ops races across 5 writers. Ops own
  // disjoint KEY sets (so every interleaving is logically confluent — the
  // expected final state is unique) but deliberately share FILES (upserts,
  // changefeed updates and deletes all land in the same range files), so
  // losers exercise the overlap rules: file-disjoint → rebase,
  // file-overlapping → re-derive. One deliberately CONTESTED key (7) races
  // a COW delete against a MoR upsert — its final state must match one of
  // the two serial orders. The hand-picked races above pin each rule; this
  // shakes rule INTERACTIONS under genuine concurrency.
  test("SOAK: randomized {append, COW delete, MoR upsert, changefeed} mix converges") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    for (seed <- Seq(11, 47)) {
      val root = tmpDir(s"rsoak$seed")
      val base = (1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      VersionedTable.publish(base.repartitionByRange(4, col("id")), root)
      val p0 = VersionedTable.populateRuns.get
      val r0 = VersionedTable.rebasedCommits.get

      // the op pool: every op is a () => Unit with a disjoint logical key
      // set (except the contested pair at key 7)
      def cf(rows: Seq[(Long, String, String)]) =
        rows.toDF("id", "name", "change_type")
      val ops: Seq[() => Unit] = Seq(
        () => append(root, Seq((101L, "a1"), (102L, "a1"))),
        () => append(root, Seq((201L, "a2"), (202L, "a2"))),
        () => { RefTableMutations.deleteWhere(spark, root, col("id") === 2L); () },
        () => { RefTableMutations.deleteWhereMergeOnRead(spark, root, col("id") === 4L); () },
        () => { RefTableMutations.upsert(spark, root,
          Seq((11L, "u11"), (301L, "u301")).toDF("id", "name"), Seq("id")); () },
        () => { RefTableMutations.upsertMergeOnRead(spark, root,
          Seq((13L, "u13")).toDF("id", "name"), Seq("id")); () },
        () => { RefTableMutations.applyChanges(spark, root,
          cf(Seq((401L, "c401", "insert"), (17L, "c17", "update"), (12L, "", "delete"))),
          Seq("id")); () },
        () => { RefTableMutations.applyChangesMergeOnRead(spark, root,
          cf(Seq((19L, "c19", "update"), (14L, "", "delete"))), Seq("id")); () },
        // the contested pair: COW delete vs MoR upsert of key 7
        () => { RefTableMutations.deleteWhere(spark, root, col("id") === 7L); () },
        () => { RefTableMutations.upsertMergeOnRead(spark, root,
          Seq((7L, "u7")).toDF("id", "name"), Seq("id")); () })
      val shuffled = new scala.util.Random(seed).shuffle(ops)
      // 5 writers × 2 sequential ops, all racing
      val writers = shuffled.grouped(2).toSeq.map { group =>
        Future { group.foreach(op => op()) }
      }
      Await.result(Future.sequence(writers), 300.seconds)

      val rows = readRows(root)
      assert(rows.map(_._1).distinct.size == rows.size,
        s"no key may appear twice (seed $seed): ${rows.groupBy(_._1).filter(_._2.size > 1)}")
      val got = rows.toMap
      val expectedStable = (
        (1L to 20L).filterNot(Seq(2L, 4L, 12L, 14L, 7L).contains).map(i => i -> s"n$i").toMap
          ++ Map(11L -> "u11", 13L -> "u13", 17L -> "c17", 19L -> "c19",
            101L -> "a1", 102L -> "a1", 201L -> "a2", 202L -> "a2",
            301L -> "u301", 401L -> "c401"))
      assert(got - 7L == expectedStable,
        s"non-contested keys must land every effect exactly once (seed $seed)")
      assert(got.get(7L).forall(_ == "u7"),
        s"contested key must match a serial order: got ${got.get(7L)} (seed $seed)")
      // every op committed exactly once: base + 10 ops
      assert(VersionedTable.lastCommit(root, conf).exists(_.seq == 11L),
        s"11 commits expected, got ${VersionedTable.lastCommit(root, conf).map(_.seq)}")
      // each op populates at least once; retries are bounded by maxAttempts
      val pDelta = VersionedTable.populateRuns.get - p0
      assert(pDelta >= 10, s"10 ops must each stage at least once, saw $pDelta")
      // genuine contention resolved through SOME conflict path
      assert(pDelta > 10 || VersionedTable.rebasedCommits.get > r0,
        s"racing writers must exercise rebase or re-derive (seed $seed)")
    }
  }

  test("append + concurrent append: the loser rebases without re-staging its batch") {
    val root = tmpDir("app_app")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    val after = armConcurrent(() => append(root, Seq((30L, "w1"))))
    try append(root, Seq((40L, "w2")))
    finally disarm()
    assert(VersionedTable.rebasedCommits.get == r0 + 1)
    assert(VersionedTable.populateRuns.get == after(),
      "the losing append never re-staged its data files")
    assert(readRows(root).map(_._1) == ((1L to 10L) ++ Seq(30L, 40L)))
  }

  test("a rebased commit re-stamps PAST the head it lands on; ts: resolves to it") {
    val root = tmpDir("restamp")
    twoFileBase(root)
    val after = armConcurrent(() => append(root, Seq((20L, "t"))))
    try RefTableMutations.deleteWhere(spark, root, col("id") === 5L)
    finally disarm()
    val log = VersionedTable.commitLog(root, conf)
    assert(log.size == 3, "base, concurrent append, rebased delete")
    val appendV = log(1).version
    val rebasedV = log(2).version
    // the staged delete was stamped BEFORE the concurrent append landed; a
    // rebase that kept that name would (a) sit below the orphan-sweep
    // retention floor once keepVersions commits land and (b) break the
    // name-order/commit-order agreement time travel leans on
    assert(VersionedTable.versionTimestampMs(rebasedV) >
      VersionedTable.versionTimestampMs(appendV),
      s"rebased commit must re-stamp past its new parent ($rebasedV !> $appendV)")
    assert(VersionedTable.resolveAsOf(root, System.currentTimeMillis() + 1000)
      .contains(rebasedV), "TIMESTAMP AS OF 'now' must resolve to the rebased head")
    assert(readRows(root).map(_._1) == ((1L to 10L).filterNot(_ == 5L) :+ 20L))
  }

  test("a staged dir wiped mid-rebase (sweep race) re-derives — never commits empty") {
    val root = tmpDir("swept")
    twoFileBase(root)
    val r0 = VersionedTable.rebasedCommits.get
    val after = armConcurrent(() => append(root, Seq((20L, "t"))))
    // simulate the orphan sweep racing the rebase loop: the staged dir is
    // deleted and recreated EMPTY right before the existence check — the
    // pre-fix code would commit a manifest whose delta silently dropped
    // every surviving row of the rewritten file
    VersionedTable.onBeforeRebaseCommit = Some { staged =>
      VersionedTable.onBeforeRebaseCommit = None
      val p = new org.apache.hadoop.fs.Path(staged)
      val fs = p.getFileSystem(conf)
      fs.delete(p, true)
      fs.mkdirs(p)
    }
    try RefTableMutations.deleteWhere(spark, root, col("id") === 5L)
    finally { disarm(); VersionedTable.onBeforeRebaseCommit = None }
    assert(VersionedTable.rebasedCommits.get == r0,
      "the wiped staging must NOT land as a rebased commit")
    assert(VersionedTable.populateRuns.get > after(),
      "the mutation must fall back to a full re-derive")
    assert(readRows(root).map(_._1) == ((1L to 10L).filterNot(_ == 5L) :+ 20L),
      "no rows lost: re-derive replays the delete on the appended head")
  }

  test("resolveAsOf follows commit-log sequence, not name order (legacy logs)") {
    // fabricate the state a pre-re-stamp rebase left behind: seq 2's
    // version NAME is stamped OLDER than seq 1's. Name-order resolution
    // hands 'now' the seq-1 snapshot; sequence order must win.
    val root = tmpDir("asof_seq")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    val older = f"v${1000L}%019d" + "_aaaaaaaa"
    val newer = f"v${2000L}%019d" + "_bbbbbbbb"
    Seq(newer, older).foreach { v =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(root, v))
    }
    def writeCommit(seq: Long, version: String): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(root, VersionedTable.CommitsDir), f"$seq%020d"), true)
      try out.write(s"$version\n\n".getBytes("UTF-8")) finally out.close()
    }
    writeCommit(1L, newer) // seq 1 carries the NEWER-named dir
    writeCommit(2L, older) // seq 2 (the real head) carries the OLDER name
    assert(VersionedTable.resolveAsOf(root, 5000L).contains(older),
      "ts: at 'now' must resolve to the max-seq commit, not the max-named dir")
    assert(VersionedTable.resolveAsOf(root, 1500L).contains(older),
      "ts: between the stamps resolves the only commit stamped at-or-before")
    assert(VersionedTable.resolveAsOf(root, 500L).isEmpty,
      "ts: before every stamp predates the table")
  }
}
