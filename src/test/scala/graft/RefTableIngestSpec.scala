package graft

import java.nio.file.Files

import graft.sources.reftable.{RefTableIngest, RefTableOptions, RefTableWrites, VersionedTable}
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.scalatest.funsuite.AnyFunSuite

/** Idempotent landing-zone ingestion (`CALL system.ingest`): every file
  * loads exactly once, re-runs ingest only the delta, crashes between the
  * log and data appends heal on the next call, declared gates apply.
  */
class RefTableIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val conf = new Configuration()

  private def optsFor(root: String, extra: Map[String, String] = Map.empty): RefTableOptions = {
    import scala.jdk.CollectionConverters._
    RefTableOptions.from(new CaseInsensitiveStringMap(
      (Map("path" -> root, "schema" -> "id BIGINT, v BIGINT") ++ extra).asJava))
  }

  private def land(dir: String, name: String, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_ingest_w").toString
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .find(_.getPath.getName.endsWith(".parquet")).get.getPath
    val dest = new org.apache.hadoop.fs.Path(dir, name)
    fs.delete(dest, false) // rename silently no-ops onto an existing dest
    assert(fs.rename(part, dest), s"landing $name failed")
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  private def tableCount(root: String): Long =
    spark.read.format("reftable").option("path", root)
      .option("schema", "id BIGINT, v BIGINT").load().count()

  test("ingests each file exactly once; re-runs load only the delta") {
    val base = Files.createTempDirectory("graft_ingest1").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    land(landing, "a.parquet", (0L until 10L).map(i => (i, i)))
    land(landing, "b.parquet", (10L until 20L).map(i => (i, i)))

    val r1 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r1 == RefTableIngest.Result(2, 0, 0, 1L), r1.toString)
    assert(tableCount(root) == 20)

    // no-op re-run
    val r2 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r2 == RefTableIngest.Result(0, 0, 2, 1L), r2.toString)
    assert(tableCount(root) == 20)

    // delta
    land(landing, "c.parquet", (20L until 25L).map(i => (i, i)))
    val r3 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r3 == RefTableIngest.Result(1, 0, 2, 2L), r3.toString)
    assert(tableCount(root) == 25)
  }

  test("a crash between log and data appends heals on the next call") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ingest2").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    land(landing, "a.parquet", (0L until 10L).map(i => (i, i)))
    val r1 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r1.ingested == 1, r1.toString)

    // simulate the crash: batch 2 reaches the LOG but its data never lands
    land(landing, "b.parquet", (10L until 15L).map(i => (i, i)))
    val fs = new org.apache.hadoop.fs.Path(landing).getFileSystem(conf)
    val bStat = fs.getFileStatus(new org.apache.hadoop.fs.Path(landing, "b.parquet"))
    val logOpts = optsFor(s"$base/t__ingest",
      Map("schema" -> "seq BIGINT, file STRING, bytes BIGINT"))
      .copy(schema = org.apache.spark.sql.types.StructType.fromDDL(
        "seq BIGINT, file STRING, bytes BIGINT"))
    RefTableWrites.appendVersion(logOpts,
      Seq((2L, bStat.getPath.toString, bStat.getLen)).toDF("seq", "file", "bytes"),
      txn = Some(("ingest-log", 2L)))

    val r2 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r2.recovered == 1, s"pending batch completed: $r2")
    assert(tableCount(root) == 15)
    // and it completed exactly once — a further run changes nothing
    val r3 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r3 == RefTableIngest.Result(0, 0, 2, 2L), r3.toString)
    assert(tableCount(root) == 15)
  }

  test("declared expectations gate ingested rows; CALL surface end to end") {
    val wh = Files.createTempDirectory("graft_ingest3").toString
    val cat = "graftingest_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v BIGINT) USING reftable " +
      "OPTIONS (\"expect.nonneg\" 'v >= 0', onViolation 'drop')")
    val landing = s"$wh/landing"
    land(landing, "a.parquet", Seq((1L, 10L), (2L, -5L), (3L, 30L)))
    val row = spark.sql(
      s"CALL $cat.system.ingest(table => 'db.t', source => '$landing')").collect().head
    assert(row.getInt(0) == 1 && row.getLong(3) == 1L, row.toString)
    // the violating row was dropped by the declared gate
    val got = spark.table(s"$cat.db.t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 10L), (3L, 30L)), got.toString)
    // idempotent through SQL too
    val again = spark.sql(
      s"CALL $cat.system.ingest(table => 'db.t', source => '$landing')").collect().head
    assert(again.getInt(0) == 0 && again.getInt(2) == 1, again.toString)
  }

  test("csv and json landing zones ingest through the declared schema") {
    val base = Files.createTempDirectory("graft_ingest5").toString
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(conf)
    def landText(dir: String, name: String, text: String): Unit = {
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      val out = fs.create(new org.apache.hadoop.fs.Path(dir, name), true)
      try out.write(text.getBytes("UTF-8")) finally out.close()
    }
    landText(s"$base/csv", "a.csv", "id,v\n1,10\n2,20\n")
    landText(s"$base/json", "a.json", """{"id":3,"v":30}""" + "\n" + """{"id":4,"v":40}""" + "\n")

    val rCsv = RefTableIngest.ingest(spark, optsFor(s"$base/t1"), s"$base/csv", format = "csv")
    assert(rCsv.ingested == 1, rCsv.toString)
    assert(tableCount(s"$base/t1") == 2)
    val rJson = RefTableIngest.ingest(spark, optsFor(s"$base/t2"), s"$base/json", format = "json")
    assert(rJson.ingested == 1, rJson.toString)
    assert(spark.read.format("reftable").option("path", s"$base/t2")
      .option("schema", "id BIGINT, v BIGINT").load()
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((3L, 30L), (4L, 40L)))

    val e = intercept[Exception] {
      RefTableIngest.ingest(spark, optsFor(s"$base/t3"), s"$base/csv", format = "avro")
    }
    assert(e.getMessage.contains("unsupported format"), e.getMessage)
  }

  test("a re-uploaded file with a NEW length re-ingests; hidden files skipped") {
    val base = Files.createTempDirectory("graft_ingest4").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    land(landing, "a.parquet", (0L until 5L).map(i => (i, i)))
    land(landing, "_meta.parquet", Seq((999L, 999L))) // hidden: never ingested
    val r1 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r1.ingested == 1 && tableCount(root) == 5)
    // replace a.parquet with different content (different length)
    land(landing, "a.parquet", (100L until 110L).map(i => (i, i)))
    val r2 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r2.ingested == 1, r2.toString)
    assert(tableCount(root) == 15, "old 5 rows + re-uploaded 10 rows")
  }

  test("commit-log marker pruning never resurrects a loaded batch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ingest5").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    land(landing, "a.parquet", (0L until 10L).map(i => (i, i)))
    val r1 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r1.ingested == 1 && tableCount(root) == 10)
    // the data-side seq is durably claimed, independent of the commit log
    val seqFile = new org.apache.hadoop.fs.Path(root, "_INGEST_SEQ/1")
    assert(seqFile.getFileSystem(conf).exists(seqFile),
      "_INGEST_SEQ/1 claimed at ingest time")

    // ordinary table writes push the txn:ingest:1 marker past keepVersions
    // (default 3): before the durable seq file, lastCommittedBatch then
    // returned 0 while the log still showed seq 1 — the recovery path
    // re-appended batch 1 (silent duplicate rows)
    (0 until 4).foreach { i =>
      RefTableWrites.appendVersion(optsFor(root),
        Seq((1000L + i, 1000L + i)).toDF("id", "v"))
    }
    assert(RefTableWrites.lastCommittedBatch(root, "ingest", conf).isEmpty,
      "precondition: the ingest marker has pruned out of the retained log")

    val r2 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r2 == RefTableIngest.Result(0, 0, 1, 1L), r2.toString)
    assert(tableCount(root) == 14, "no duplicate of batch 1 after marker pruning")
  }

  test("a crashed winner's FULL logged batch completes, never a subset") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ingest6").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    land(landing, "a.parquet", (0L until 10L).map(i => (i, i)))
    val r1 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r1.ingested == 1)

    // a winner logged a TWO-file batch at seq 2 and crashed before loading
    // — a racing caller with a one-file listing must never load just its
    // subset under the seq (the winner's fuller append would then dedupe
    // away as a marker replay, files logged but never loaded); the
    // recovery path completes the winner's exact logged set
    land(landing, "b.parquet", (10L until 15L).map(i => (i, i)))
    land(landing, "c.parquet", (15L until 22L).map(i => (i, i)))
    val fs = new org.apache.hadoop.fs.Path(landing).getFileSystem(conf)
    def stat(n: String) = fs.getFileStatus(new org.apache.hadoop.fs.Path(landing, n))
    val logOpts = optsFor(s"$base/t__ingest")
      .copy(schema = org.apache.spark.sql.types.StructType.fromDDL(
        "seq BIGINT, file STRING, bytes BIGINT"))
    RefTableWrites.appendVersion(logOpts,
      Seq("b.parquet", "c.parquet")
        .map(n => (2L, stat(n).getPath.toString, stat(n).getLen))
        .toDF("seq", "file", "bytes"),
      txn = Some(("ingest-log", 2L)))

    val r2 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r2.recovered == 2, s"both logged files completed: $r2")
    assert(tableCount(root) == 22)
    val r3 = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r3.ingested == 0 && r3.recovered == 0 && tableCount(root) == 22)
  }

  private def await(deadlineMs: Long = 30000L)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis() + deadlineMs
    while (!cond && System.currentTimeMillis() < end) Thread.sleep(100)
    assert(cond, s"condition not met within ${deadlineMs}ms")
  }

  test("streaming ingest: waves land exactly once; restart replays nothing") {
    val base = Files.createTempDirectory("graft_ingest7").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    land(landing, "a.parquet", (0L until 10L).map(i => (i, i)))
    land(landing, "b.parquet", (10L until 15L).map(i => (i, i)))

    // admission cap 1: the two wave-1 files load on separate triggers
    val q1 = RefTableIngest.ingestStream(spark, optsFor(root), landing,
      triggerMs = 200L, maxFilesPerTrigger = Some(1))
    try {
      await()(VersionedTable.resolve(root, conf).nonEmpty && tableCount(root) == 15)
      // wave 2 lands while the stream runs — discovered on a later trigger
      land(landing, "c.parquet", (15L until 22L).map(i => (i, i)))
      await()(tableCount(root) == 22)
    } finally q1.stop()
    // cap 1 ⇒ one file per seq ⇒ three log batches
    assert(spark.read.format("reftable").option("path", s"${root}__ingest")
      .option("schema", "seq BIGINT, file STRING, bytes BIGINT").load()
      .select("seq").distinct().count() == 3)

    // restart: a NEW stream (fresh checkpoint — idempotence is in the
    // table protocol, not the checkpoint) replays nothing, then ingests
    // only the post-restart wave
    val q2 = RefTableIngest.ingestStream(spark, optsFor(root), landing,
      triggerMs = 200L)
    try {
      Thread.sleep(800) // a few triggers over the already-loaded zone
      assert(tableCount(root) == 22, "restart must not duplicate loaded waves")
      land(landing, "d.parquet", (22L until 25L).map(i => (i, i)))
      await()(tableCount(root) == 25)
    } finally q2.stop()
    // distinct ids prove exactly-once end to end
    assert(spark.read.format("reftable").option("path", root)
      .option("schema", "id BIGINT, v BIGINT").load()
      .select("id").distinct().count() == 25)
  }

  test("streaming ingest: a concurrent zombie stream lands nothing twice") {
    val base = Files.createTempDirectory("graft_ingest8").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    land(landing, "a.parquet", (0L until 10L).map(i => (i, i)))
    val q1 = RefTableIngest.ingestStream(spark, optsFor(root), landing, triggerMs = 200L)
    val q2 = RefTableIngest.ingestStream(spark, optsFor(root), landing, triggerMs = 200L)
    try {
      await()(VersionedTable.resolve(root, conf).nonEmpty && tableCount(root) == 10)
      land(landing, "b.parquet", (10L until 18L).map(i => (i, i)))
      await()(tableCount(root) == 18)
      Thread.sleep(800) // let both streams keep triggering over the same zone
      assert(tableCount(root) == 18, "two streams over one zone must serialize")
    } finally { q1.stop(); q2.stop() }
    assert(spark.read.format("reftable").option("path", root)
      .option("schema", "id BIGINT, v BIGINT").load()
      .select("id").distinct().count() == 18)
  }

  test("drain (AvailableNow analogue) loads everything under the cap, then stops") {
    val base = Files.createTempDirectory("graft_ingest9").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    (0 until 5).foreach(i =>
      land(landing, s"f$i.parquet", (i * 10L until i * 10L + 10L).map(j => (j, j))))
    val r = RefTableIngest.drain(spark, optsFor(root), landing, maxFilesPerCall = Some(2))
    assert(r.ingested == 5, r.toString)
    assert(tableCount(root) == 50)
    assert(r.seq == 3, "cap 2 over 5 files = 3 log batches")
  }

  test("_INGEST_SEQ keeps only the max marker: no per-batch accumulation") {
    val base = Files.createTempDirectory("graft_ingest_seq").toString
    val root = s"$base/t"
    val landing = s"$base/landing"
    (1 to 4).foreach { i =>
      land(landing, s"w$i.parquet", (i * 10L until i * 10L + 5L).map(j => (j, j)))
      RefTableIngest.ingest(spark, optsFor(root), landing)
    }
    assert(tableCount(root) == 20)
    // only the MAX marker is ever read; older ones are dead weight the
    // streaming variant would re-list every trigger, forever
    val dir = new org.apache.hadoop.fs.Path(root, "_INGEST_SEQ")
    val fs = dir.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val markers = fs.listStatus(dir).map(_.getPath.getName).toSeq.sorted
    assert(markers == Seq("4"), s"stale markers must be pruned, got $markers")
    // replay safety intact: a no-op re-run still skips everything
    val r = RefTableIngest.ingest(spark, optsFor(root), landing)
    assert(r.ingested == 0 && r.skipped == 4, r.toString)
  }
}
