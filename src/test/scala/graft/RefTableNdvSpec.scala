package graft

import java.nio.file.Files

import graft.sources.reftable.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column NDV statistics for the CBO: the `ndvStats` writer option lands
  * per-file mergeable HLL sketches in the stats manifest; the scan unions
  * the surviving files' sketches and reports per-column distinct counts
  * through DSv2 column statistics, so equality-filter selectivity and the
  * broadcast build side are decided at PLAN time from real NDVs — no AQE
  * re-plan needed.
  */
class RefTableNdvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_ndv_$name").toString + "/t"

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ndvStats sketches surface as catalyst column stats (scan relation)") {
    import spark.implicits._
    val root = tmp("stats")
    // 50k rows, k has exactly 1000 distinct values, spread over 4 files
    (0L until 50000L).map(i => (i, i % 1000L, i * 7L)).toDF("id", "k", "v")
      .repartition(4)
      .write.format("reftable").option("path", root)
      .option("schema", "id BIGINT, k BIGINT, v BIGINT")
      .option("ndvStats", "k").mode("overwrite").save()
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val df = spark.read.format("reftable").option("path", root)
        .option("schema", "id BIGINT, k BIGINT, v BIGINT").load()
      val leafStats = df.queryExecution.optimizedPlan.collectLeaves().head.stats
      assert(leafStats.rowCount.exists(_.toLong == 50000L), leafStats.toString)
      val kStat = leafStats.attributeStats.find(_._1.name == "k").map(_._2)
      assert(kStat.exists(_.distinctCount.isDefined),
        s"NDV for k must reach catalyst stats, got $leafStats")
      val ndv = kStat.get.distinctCount.get.toLong
      assert(ndv > 900 && ndv < 1100, s"HLL union estimate off: $ndv vs 1000")
      assert(kStat.get.nullCount.exists(_.toLong == 0L))
    }
    // t$files-style audit surface: every file carries a sketch
    val cur = VersionedTable.resolve(root).get
    val listing = graft.sources.reftable.SnapshotFiles.list(root, Nil, None)
    val stats = graft.sources.reftable.RefTableStats.statsForListing(
      cur, listing, new org.apache.hadoop.conf.Configuration())
    assert(listing.forall(f => stats(f.path).cols.get("k").exists(_.hll.isDefined)))
  }

  test("3-way join picks the broadcast build side from reported NDVs, AQE off") {
    import spark.implicits._
    val dimRoot = tmp("dim")
    // dim: 200k rows x 3 longs — raw bytes far above the broadcast
    // threshold; k has NDV 1000, so `k = 7` selects ~200 rows under CBO
    (0L until 200000L).map(i => (i, i % 1000L, i)).toDF("j", "k", "w")
      .repartition(2)
      .write.format("reftable").option("path", dimRoot)
      .option("schema", "j BIGINT, k BIGINT, w BIGINT")
      .option("ndvStats", "k").mode("overwrite").save()
    val factRoot = tmp("fact")
    (0L until 100000L).map(i => (i % 50000L, i)).toDF("j", "x")
      .repartition(2)
      .write.format("reftable").option("path", factRoot)
      .option("schema", "j BIGINT, x BIGINT").mode("overwrite").save()
    val dim2 = (0L until 100L).map(i => (i, s"n$i")).toDF("g", "nm")

    def plan(cbo: Boolean): String = withConfsR(
      "spark.sql.cbo.enabled" -> cbo.toString,
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {
      val dim = spark.read.format("reftable").option("path", dimRoot)
        .option("schema", "j BIGINT, k BIGINT, w BIGINT").load()
        .filter(col("k") === 7L)
      val fact = spark.read.format("reftable").option("path", factRoot)
        .option("schema", "j BIGINT, x BIGINT").load()
      fact.join(dim, "j").withColumn("g", col("x") % 100L)
        .join(broadcast(dim2), "g")
        .queryExecution.executedPlan.toString
    }
    val withNdv = plan(cbo = true)
    // the filtered dim's estimated output (rows/NDV) sits far below the
    // threshold — the planner picks BroadcastHashJoin for fact ⋈ dim at
    // plan time, from the reported NDV alone (AQE is off)
    assert(withNdv.split("BroadcastHashJoin").length - 1 >= 2,
      s"fact-dim join must broadcast the NDV-filtered dim:\n$withNdv")
    // without CBO the same join cannot prove the filter shrinks the dim:
    // raw scan bytes stay above the threshold, so it sort-merges
    val withoutCbo = plan(cbo = false)
    assert(withoutCbo.contains("SortMergeJoin"),
      s"without column stats the dim join must NOT broadcast:\n$withoutCbo")
  }

  // like withConfs but returning the body's value
  private def withConfsR[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("CALL system.analyze backfills NDV sketches on an existing table") {
    val wh = Files.createTempDirectory("graft_ndv_wh").toString
    val cat = "graftndv_" + java.util.UUID.randomUUID().toString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.reftable.RefTableCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, k BIGINT) USING reftable")
    spark.sql(s"INSERT INTO $cat.db.t SELECT id, id % 300 FROM range(20000)")
    def kNdv(): Option[Long] = withConfsR("spark.sql.cbo.enabled" -> "true") {
      spark.table(s"$cat.db.t").queryExecution.optimizedPlan
        .collectLeaves().head.stats
        .attributeStats.find(_._1.name == "k").flatMap(_._2.distinctCount)
        .map(_.toLong)
    }
    assert(kNdv().isEmpty, "no sketches before ANALYZE")
    spark.sql(s"CALL $cat.system.analyze(table => 'db.t', columns => 'k')")
    val ndv = kNdv()
    assert(ndv.exists(n => n > 270 && n < 330), s"post-analyze NDV ~300, got $ndv")
    val e = intercept[Exception] {
      spark.sql(s"CALL $cat.system.analyze(table => 'db.t', columns => 'nope')")
    }
    assert(e.getMessage.contains("unknown column"), e.getMessage)
  }

  test("appends sketch only their NEW files; coverage spans hosting versions") {
    import spark.implicits._
    val root = tmp("append")
    def write(lo: Long, hi: Long, mode: String): Unit =
      (lo until hi).map(i => (i, i % 100L)).toDF("id", "k")
        .coalesce(1)
        .write.format("reftable").option("path", root)
        .option("schema", "id BIGINT, k BIGINT")
        .option("ndvStats", "k").mode(mode).save()
    write(0L, 5000L, "overwrite")
    write(5000L, 10000L, "append") // append version hosts ONLY the new file
    // the append's own version dir carries one physical file; the base
    // file's sketch lives in ITS host manifest — coverage must span both
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val ndv = spark.read.format("reftable").option("path", root)
        .option("schema", "id BIGINT, k BIGINT").load()
        .queryExecution.optimizedPlan.collectLeaves().head.stats
        .attributeStats.find(_._1.name == "k").flatMap(_._2.distinctCount)
        .map(_.toLong)
      assert(ndv.exists(n => n > 90 && n < 110),
        s"unioned NDV across hosting versions ~100, got $ndv")
    }
    // and the append version's OWN dir holds exactly its one new file —
    // the sketch pass was O(new files), not a table re-read
    val cur = graft.sources.reftable.VersionedTable.resolve(root).get
    val fs = new org.apache.hadoop.fs.Path(cur)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    val physical = fs.listStatus(new org.apache.hadoop.fs.Path(cur))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(physical == 1, s"append version hosts only the appended file, got $physical")
  }

  test("NDV unions only the SURVIVING files after pruning") {
    import spark.implicits._
    val root = tmp("pruned")
    // two partitions with DISJOINT key ranges: pruning to one partition
    // must report that partition's NDV, not the whole table's
    (0L until 10000L).map(i => (i % 500L, "a")).toDF("k", "p")
      .union((0L until 10000L).map(i => (1000L + i % 2000L, "b")).toDF("k", "p"))
      .write.format("reftable").option("path", root)
      .option("schema", "k BIGINT, p STRING")
      .option("partitionColumns", "p").option("ndvStats", "k")
      .mode("overwrite").save()
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val one = spark.read.format("reftable").option("path", root)
        .option("schema", "k BIGINT, p STRING")
        .option("partitionColumns", "p").load()
        .filter(col("p") === "a")
      val leaf = one.queryExecution.optimizedPlan.collectLeaves().head.stats
      val ndv = leaf.attributeStats.find(_._1.name == "k")
        .flatMap(_._2.distinctCount).map(_.toLong)
      assert(ndv.exists(n => n > 450 && n < 550),
        s"pruned-scan NDV must be partition-local (~500), got $ndv")
    }
  }

  test("KLL histograms fix range selectivity: broadcast picked where NDV alone mispredicts") {
    import spark.implicits._
    val root = tmp("hist")
    // SKEWED v over 200k rows: 99% of values in [0, 99], a 1% tail spread
    // to 10^9 — a range filter v >= 1000 selects ~1%, but the min/max
    // UNIFORM assumption estimates ~100% (the tail stretches max)
    val dim = (0L until 200000L).map { j =>
      val v = if (j % 100 == 0L) 1000L + (j * 5000L) else j % 100L
      (j, v, j)
    }.toDF("j", "v", "w").repartition(4)
    dim.write.format("reftable").option("path", root)
      .option("schema", "j BIGINT, v BIGINT, w BIGINT")
      .option("ndvStats", "v").mode("overwrite").save()
    // a histogram-less twin: same data, same NDV sketches, kll stripped
    // from the stats manifest — isolates the histogram's contribution
    val root2 = tmp("hist_stripped")
    dim.write.format("reftable").option("path", root2)
      .option("schema", "j BIGINT, v BIGINT, w BIGINT")
      .option("ndvStats", "v").mode("overwrite").save()
    val conf = new org.apache.hadoop.conf.Configuration()
    val cur2 = graft.sources.reftable.VersionedTable.resolve(root2, conf).get
    val mf = new org.apache.hadoop.fs.Path(cur2,
      graft.sources.reftable.RefTableStats.ManifestName)
    val fs = mf.getFileSystem(conf)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = { val in = fs.open(mf)
      try om.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      finally in.close() }
    node.path("files").properties().forEach { e =>
      val cols = e.getValue.path("cols")
      cols.properties().forEach { c =>
        c.getValue.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .remove("kll"); ()
      }
    }
    val out = fs.create(mf, true)
    try out.write(om.writeValueAsBytes(node)) finally out.close()

    val fact = (0L until 100000L).map(i => (i % 50000L, i)).toDF("j", "x")

    def joinPlan(r: String): String = {
      val olds = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
        "spark.sql.autoBroadcastJoinThreshold")
        .map(k => k -> spark.conf.getOption(k))
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // 512 KB: the 100k-row fact (~1.6 MB) must NOT broadcast; the
      // filtered dim fits only under the histogram's ~1% estimate
      // (~2k rows), never under the uniform ~100% one (~200k rows)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "524288")
      try {
        val d = spark.read.format("reftable").option("path", r)
          .option("schema", "j BIGINT, v BIGINT, w BIGINT").load()
        fact.join(d.filter(col("v") >= 1000L), "j")
          .groupBy().count().queryExecution.executedPlan.toString
      } finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val withHist = joinPlan(root)
    val noHist = joinPlan(root2)
    assert(withHist.contains("BroadcastHashJoin"),
      s"histogram selectivity (~1%) must broadcast the filtered dim:\n$withHist")
    assert(!noHist.contains("BroadcastHashJoin") && noHist.contains("SortMergeJoin"),
      s"NDV-only stats assume uniform [min,max] (~100% kept) and must not broadcast:\n$noHist")
  }

  test("timestamp ndvStats columns carry histograms in catalyst micros") {
    import spark.implicits._
    val root = tmp("ts_hist")
    // one year of hourly timestamps: internal micros span a known range
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    (0L until 8760L).map(i => (i, java.sql.Timestamp.from(t0.plusSeconds(i * 3600))))
      .toDF("id", "ts")
      .repartition(3)
      .write.format("reftable").option("path", root)
      .option("schema", "id BIGINT, ts TIMESTAMP")
      .option("ndvStats", "ts").mode("overwrite").save()
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val df = spark.read.format("reftable").option("path", root)
        .option("schema", "id BIGINT, ts TIMESTAMP").load()
      val leafStats = df.queryExecution.optimizedPlan.collectLeaves().head.stats
      val tsStat = leafStats.attributeStats.find(_._1.name == "ts").map(_._2)
      assert(tsStat.exists(_.histogram.isDefined),
        s"timestamp column must carry a histogram: $leafStats")
      val h = tsStat.get.histogram.get
      val loMicros = t0.getEpochSecond * 1000000.0
      val hiMicros = (t0.getEpochSecond + 8759L * 3600L) * 1000000.0
      assert(math.abs(h.bins.head.lo - loMicros) < 1e6 &&
        math.abs(h.bins.last.hi - hiMicros) < 1e6,
        s"histogram bounds must be catalyst MICROS: ${h.bins.head.lo}..${h.bins.last.hi} " +
          s"expected $loMicros..$hiMicros")
      // min/max surfaced as internal Long micros too
      assert(tsStat.get.min.exists(_.isInstanceOf[Long]) &&
        tsStat.get.min.exists(_.asInstanceOf[Long] == loMicros.toLong))
    }
  }

  test("nullCount clamps to the DV-adjusted row count on heavily-deleted listings") {
    import spark.implicits._
    val root = tmp("nullclamp")
    // 1000 rows, 500 NULL k's; per-file manifest null counts predate DVs
    (0L until 1000L)
      .map(i => (i, if (i % 2 == 0L) Some(i % 10L) else None))
      .toDF("id", "k")
      .repartition(2)
      .write.format("reftable").option("path", root)
      .option("schema", "id BIGINT, k BIGINT")
      .option("ndvStats", "k").mode("overwrite").save()
    // MoR-delete 950 rows: numRows subtracts DV positions (1000 → 50) but
    // the summed per-file null count stays 500 — unclamped, the reported
    // null fraction would exceed 1 and skew CBO selectivity
    graft.sources.reftable.RefTableMutations.deleteWhereMergeOnRead(
      spark, root, col("id") < 950L)
    withConfs("spark.sql.cbo.enabled" -> "true") {
      val df = spark.read.format("reftable").option("path", root)
        .option("schema", "id BIGINT, k BIGINT").load()
      val leafStats = df.queryExecution.optimizedPlan.collectLeaves().head.stats
      val rows = leafStats.rowCount.map(_.toLong)
      assert(rows.contains(50L), leafStats.toString)
      val kStat = leafStats.attributeStats.find(_._1.name == "k").map(_._2)
      for (st <- kStat; nc <- st.nullCount)
        assert(nc.toLong <= rows.get,
          s"nullCount ${nc} exceeds DV-adjusted row count ${rows.get}")
    }
  }
}
