package graft.queries

import java.nio.file.Files
import java.util.UUID

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** State for streaming sessionization: open sessions per user, in event-time
  * order. Timestamps in microseconds (matching session_window precision).
  */
case class SessionState(sessions: List[SessionAgg])
case class SessionAgg(startUs: Long, lastUs: Long, n: Long, v: Double)
case class SessionOut(user_id: Long, start_us: Long, n_events: Long, v: Double)
case class EventIn(user_id: Long, tsm: java.sql.Timestamp, ts_us: Long, value: Double)

case class TwsEvent(user_id: Long, value: Double)
case class TwsTotal(user_id: Long, cnt: Long, total: Double)

/** Per-user running totals through Spark 4's transformWithState — the
  * successor arbitrary-state API (typed ValueState handles, TTL-capable,
  * RocksDB-backed multi-column-family state). Each batch emits the key's
  * UPDATED running total; state persists across micro-batches through the
  * checkpoint.
  */
class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TwsEvent, TwsTotal] {
  @transient private var state: org.apache.spark.sql.streaming.ValueState[TwsTotal] = _
  override def init(outputMode: OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    state = getHandle.getValueState[TwsTotal]("totals",
      org.apache.spark.sql.Encoders.product[TwsTotal],
      org.apache.spark.sql.streaming.TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[TwsEvent],
      tv: org.apache.spark.sql.streaming.TimerValues): Iterator[TwsTotal] = {
    val prev = if (state.exists()) state.get() else TwsTotal(key, 0L, 0.0)
    var c = prev.cnt
    var t = prev.total
    rows.foreach { r => c += 1; t += r.value }
    val out = TwsTotal(key, c, t)
    state.update(out)
    Iterator.single(out)
  }
}

/** Streaming queries driven through the `reftable` DSv2 source and Spark's
  * file streaming source. Each runs a real StreamingQuery to a memory sink,
  * drains it with processAllAvailable, and returns the result — which must
  * hash-match the same DuckDB oracle as the equivalent batch query: the
  * strongest possible check that the streaming path produces exactly the
  * table snapshot.
  */
object StreamingOps {

  /** Run a streaming DataFrame to completion against a memory sink. */
  /** HARNESS BOUNDARY — oracle-only driver materialization. A catalog
    * entry's foreachBatch sink gathers per-batch rows onto the driver
    * purely so the entry can hand ONE DataFrame back to the comparator; a
    * production pipeline keeps the sink distributed (parquet/Kafka/
    * foreachBatch writing partitions). Every streaming entry funnels
    * through this single named method so the boundary is auditable and
    * never mistaken for an operator shape — do not call it from anything
    * but a query-catalog sink.
    */
  private def harnessCollect[T](batch: org.apache.spark.sql.Dataset[T]): Seq[T] =
    batch.collect().toSeq

  private def drain(s: SparkSession, df: DataFrame, outputMode: String): DataFrame = {
    val name = "mem_" + UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", Files.createTempDirectory("graft_ck_").toString)
      .start()
    val t0 = System.nanoTime()
    q.processAllAvailable()
    graft.BenchProbe.addDrain(System.nanoTime() - t0)
    q.stop()
    s.table(name)
  }

  /** Keep only the latest refresh generation (a run may straddle a refresh
    * boundary, in which case the memory sink holds two full snapshots).
    */
  private def latestGen(s: SparkSession, mem: DataFrame): DataFrame = {
    val maxGen = mem.agg(max("_gen")).first().getLong(0)
    mem.filter(col("_gen") === maxGen).drop("_gen")
  }


  /** Stateful streaming state is partitioned by spark.sql.shuffle.partitions
    * at the FIRST batch and fixed into the checkpoint. These harness queries
    * keep tiny state (≤ tens of thousands of keys) behind fresh checkpoints,
    * so 32 state-store instances per stateful operator are pure per-trigger
    * overhead — size to the data and restore afterwards. A production job
    * sizes this once to its own key cardinality before the first run.
    */
  /** Sleep just past the NEXT wall-clock refresh boundary. The reftable
    * source reloads when floor(now / refreshInterval) advances, so after a
    * publish the stream sees the new table once wall clock crosses the
    * next interval multiple — a point in time, not a duration: the fixed
    * `Thread.sleep(1300)` these entries used slept the worst case plus
    * margin on every run (6 entries × 1.3 s of pure wall), where the
    * boundary is on average half an interval away. The margin covers
    * clock granularity; the `processAllAvailable()` that follows forces
    * an offset poll, which is what actually observes the new generation.
    */
  private def sleepPastRefreshBoundary(intervalMs: Long = 1000L, marginMs: Long = 50L): Unit = {
    val now = System.currentTimeMillis()
    Thread.sleep(intervalMs - (now % intervalMs) + marginMs)
  }

  private[queries] def withShufflePartitions[T](s: SparkSession, n: Int)(f: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** The driver regenerates /root/testdata between rounds and has already
    * changed the on-disk `ts` encoding once (parquet TIMESTAMP(NANOS) through
    * round 8 → TIMESTAMP(MICROS, isAdjustedToUTC=false) from round 9).
    * File-stream reads need an explicit schema, so detect the encoding with a
    * footer-only batch schema inference and return (read type for `ts`, SQL
    * expression converting `ts` to TIMESTAMP_LTZ micros). The drift matrix
    * itself lives once, in [[Tables.tsNormalizeSql]] — shared with the batch
    * loader so the two paths cannot skew.
    */
  private[queries] def tsEncoding(s: SparkSession, dir: String): (DataType, String) = {
    val t = Tables.rawSchema(s, dir, "events")("ts").dataType
    (t, Tables.tsNormalizeSql("ts", t))
  }

  /** Append a watermark-advancing sentinel event (user_id = -1) to a
    * file-stream directory. The sentinel's ts must be written in the SAME
    * encoding the stream schema declares, or the file source fails the
    * batch (or reads junk): raw long for the nanos generation, a typed
    * NTZ/LTZ literal otherwise — with micros-granularity sub-second
    * precision carried into the literal (a truncated sentinel would
    * under-advance the watermark and silently leave final sessions
    * unflushed).
    */
  private def writeSentinelFile(
      s: SparkSession, streamDir: java.nio.file.Path, tsType: DataType,
      name: String, tsNanos: Long): Unit = {
    import s.implicits._
    val secs = tsNanos / 1000000000L
    val microNanos = (tsNanos % 1000000000L) / 1000L * 1000L
    val base = Seq((-(1L), -(1L), "sentinel", 0.0, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
    val tsCol = tsType match {
      case LongType         => lit(tsNanos)
      case TimestampNTZType =>
        lit(java.time.LocalDateTime.ofEpochSecond(secs, microNanos.toInt, java.time.ZoneOffset.UTC))
      case _                => lit(java.time.Instant.ofEpochSecond(secs, microNanos))
    }
    base.withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(1).write.mode("append").parquet(streamDir.toString + "_stage")
    // move the staged file in atomically so the file source sees one new file
    val stage = new java.io.File(streamDir.toString + "_stage")
    stage.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
      case (f, i) => Files.move(f.toPath, streamDir.resolve(s"$name$i.parquet"))
    }
  }

  private[queries] def eventsSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val defs: Seq[QueryDef] = Seq(
    // full-snapshot emission through the source, key-as-field included:
    // streaming output must equal the batch table contents (reference
    // semantics: every emission is the entire table,
    // TableInputDStream.scala:51-54).
    QueryDef("q40_stream_snapshot", (s, dir) => {
      val schemaJson =
        """{"type":"record","name":"row","fields":[
          |  {"name":"row_key","type":"int"},
          |  {"name":"n_name","type":["string","null"]},
          |  {"name":"n_regionkey","type":["int","null"]}]}""".stripMargin
      val df = s.readStream.format("reftable")
        .option("path", Tables.path(dir, "nation"))
        .option("schema", schemaJson)
        .option("rowField", "row_key")
        .option("keyColumn", "n_nationkey")
        .option("refreshInterval", "1h")
        .option("genColumn", "_gen")
        .load()
      latestGen(s, drain(s, df, "append")).orderBy("row_key")
    }, Some("SELECT n_nationkey AS row_key, n_name, n_regionkey FROM nation ORDER BY row_key")),

    // the reference's documented purpose: the snapshot stream feeding a
    // lookup join (docs/Table-streamingsource.md:10-14) — here as a
    // stream-static equi-join, output identical to the batch join (q05).
    QueryDef("q41_stream_enrich_join", (s, dir) => {
      val cust = s.readStream.format("reftable")
        .option("path", Tables.path(dir, "customer"))
        .option("schema", "c_custkey BIGINT, c_name STRING")
        .option("refreshInterval", "1h")
        .option("genColumn", "_gen")
        .load()
      val ev = Tables.load(s, dir, "events").select("event_id", "user_id")
      val joined = cust.join(ev, cust("c_custkey") === ev("user_id"))
        .select(col("event_id"), col("user_id"), col("c_name"), col("_gen"))
      latestGen(s, drain(s, joined, "append")).orderBy("event_id", "c_name")
    }, Some(
      """SELECT e.event_id, e.user_id, c.c_name FROM events e
        | JOIN customer c ON e.user_id = c.c_custkey
        | ORDER BY e.event_id, c.c_name""".stripMargin)),

    // streaming read over a Z-ORDERED version under a 2-D box filter, with
    // admission control: the predicate is DECLARED via the `filter` option
    // (Spark never pushes Catalyst filters into streaming DSv2 scans — the
    // option is the streaming pushdown channel), generation pinning prunes
    // the listing from the stats manifest FIRST, so maxFilesPerTrigger
    // chunks over O(matching) files, not O(all) (RefTableStatsSpec asserts
    // the batch counts). The query's own .filter stays the exactness
    // residual; the result must equal the batch q93 oracle exactly.
    QueryDef("q100_stream_zorder_skip", (s, dir) => {
      val root = RelationalSupport.scratchDir(s, dir, "q100_zstream")
      graft.sources.reftable.VersionedTable.publishZOrdered(
        Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        root, Seq("o_custkey", "o_totalprice"), numFiles = 8)
      val df = s.readStream.format("reftable")
        .option("path", root)
        .option("schema", "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE")
        .option("refreshInterval", "1h")
        .option("genColumn", "_gen")
        .option("filter",
          "o_custkey < 300 AND o_totalprice >= 50000.0 AND o_totalprice < 150000.0")
        .option("maxFilesPerTrigger", "2")
        .load()
        .filter(col("o_custkey") < 300 && col("o_totalprice") >= 50000.0 &&
          col("o_totalprice") < 150000.0)
      latestGen(s, drain(s, df, "append"))
        .agg(count(lit(1)).as("n"), r4(sum("o_totalprice")).as("total"),
          min("o_orderkey").as("first_key"), max("o_orderkey").as("last_key"))
    }, Some(
      """SELECT count(*) AS n, round(sum(o_totalprice), 4) AS total,
        |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM orders
        |WHERE o_custkey < 300 AND o_totalprice >= 50000 AND o_totalprice < 150000""".stripMargin)),

    // event-time tumbling window through Spark's file streaming source with a
    // watermark — the batch q12 oracle must reproduce it exactly.
    QueryDef("q47_stream_tumbling", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, tsExpr) = tsEncoding(s, dir)
      // the file streaming source wants a directory; expose the single
      // events file through a temp dir via symlink
      val evDir = Files.createTempDirectory("graft_events_")
      Files.createSymbolicLink(evDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val raw = s.readStream.schema(eventsSchema(tsType)).parquet(evDir.toString)
      val agg = raw
        .withColumn("ts", expr(tsExpr))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("sum_value"))
      drain(s, agg, "complete")
        .select(unix_timestamp(col("window.start")).as("bucket_s"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket_s", "event_type")
    }, Some(
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_s, event_type,
        |   count(*) AS n, round(sum(value), 4) AS sum_value
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // event-time SLIDING window (30m / 10m) through the file streaming
    // source — the streaming form of q83, same explicit-fan-out oracle:
    // every event belongs to exactly 3 overlapping windows.
    QueryDef("q87_stream_sliding", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, tsExpr) = tsEncoding(s, dir)
      val evDir = Files.createTempDirectory("graft_slide_")
      Files.createSymbolicLink(evDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val raw = s.readStream.schema(eventsSchema(tsType)).parquet(evDir.toString)
      val agg = raw
        .withColumn("ts", expr(tsExpr))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "30 minutes", "10 minutes").as("w"))
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("v"))
      drain(s, agg, "complete")
        .select(unix_timestamp(col("w.start")).as("ws"), col("n"), col("v"))
        .orderBy("ws")
    }, Some(
      """SELECT ws, count(*) AS n, round(sum(value), 4) AS v FROM (
        |  SELECT CAST(floor(epoch(ts)/600)*600 - 600*k AS BIGINT) AS ws, value
        |  FROM events, UNNEST([0, 1, 2]) AS t(k))
        |GROUP BY ws ORDER BY ws""".stripMargin)),

    // stream-stream inner join with time-range condition and watermarks on
    // both sides: purchases joined to the same user's clicks from the
    // preceding hour. Inner joins emit eagerly as matches arrive, so one
    // drain suffices; the batch oracle is the same inequality join.
    QueryDef("q72_stream_stream_join", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, tsExpr) = tsEncoding(s, dir)
      val evDir = Files.createTempDirectory("graft_ssj_")
      Files.createSymbolicLink(evDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      def side(tpe: String, prefix: String) = s.readStream.schema(eventsSchema(tsType)).parquet(evDir.toString)
        .withColumn("tsm", expr(tsExpr))
        .withWatermark("tsm", "1 hour")
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${prefix}_id"), col("user_id").as(s"${prefix}_user"),
          col("tsm").as(s"${prefix}_ts"))
      val p = side("purchase", "p")
      val c = side("click", "c")
      val joined = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
        .select(col("p_id"), col("c_id"))
      drain(s, joined, "append").orderBy("p_id", "c_id")
    }, Some(
      """SELECT p.event_id AS p_id, c.event_id AS c_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
        |ORDER BY p_id, c_id""".stripMargin)),

    // streaming deduplication: the same source file exposed twice (every
    // event arrives in duplicate); watermarked dropDuplicates must restore
    // exactly-once semantics — aggregates equal the plain batch oracle.
    QueryDef("q70_stream_dedup", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, tsExpr) = tsEncoding(s, dir)
      val evDir = Files.createTempDirectory("graft_dedupstream_")
      Files.createSymbolicLink(evDir.resolve("a.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      Files.createSymbolicLink(evDir.resolve("b.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val raw = s.readStream.schema(eventsSchema(tsType)).parquet(evDir.toString)
      val deduped = raw
        .withColumn("tsm", expr(tsExpr))
        .withWatermark("tsm", "1 hour")
        .dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("sum_value"))
      drain(s, deduped, "complete").orderBy("event_type")
    }, Some(
      """SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // custom stateful streaming: per-user sessionization (30-minute gap) via
    // flatMapGroupsWithState with event-time timeouts. Sessions are emitted
    // only when the watermark passes their close; end-of-stream state is
    // flushed by sentinel rows that advance the watermark between AvailableNow
    // drains. Output must equal the batch session_window / gaps-and-islands
    // oracle (q58) exactly.
    QueryDef("q59_stateful_sessions", (s, dir) => withShufflePartitions(s, 8) {
      import s.implicits._
      val (tsType, tsExpr) = tsEncoding(s, dir)
      val gapUs = 30L * 60 * 1000000

      val streamDir = Files.createTempDirectory("graft_sess_")
      Files.createSymbolicLink(streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))

      val raw = s.readStream.schema(eventsSchema(tsType)).parquet(streamDir.toString)
      val events = raw
        .withColumn("tsm", expr(tsExpr))
        .withWatermark("tsm", "0 seconds")
        // NOTE: do NOT filter the sentinel rows here — a filter gets pushed
        // below the watermark operator into the scan, so the sentinels would
        // never reach EventTimeWatermarkExec and the watermark would never
        // advance past the real data. Sentinel sessions (user_id < 0) are
        // dropped from the OUTPUT instead.
        // tsm stays in the projection: the event-time-timeout check requires
        // the watermarked column to be present in the child plan
        .select(col("user_id"), col("tsm"), unix_micros(col("tsm")).as("ts_us"), col("value"))
        .as[EventIn]

      def mergeEvents(st: SessionState, evs: Seq[EventIn]): SessionState = {
        var sessions = st.sessions
        evs.sortBy(e => (e.ts_us, e.value)).foreach { e =>
          sessions match {
            case head :: tail if e.ts_us - head.lastUs < gapUs && e.ts_us >= head.startUs =>
              sessions = head.copy(lastUs = math.max(head.lastUs, e.ts_us), n = head.n + 1, v = head.v + e.value) :: tail
            case _ =>
              sessions = SessionAgg(e.ts_us, e.ts_us, 1L, e.value) :: sessions
          }
        }
        SessionState(sessions)
      }

      val sessions = events
        .groupByKey(_.user_id)
        .flatMapGroupsWithState[SessionState, SessionOut](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, evs: Iterator[EventIn], state: GroupState[SessionState]) =>
            if (state.hasTimedOut) {
              // evict only sessions definitively closed by the watermark;
              // out-of-order arrivals can leave newer sessions still open
              // when the timeout fires — those stay in state and re-arm
              val wmUs = state.getCurrentWatermarkMs() * 1000
              val (closed, open) = state.get.sessions.partition(a => a.lastUs + gapUs <= wmUs)
              val done = closed.sortBy(_.startUs).map(a => SessionOut(uid, a.startUs, a.n, a.v))
              if (open.isEmpty) state.remove()
              else {
                state.update(SessionState(open))
                state.setTimeoutTimestamp(open.map(_.lastUs).max / 1000 + gapUs / 1000 + 1)
              }
              done.iterator
            } else {
              val st = mergeEvents(state.getOption.getOrElse(SessionState(Nil)), evs.toSeq)
              state.update(st)
              // arm for the watermark passing the LAST-closing open session:
              // head is merely the most recently touched session — after a
              // late event it can be older than other open sessions, and a
              // head-based timeout would flush (and split) them early
              state.setTimeoutTimestamp(st.sessions.map(_.lastUs).max / 1000 + gapUs / 1000 + 1)
              Iterator.empty
            }
        }

      // the three drains share one checkpoint so state survives between them;
      // the sink is the audited harnessCollect boundary
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      val ck = Files.createTempDirectory("graft_sess_ck_").toString
      def drainCk(): Unit = {
        val q = sessions.writeStream
          .foreachBatch { (b: org.apache.spark.sql.Dataset[SessionOut], _: Long) =>
            val rows = harnessCollect(b)
            out.synchronized { out ++= rows }
            ()
          }
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        val t0 = System.nanoTime()
        q.awaitTermination(120000)
        graft.BenchProbe.addDrain(System.nanoTime() - t0)
        q.stop()
      }

      def writeSentinel(name: String, tsNanos: Long): Unit =
        writeSentinelFile(s, streamDir, tsType, name, tsNanos)

      // ONE drain (round 21; was two): the sentinel is written BEFORE the
      // drain, so the real events and the watermark-advancing sentinel are
      // consumed by the same AvailableNow run, whose follow-up no-data
      // batch fires every event-time timeout before awaitTermination
      // returns (spec: StreamingDrainSpec "single AvailableNow drain
      // commits the no-data timeout batch"). Ordering is safe: the file
      // source processes oldest-modified first, and the sentinel is
      // written after the (days-old) events symlink target — and when both
      // land in one batch the watermark only advances at the batch
      // boundary anyway. Emitted sessions are identical; one stream
      // lifecycle instead of two.
      writeSentinel("sentinel1_", 2_000_000_000_000_000_000L) // ~2033
      drainCk()

      val result = out.synchronized { out.filter(_.user_id >= 0).toList }
      s.createDataFrame(result)
        .select(col("user_id"), col("start_us"), col("n_events"), r4(col("v")).as("v"))
        .orderBy("user_id", "start_us")
    }, Some(
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
        |  count(*) AS n_events, round(sum(value), 4) AS v
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin)),

    // COMPOSITION of the engine's two signature layers: a stateful
    // sessionization stream (session_window + watermark, the q58/q59
    // semantics) maintains a versioned reftable — each micro-batch's newly
    // finalized sessions are merged with the table's current version and
    // published as a NEW version via completeModePublisher (snapshot
    // isolation, replay-idempotent markers, retention) — and a SECOND
    // streaming query then consumes that table THROUGH the reftable source
    // as the reference's documented use case: a stream-static lookup join
    // (sessions x customer). The oracle recomputes everything from raw
    // events with the same gaps-and-islands SQL as q58/q59 plus the join —
    // end to end, no intermediate is trusted.
    // At scale: the published table is O(sessions) — the union-with-current
    // rewrite is the reference's own refresh shape (full snapshot per
    // generation), bounded by the session count, not the event count.
    QueryDef("q136_stream_sessions_published", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, tsExpr) = tsEncoding(s, dir)
      val streamDir = Files.createTempDirectory("graft_sesspub_")
      Files.createSymbolicLink(streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val root = RelationalSupport.scratchDir(s, dir, "q136_sessions")
      // published-table scratch root: wipe so a warm re-run (bench runs
      // entries twice) starts from an empty table instead of unioning with
      // the previous run's generations — the q208/q222 pattern; a single
      // run (Verify/oracle) is unchanged
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val ddl = "user_id BIGINT, start_us BIGINT, n_events BIGINT, v DOUBLE"

      // layer 1: sessionize the event stream; append mode emits each
      // session exactly once, when the watermark passes its close
      val sess = s.readStream.schema(eventsSchema(tsType)).parquet(streamDir.toString)
        .withColumn("tsm", expr(tsExpr))
        .withWatermark("tsm", "0 seconds")
        .groupBy(col("user_id"), session_window(col("tsm"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum("value").as("v"))
        .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
          col("n_events"), col("v"))

      val pub = graft.sources.reftable.VersionedTable
        .completeModePublisher(root, keepVersions = 3)
      val ck = Files.createTempDirectory("graft_sesspub_ck_").toString
      def drainPublish(): Unit = {
        val q = sess.writeStream
          .foreachBatch { (b: DataFrame, id: Long) =>
            // newly finalized sessions (sentinel user dropped) merged with
            // the table's current snapshot -> the batch IS the full result,
            // which is what completeModePublisher's contract requires
            val closed = b.filter(col("user_id") >= 0)
            val hasPrev = graft.sources.reftable.VersionedTable.resolve(root).isDefined
            val full =
              if (hasPrev)
                s.read.format("reftable").option("path", root).option("schema", ddl)
                  .load().unionByName(closed)
              else closed
            if (!closed.isEmpty || !hasPrev) pub(full, id)
            ()
          }
          .option("checkpointLocation", ck)
          .trigger(Trigger.AvailableNow()).start()
        val t0 = System.nanoTime()
        q.awaitTermination(120000)
        graft.BenchProbe.addDrain(System.nanoTime() - t0)
        q.stop()
      }
      // ONE drain (round 21; was two) — same collapse as q59: sentinel
      // pre-written, the drain's no-data batch finalizes every session and
      // the publisher lands the one full generation (the batch-0 empty
      // publish still seeds the root). Final table rows identical.
      writeSentinelFile(s, streamDir, tsType, "sentinel1_", 2_000_000_000_000_000_000L) // ~2033
      drainPublish()

      // layer 2: consume the streaming-maintained table THROUGH the source,
      // enriched by a stream-static broadcast lookup join (the reference's
      // documented purpose, docs/Table-streamingsource.md:10-14)
      val sessStream = s.readStream.format("reftable")
        .option("path", root)
        .option("schema", ddl)
        .option("refreshInterval", "1h")
        .option("genColumn", "_gen")
        .load()
      val cust = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val joined = sessStream
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("start_us"), col("n_events"),
          r4(col("v")).as("v"), col("c_mktsegment"), col("_gen"))
      latestGen(s, drain(s, joined, "append")).orderBy("user_id", "start_us")
    }, Some(
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
        |    count(*) AS n_events, round(sum(value), 4) AS v
        |  FROM sess GROUP BY user_id, sid)
        |SELECT a.user_id, a.start_us, a.n_events, a.v, c.c_mktsegment
        |FROM agg a JOIN customer c ON a.user_id = c.c_custkey
        |ORDER BY user_id, start_us""".stripMargin)),

    // streaming heavy hitters: the mergeable Misra-Gries sketch maintained
    // AS STREAMING STATE — a complete-mode global aggregation over the
    // token stream where partial aggregation runs map-side, so each
    // trigger's state update carries at most `capacity` entries per
    // partition regardless of the distinct count (the property that makes
    // this viable over an unbounded 100 TB token stream). The drained
    // sketch's survivors (a guaranteed superset of every item with count
    // > N/capacity) then get the same exact-recount verify pass as batch
    // q92 — and must match q92's exact-top-k oracle, proving the
    // stream-maintained sketch lost no heavy hitter.
    QueryDef("q139_stream_heavy_hitters", (s, dir) => withShufflePartitions(s, 8) {
      import s.implicits._
      val docsSchema = Tables.rawSchema(s, dir, "documents")
      val streamDir = Files.createTempDirectory("graft_hhstream_")
      Files.createSymbolicLink(streamDir.resolve("documents.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "documents")))
      val toks = s.readStream.schema(docsSchema).parquet(streamDir.toString)
        .select(explode(graft.functions.GraftFunctions.tokens(col("text"))).as("token"))
        .as[String]
      val sketch = new graft.operators.MisraGriesAggregator(8192)
        .toColumn.name("survivors")
      val surv = toks.select(sketch).toDF("survivors")
      val candidates = drain(s, surv, "complete")
        .select(explode(col("survivors")).as("token"))
      // exact verify pass over the batch table: candidates only reach the
      // aggregation (broadcast semi-join below it), identical to q92
      val toksBatch = Tables.load(s, dir, "documents")
        .select(explode(graft.functions.GraftFunctions.tokens(col("text"))).as("token"))
      toksBatch.join(broadcast(candidates), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("token")).limit(20)
        .select(col("token").as("item"), col("cnt"))
    }, Some(
      """SELECT w AS item, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) w FROM documents)
        |GROUP BY w ORDER BY cnt DESC, item LIMIT 20""".stripMargin)),

    // streaming percentiles: complete-mode approx_percentile over the event
    // stream (KLL-class mergeable sketch maintained as streaming state, the
    // same map-side-partials shape as q139). Verified with a RANK-tolerance
    // gate, q35-style: each streamed p-quantile must land between the exact
    // batch (p−0.01) and (p+0.01) quantiles — approx_percentile's rank
    // error at accuracy 10000 is 1e-4, two orders inside the band, so a
    // true sketch failure (not noise) flips the booleans.
    QueryDef("q142_stream_percentiles", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, _) = tsEncoding(s, dir)
      val streamDir = Files.createTempDirectory("graft_pctstream_")
      Files.createSymbolicLink(streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val approx = s.readStream.schema(eventsSchema(tsType)).parquet(streamDir.toString)
        .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("qs"))
      val drained = drain(s, approx, "complete")
      val bands = Tables.load(s, dir, "events").agg(
        expr("percentile(value, array(0.49, 0.51))").as("b50"),
        expr("percentile(value, array(0.89, 0.91))").as("b90"),
        expr("percentile(value, array(0.98, 1.0))").as("b99"))
      drained.crossJoin(bands).select(
        (col("qs")(0) >= col("b50")(0) && col("qs")(0) <= col("b50")(1)).as("ok50"),
        (col("qs")(1) >= col("b90")(0) && col("qs")(1) <= col("b90")(1)).as("ok90"),
        (col("qs")(2) >= col("b99")(0) && col("qs")(2) <= col("b99")(1)).as("ok99"))
    }, Some("SELECT TRUE AS ok50, TRUE AS ok90, TRUE AS ok99")),

    // STREAMING CHANGEFEED over the source: the reftable stream emits one
    // full snapshot per refresh generation (the reference's cadence);
    // SnapshotDiff.ChangeFeed turns that into a key-level changefeed inside
    // foreachBatch — diffing each arriving generation against the previous
    // one (checkpoint-and-release, so memory holds two generations, never
    // the history). The table mutates underneath a live 1s-refresh stream;
    // the accumulated post-baseline changes must equal the oracle's direct
    // diff of the two states: insert/update rows carry after-images,
    // deletes carry before-images. Unchanged-snapshot generations diff to
    // zero rows by construction.
    QueryDef("q145_stream_changefeed", (s, dir) => withShufflePartitions(s, 8) {
      import graft.sources.reftable.VersionedTable
      import graft.operators.SnapshotDiff
      val root = RelationalSupport.scratchDir(s, dir, "q145_cf")
      val base = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val state2 = base.filter(col("s_suppkey") % 7 =!= 0)
        .withColumn("s_nationkey", when(col("s_suppkey") % 5 === 0,
          col("s_nationkey") + 100).otherwise(col("s_nationkey")))
        .unionAll(base.filter(col("s_suppkey") % 11 === 0)
          .select((col("s_suppkey") + 90000L).as("s_suppkey"), col("s_nationkey")))
      VersionedTable.publish(base, root)

      val feed = new SnapshotDiff.ChangeFeed(Seq("s_suppkey"))
      // HARNESS BOUNDARY: the collect gathers DIFF rows (bounded by the
      // change set) so this oracle query can hand one DataFrame to the
      // comparator; a production consumer writes d out distributed.
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
      var batches = 0
      val df = s.readStream.format("reftable")
        .option("path", root)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT")
        .option("refreshInterval", "1s")
        .load()
      val q = df.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val d = feed.next(b)
          val rows = harnessCollect(d).map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
          acc.synchronized {
            // batch 0 is the all-insert baseline, not a change
            if (batches > 0) acc ++= rows
            batches += 1
          }
          ()
        }
        .option("checkpointLocation", Files.createTempDirectory("graft_cf_ck_").toString)
        .start()
      val t0 = System.nanoTime()
      q.processAllAvailable() // baseline generation consumed
      VersionedTable.publish(state2, root)
      sleepPastRefreshBoundary() // cross the 1s refresh boundary
      q.processAllAvailable() // the mutated generation's diff arrives
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      q.stop()
      feed.close()
      import s.implicits._
      acc.synchronized { acc.toSeq }.toDF("s_suppkey", "s_nationkey", "change_type")
        .orderBy("s_suppkey", "change_type")
    }, Some(
      """WITH base AS (SELECT s_suppkey, s_nationkey FROM supplier),
        |s2 AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 5 = 0 THEN s_nationkey + 100 ELSE s_nationkey END AS s_nationkey
        |  FROM base WHERE s_suppkey % 7 <> 0
        |  UNION ALL
        |  SELECT s_suppkey + 90000, s_nationkey FROM base WHERE s_suppkey % 11 = 0),
        |ins AS (SELECT a.s_suppkey, a.s_nationkey, 'insert' AS change_type
        |  FROM s2 a LEFT JOIN base b USING (s_suppkey) WHERE b.s_suppkey IS NULL),
        |del AS (SELECT b.s_suppkey, b.s_nationkey, 'delete' AS change_type
        |  FROM base b LEFT JOIN s2 a USING (s_suppkey) WHERE a.s_suppkey IS NULL),
        |upd AS (SELECT a.s_suppkey, a.s_nationkey, 'update' AS change_type
        |  FROM base b JOIN s2 a USING (s_suppkey) WHERE b.s_nationkey <> a.s_nationkey)
        |SELECT * FROM (SELECT * FROM ins UNION ALL SELECT * FROM del UNION ALL SELECT * FROM upd)
        |ORDER BY s_suppkey, change_type""".stripMargin)),

    // CHANGEFEED AS A SOURCE MODE: q145's composition (snapshot stream +
    // SnapshotDiff.ChangeFeed in foreachBatch) collapsed onto the
    // one-option surface — `.option("changefeed", "true")` makes each
    // generation's micro-batch the key-level delta itself
    // ([[graft.sources.reftable.RefTableChangefeedStream]]): batch 0 is
    // the snapshot-as-inserts bootstrap, later batches carry exactly the
    // insert/update/delete rows (computed from the FILE delta of the two
    // pinned versions — O(changed files), not a full-table join, on
    // manifest-delta commit chains). Same oracle as q145: the direct
    // two-state diff.
    QueryDef("q169_changefeed_source", (s, dir) => withShufflePartitions(s, 8) {
      import graft.sources.reftable.VersionedTable
      val root = RelationalSupport.scratchDir(s, dir, "q169_cfsrc")
      val base = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val state2 = base.filter(col("s_suppkey") % 7 =!= 0)
        .withColumn("s_nationkey", when(col("s_suppkey") % 5 === 0,
          col("s_nationkey") + 100).otherwise(col("s_nationkey")))
        .unionAll(base.filter(col("s_suppkey") % 11 === 0)
          .select((col("s_suppkey") + 90000L).as("s_suppkey"), col("s_nationkey")))
      VersionedTable.publish(base, root)

      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
      var sawBootstrap = false
      val df = s.readStream.format("reftable")
        .option("path", root)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT")
        .option("changefeed", "true").option("keyColumns", "s_suppkey")
        .option("refreshInterval", "1s")
        .load()
      val q = df.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val rows = harnessCollect(b).map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
          acc.synchronized {
            // the first non-empty batch is the all-insert bootstrap; the
            // post-publish delta is every non-empty batch after it
            if (sawBootstrap) acc ++= rows
            else if (rows.nonEmpty) sawBootstrap = true
          }
          ()
        }
        .option("checkpointLocation", Files.createTempDirectory("graft_cfsrc_ck_").toString)
        .start()
      val t0 = System.nanoTime()
      q.processAllAvailable() // bootstrap generation consumed
      VersionedTable.publish(state2, root)
      sleepPastRefreshBoundary() // cross the 1s refresh boundary
      q.processAllAvailable() // the delta generation arrives
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      q.stop()
      import s.implicits._
      acc.synchronized { acc.toSeq }.toDF("s_suppkey", "s_nationkey", "change_type")
        .orderBy("s_suppkey", "change_type")
    }, Some(
      """WITH base AS (SELECT s_suppkey, s_nationkey FROM supplier),
        |s2 AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 5 = 0 THEN s_nationkey + 100 ELSE s_nationkey END AS s_nationkey
        |  FROM base WHERE s_suppkey % 7 <> 0
        |  UNION ALL
        |  SELECT s_suppkey + 90000, s_nationkey FROM base WHERE s_suppkey % 11 = 0),
        |ins AS (SELECT a.s_suppkey, a.s_nationkey, 'insert' AS change_type
        |  FROM s2 a LEFT JOIN base b USING (s_suppkey) WHERE b.s_suppkey IS NULL),
        |del AS (SELECT b.s_suppkey, b.s_nationkey, 'delete' AS change_type
        |  FROM base b LEFT JOIN s2 a USING (s_suppkey) WHERE a.s_suppkey IS NULL),
        |upd AS (SELECT a.s_suppkey, a.s_nationkey, 'update' AS change_type
        |  FROM base b JOIN s2 a USING (s_suppkey) WHERE b.s_nationkey <> a.s_nationkey)
        |SELECT * FROM (SELECT * FROM ins UNION ALL SELECT * FROM del UNION ALL SELECT * FROM upd)
        |ORDER BY s_suppkey, change_type""".stripMargin)),

    // CHANGEFEED THROUGH THE SQL CATALOG: the `t$changefeed` metadata
    // suffix — the merge key declared ONCE in DDL (OPTIONS keyColumns),
    // deltas streamed with `readStream.table`, mutations arriving through
    // plain SQL DML (MoR UPDATE/DELETE + INSERT). Same two-state-diff
    // oracle discipline as q169; the full loop (DDL -> DML -> delta) never
    // leaves the SQL surface.
    QueryDef("q172_sql_changefeed", (s, dir) => withShufflePartitions(s, 8) {
      val wh = RelationalSupport.scratchDir(s, dir, "q172_cat")
      val cat = "graftcf_" + RelationalSupport.scratchTag(s, dir)
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.reftable.RefTableCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
      s.sql(s"DROP TABLE IF EXISTS $cat.db.s")
      s.sql(s"CREATE TABLE $cat.db.s (s_suppkey BIGINT, s_nationkey INT) USING reftable " +
        "OPTIONS (keyColumns 's_suppkey', refreshInterval '1s', " +
        "updateMode 'mergeOnRead', deleteMode 'mergeOnRead')")
      Tables.registerAll(s, dir)
      s.sql(s"INSERT INTO $cat.db.s SELECT s_suppkey, s_nationkey FROM supplier")

      // two AvailableNow runs over one checkpoint: bootstrap, then the SQL
      // DML wave lands (TWO MoR commits — both fold into ONE delta because
      // the stream is down between runs, and delete images come from the
      // PINNED predecessor, i.e. the pre-update state), then the restarted
      // stream emits exactly that two-state diff
      val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
      val ckpt = Files.createTempDirectory("graft_sqlcf_ck_").toString
      def drain(collect: Boolean): Unit = {
        val q = s.readStream.table(s"$cat.db.`s$$changefeed`")
          .writeStream
          .foreachBatch { (b: DataFrame, _: Long) =>
            val rows = harnessCollect(b).map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
            acc.synchronized { if (collect) acc ++= rows }
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination(120000)
      }
      val t0 = System.nanoTime()
      drain(collect = false) // bootstrap generation consumed
      // UPDATE takes the analyzer-rewrite path (any predicate); DELETE
      // rides SupportsDelete, whose predicate must translate to a source
      // filter — equality does. It matches CURRENT nationkeys, so rows the
      // update moved to 103 are not deleted (the oracle encodes that)
      s.sql(s"UPDATE $cat.db.s SET s_nationkey = s_nationkey + 100 WHERE s_suppkey % 5 = 0")
      s.sql(s"DELETE FROM $cat.db.s WHERE s_nationkey = 3")
      sleepPastRefreshBoundary() // cross the 1s refresh boundary
      drain(collect = true)
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      import s.implicits._
      acc.synchronized { acc.toSeq }.toDF("s_suppkey", "s_nationkey", "change_type")
        .orderBy("s_suppkey", "change_type")
    }, Some(
      """SELECT s_suppkey,
        |  CASE WHEN s_suppkey % 5 = 0 THEN s_nationkey + 100
        |    ELSE s_nationkey END AS s_nationkey,
        |  CASE WHEN s_suppkey % 5 = 0 THEN 'update' ELSE 'delete' END AS change_type
        |FROM supplier
        |WHERE s_suppkey % 5 = 0 OR s_nationkey = 3
        |ORDER BY s_suppkey, change_type""".stripMargin)),

    // STREAMING-MAINTAINED AGGREGATE: the materialized-view loop closed
    // over a LIVE stream — the reftable source re-emits the full snapshot
    // per generation (the reference's model, where any aggregate is an
    // O(table) recompute per refresh); here the both-image ChangeFeed turns
    // each arriving generation into a changefeed and IncrementalAgg
    // advances the per-nation aggregate by O(changes) per batch, including
    // group-MOVING updates (nation reassignment). The table mutates under
    // a 1s-refresh stream; the final maintained state must equal the
    // oracle's direct aggregate of the final table — proving the running
    // view never diverged.
    QueryDef("q146_stream_maintained_agg", (s, dir) => withShufflePartitions(s, 8) {
      import graft.sources.reftable.VersionedTable
      import graft.operators.{IncrementalAgg, SnapshotDiff}
      val root = RelationalSupport.scratchDir(s, dir, "q146_magg")
      val cents = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
      val base = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("cents"))
      val state2 = base.filter(col("c_custkey") % 9 =!= 0)
        .withColumn("cents", when(col("c_custkey") % 4 === 0, col("cents") + 500L)
          .otherwise(col("cents")))
        .withColumn("c_nationkey", when(col("c_custkey") % 6 === 0,
          col("c_nationkey") + 50).otherwise(col("c_nationkey")))
        .unionAll(base.filter(col("c_custkey") % 10 === 3)
          .select((col("c_custkey") + 700000L).as("c_custkey"),
            col("c_nationkey"), col("cents")))
      VersionedTable.publish(base, root)

      val feed = new SnapshotDiff.ChangeFeed(Seq("c_custkey"), bothImages = true)
      val lock = new Object
      var agg: DataFrame = null
      val df = s.readStream.format("reftable")
        .option("path", root)
        .option("schema", "c_custkey BIGINT, c_nationkey INT, cents BIGINT")
        .option("refreshInterval", "1s")
        .load()
      val q = df.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val d = feed.next(b)
          lock.synchronized {
            val prev = if (agg == null)
              IncrementalAgg.aggregate(b.limit(0), Seq("c_nationkey"), Seq("cents"))
            else agg
            // materialize the advanced state eagerly: `d` is only valid
            // until the next feed call, and the plan must not grow with
            // the number of generations
            agg = IncrementalAgg.maintain(prev, d, Seq("c_nationkey"), Seq("cents"))
              .localCheckpoint(true)
          }
          ()
        }
        .option("checkpointLocation", Files.createTempDirectory("graft_magg_ck_").toString)
        .start()
      val t0 = System.nanoTime()
      q.processAllAvailable() // baseline generation -> all-insert maintenance
      VersionedTable.publish(state2, root)
      sleepPastRefreshBoundary() // cross the 1s refresh boundary
      q.processAllAvailable() // mutated generation -> O(changes) maintenance
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      q.stop()
      feed.close()
      lock.synchronized { agg }
        .select(col("c_nationkey"), col("sum_cents"), col("nn_cents"), col("cnt"))
        .orderBy("c_nationkey")
    }, Some(
      """WITH base AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM customer),
        |s2 AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 6 = 0 THEN c_nationkey + 50 ELSE c_nationkey END AS c_nationkey,
        |    CASE WHEN c_custkey % 4 = 0 THEN cents + 500 ELSE cents END AS cents
        |  FROM base WHERE c_custkey % 9 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 700000, c_nationkey, cents FROM base WHERE c_custkey % 10 = 3)
        |SELECT c_nationkey, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  count(cents) AS nn_cents, count(*) AS cnt
        |FROM s2 GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)),

    // STREAMING MoR REPLICATION: the full live loop — the primary mutates
    // under a 1s-refresh snapshot stream, each arriving generation diffs
    // to a changefeed (ChangeFeed, checkpoint-and-release), and the diff
    // applies to a REPLICA table via applyChangesMergeOnRead: one
    // O(changes) commit per generation (sidecar + one after-image file),
    // fully distributed — no diff row ever reaches the driver, unlike
    // q145's harness-boundary collect. The replica's DV'd read must equal
    // the primary's final state; unchanged generations diff to zero rows
    // and commit nothing.
    QueryDef("q165_stream_mor_replication", (s, dir) => withShufflePartitions(s, 8) {
      import graft.sources.reftable.{RefTableMutations, VersionedTable}
      import graft.operators.SnapshotDiff
      val rootA = RelationalSupport.scratchDir(s, dir, "q165_src")
      val rootB = RelationalSupport.scratchDir(s, dir, "q165_rep")
      val base = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val state2 = base.filter(col("s_suppkey") % 7 =!= 0)
        .withColumn("s_nationkey", when(col("s_suppkey") % 5 === 0,
          col("s_nationkey") + 100).otherwise(col("s_nationkey")))
        .unionAll(base.filter(col("s_suppkey") % 11 === 0)
          .select((col("s_suppkey") + 90000L).as("s_suppkey"), col("s_nationkey")))
      VersionedTable.publish(base, rootA)
      VersionedTable.publish(base, rootB) // replica pre-seeded at the baseline

      val feed = new SnapshotDiff.ChangeFeed(Seq("s_suppkey"))
      var batches = 0
      val df = s.readStream.format("reftable")
        .option("path", rootA)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT")
        .option("refreshInterval", "1s")
        .load()
      val q = df.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          val d = feed.next(b)
          // batch 0 is the all-insert baseline the replica already holds;
          // later unchanged generations diff to zero rows — skip both
          if (batches > 0 && !d.isEmpty)
            RefTableMutations.applyChangesMergeOnRead(s, rootB, d, Seq("s_suppkey"))
          batches += 1
          ()
        }
        .option("checkpointLocation", Files.createTempDirectory("graft_morrep_ck_").toString)
        .start()
      val t0 = System.nanoTime()
      q.processAllAvailable()
      VersionedTable.publish(state2, rootA)
      sleepPastRefreshBoundary() // cross the 1s refresh boundary
      q.processAllAvailable()
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      q.stop()
      feed.close()
      s.read.format("reftable")
        .option("path", rootB)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT")
        .load()
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("cnt"), min("s_suppkey").as("lo_key"))
        .orderBy("s_nationkey")
    }, Some(
      """WITH base AS (SELECT s_suppkey, s_nationkey FROM supplier),
        |s2 AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 5 = 0 THEN s_nationkey + 100 ELSE s_nationkey END AS s_nationkey
        |  FROM base WHERE s_suppkey % 7 <> 0
        |  UNION ALL
        |  SELECT s_suppkey + 90000, s_nationkey FROM base WHERE s_suppkey % 11 = 0)
        |SELECT s_nationkey, count(*) AS cnt, min(s_suppkey) AS lo_key
        |FROM s2 GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin)),

    // EXACTLY-ONCE STREAMING APPEND SINK: events stream into a reftable
    // via outputMode=append — each batch commits O(new data) under a
    // txn:<appId>:<batchId> marker riding the commit CAS (the reference's
    // restart contract, PipelineTest.java:151-177). The harness FORCES a
    // replay: after the first drain it deletes the checkpoint's last
    // commit record, so the restarted query re-runs the final batch
    // against the sink — the marker must land nothing. The read-back
    // aggregate equals the plain batch oracle over events: every row
    // exactly once despite the replay.
    // At scale: the commit is O(batch) — appended files + a by-reference
    // manifest delta; the base snapshot is never read or rewritten.
    QueryDef("q173_stream_append_sink", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, _) = tsEncoding(s, dir)
      val streamDir = Files.createTempDirectory("graft_asink_in_")
      Files.createSymbolicLink(streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val root = RelationalSupport.scratchDir(s, dir, "q173_append")
      val ck = Files.createTempDirectory("graft_asink_ck_").toString
      val ddl = "event_id BIGINT, user_id BIGINT, value DOUBLE"
      def drain(): Unit = {
        val q = s.readStream.schema(eventsSchema(tsType)).parquet(streamDir.toString)
          .select(col("event_id"), col("user_id"), col("value"))
          .writeStream.format("reftable")
          .option("path", root).option("schema", ddl)
          .option("checkpointLocation", ck)
          .outputMode("append")
          .trigger(Trigger.AvailableNow()).start()
        val t0 = System.nanoTime()
        q.awaitTermination(120000)
        graft.BenchProbe.addDrain(System.nanoTime() - t0)
        q.stop()
      }
      drain()
      // forced replay: drop the last commit record (and its local-FS .crc
      // sibling) so the restart re-runs that batch against the sink
      val commits = new java.io.File(s"$ck/commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
      commits.lastOption.foreach { c =>
        c.delete()
        new java.io.File(c.getParentFile, "." + c.getName + ".crc").delete()
      }
      drain()
      s.read.format("reftable").option("path", root).option("schema", ddl).load()
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("total"),
          min("event_id").as("lo"), max("event_id").as("hi"))
    }, Some(
      """SELECT count(*) AS n, round(sum(value), 4) AS total,
        |  min(event_id) AS lo, max(event_id) AS hi FROM events""".stripMargin)),

    // THE FULL INCREMENTAL ETL LOOP, table to table: the changefeed SOURCE
    // (q169's one-option delta mode) piped into the exactly-once APPEND
    // sink (q173) materializes a CDC LOG table — each generation's
    // insert/update/delete rows land as one O(changes) commit under the
    // sink's txn marker, no foreachBatch, no driver-side rows. This is
    // the 100 TB shape for derived-table maintenance: per refresh, work
    // and commit are O(day's churn), never O(corpus), and a restart
    // replays nothing (source generations are checkpointed offsets; sink
    // batches are marker-deduped). The oracle recomputes bootstrap +
    // delta from the two states directly.
    QueryDef("q174_cdc_log_pipeline", (s, dir) => withShufflePartitions(s, 8) {
      import graft.sources.reftable.VersionedTable
      val rootA = RelationalSupport.scratchDir(s, dir, "q174_src")
      val rootB = RelationalSupport.scratchDir(s, dir, "q174_log")
      val base = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val state2 = base.filter(col("s_suppkey") % 7 =!= 0)
        .withColumn("s_nationkey", when(col("s_suppkey") % 5 === 0,
          col("s_nationkey") + 100).otherwise(col("s_nationkey")))
        .unionAll(base.filter(col("s_suppkey") % 11 === 0)
          .select((col("s_suppkey") + 90000L).as("s_suppkey"), col("s_nationkey")))
      VersionedTable.publish(base, rootA)
      val df = s.readStream.format("reftable")
        .option("path", rootA)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT")
        .option("changefeed", "true").option("keyColumns", "s_suppkey")
        .option("refreshInterval", "1s")
        .load()
      val q = df.writeStream.format("reftable")
        .option("path", rootB)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT, change_type STRING")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_cdclog_ck_").toString)
        .outputMode("append")
        .start()
      val t0 = System.nanoTime()
      q.processAllAvailable() // bootstrap generation lands as inserts
      VersionedTable.publish(state2, rootA)
      sleepPastRefreshBoundary() // cross the 1s refresh boundary
      q.processAllAvailable() // the delta generation appends
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      q.stop()
      s.read.format("reftable")
        .option("path", rootB)
        .option("schema", "s_suppkey BIGINT, s_nationkey INT, change_type STRING")
        .load()
        .groupBy("change_type")
        .agg(count(lit(1)).as("n"), sum("s_suppkey").as("key_sum"),
          sum("s_nationkey").as("nat_sum"))
        .orderBy("change_type")
    }, Some(
      """WITH base AS (SELECT s_suppkey, s_nationkey FROM supplier),
        |s2 AS (
        |  SELECT s_suppkey,
        |    CASE WHEN s_suppkey % 5 = 0 THEN s_nationkey + 100 ELSE s_nationkey END AS s_nationkey
        |  FROM base WHERE s_suppkey % 7 <> 0
        |  UNION ALL
        |  SELECT s_suppkey + 90000, s_nationkey FROM base WHERE s_suppkey % 11 = 0),
        |log AS (
        |  SELECT s_suppkey, s_nationkey, 'insert' AS change_type FROM base
        |  UNION ALL
        |  SELECT a.s_suppkey, a.s_nationkey, 'insert'
        |  FROM s2 a LEFT JOIN base b USING (s_suppkey) WHERE b.s_suppkey IS NULL
        |  UNION ALL
        |  SELECT b.s_suppkey, b.s_nationkey, 'delete'
        |  FROM base b LEFT JOIN s2 a USING (s_suppkey) WHERE a.s_suppkey IS NULL
        |  UNION ALL
        |  SELECT a.s_suppkey, a.s_nationkey, 'update'
        |  FROM base b JOIN s2 a USING (s_suppkey) WHERE b.s_nationkey <> a.s_nationkey)
        |SELECT change_type, count(*) AS n,
        |  CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
        |  CAST(sum(s_nationkey) AS BIGINT) AS nat_sum
        |FROM log GROUP BY change_type ORDER BY change_type""".stripMargin)),

    // STREAMING EXACT DEDUP — the ingestion-dedup operator: the event
    // stream arrives with every row duplicated (two sources of the same
    // feed), and dropDuplicatesWithinWatermark keys state by event_id with
    // event-time-bounded retention — the property that makes streaming
    // dedup viable over an unbounded 100 TB feed (plain dropDuplicates
    // state never expires; watermarked state is O(events within the
    // lateness window)). Output must equal the batch distinct, i.e. the
    // plain events oracle.
    QueryDef("q176_stream_dedup", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, tsExpr) = tsEncoding(s, dir)
      val streamDir = Files.createTempDirectory("graft_sdedup_")
      // the SAME feed twice: every event_id arrives exactly two times
      Files.createSymbolicLink(streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      Files.createSymbolicLink(streamDir.resolve("events_dup.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val deduped = s.readStream.schema(eventsSchema(tsType)).parquet(streamDir.toString)
        .withColumn("tsm", expr(tsExpr))
        .withWatermark("tsm", "1 hour")
        .dropDuplicatesWithinWatermark("event_id")
      drain(s, deduped, "append")
        .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_ids"),
          r4(sum("value")).as("total"))
    }, Some(
      """SELECT count(*) AS n, count(DISTINCT event_id) AS n_ids,
        |  round(sum(value), 4) AS total FROM events""".stripMargin)),

    // TRANSFORMWITHSTATE — Spark 4's successor arbitrary-state API (typed
    // state handles, TTL, RocksDB multi-column-family store): per-user
    // running totals maintained across TWO micro-batches of the same feed
    // (maxFilesPerTrigger=1 over two copies), each batch emitting the
    // key's updated total. The final state per user is therefore exactly
    // 2x the batch aggregate — the oracle. State crosses the batch
    // boundary through the checkpoint, which is the property under test.
    QueryDef("q177_stream_tws_running", (s, dir) => withShufflePartitions(s, 8) {
      import s.implicits._
      val (tsType, _) = tsEncoding(s, dir)
      val streamDir = Files.createTempDirectory("graft_tws_")
      Files.createSymbolicLink(streamDir.resolve("a_events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      Files.createSymbolicLink(streamDir.resolve("b_events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val prevProv = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val src = s.readStream.schema(eventsSchema(tsType))
          .option("maxFilesPerTrigger", "1")
          .parquet(streamDir.toString)
          .select(col("user_id"), col("value")).as[TwsEvent]
        val out = src.groupByKey(_.user_id)
          .transformWithState(new RunningTotalsProcessor,
            org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
        val mem = drain(s, out.toDF(), "append")
        // two emissions per user (one per batch); the final state is the
        // struct-max by cnt — cnt is strictly increasing
        mem.groupBy("user_id")
          .agg(max(struct(col("cnt"), col("total"))).as("m"))
          .select(col("user_id"), col("m.cnt").as("cnt"),
            r4(col("m.total")).as("total"))
          .orderBy("user_id")
      } finally prevProv match {
        case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }, Some(
      """SELECT user_id, 2 * count(*) AS cnt, round(2 * sum(value), 4) AS total
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // EXPECTATIONS AT THE SINK — DLT-style row-level quality gates
    // declared as table options and enforced IN the executor's write loop
    // (codegen'd predicates; onViolation=drop skips-and-counts, fail
    // aborts the epoch so nothing lands). The ingest stream carries the
    // raw feed; only rows passing the declared gates reach the table, and
    // the oracle is the batch filter.
    QueryDef("q179_expectations_gate", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, _) = tsEncoding(s, dir)
      val streamDir = Files.createTempDirectory("graft_exgate_")
      Files.createSymbolicLink(streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val root = RelationalSupport.scratchDir(s, dir, "q179_gate")
      val q = s.readStream.schema(eventsSchema(tsType)).parquet(streamDir.toString)
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format("reftable")
        .option("path", root)
        .option("schema", "event_id BIGINT, user_id BIGINT, value DOUBLE")
        .option("expect.min_value", "value >= 1.0")
        .option("expect.valid_user", "user_id >= 0")
        .option("onViolation", "drop")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_exgate_ck_").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      val t0 = System.nanoTime()
      q.awaitTermination(120000)
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      q.stop()
      s.read.format("reftable").option("path", root)
        .option("schema", "event_id BIGINT, user_id BIGINT, value DOUBLE").load()
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("total"),
          min("event_id").as("lo"), max("event_id").as("hi"))
    }, Some(
      """SELECT count(*) AS n, round(sum(value), 4) AS total,
        |  min(event_id) AS lo, max(event_id) AS hi
        |FROM events WHERE value >= 1.0 AND user_id >= 0""".stripMargin)),

    // QUARANTINE AT THE SINK — onViolation=quarantine splits the feed:
    // gate-passing rows land in the table, rejects land in the sibling
    // `__quarantine` table WITH the names of the rules they broke — an
    // auditable rejects log instead of silent loss. Both sides verified
    // against one oracle that replays the split (total row conservation
    // included: kept + quarantined = feed).
    QueryDef("q180_quarantine_split", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, _) = tsEncoding(s, dir)
      val streamDir = Files.createTempDirectory("graft_quar_")
      Files.createSymbolicLink(streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val root = RelationalSupport.scratchDir(s, dir, "q180_quar")
      val ddl = "event_id BIGINT, user_id BIGINT, value DOUBLE"
      val q = s.readStream.schema(eventsSchema(tsType)).parquet(streamDir.toString)
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream.format("reftable")
        .option("path", root).option("schema", ddl)
        .option("expect.min_value", "value >= 1.0")
        .option("onViolation", "quarantine")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_quar_ck_").toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      val t0 = System.nanoTime()
      q.awaitTermination(120000)
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      q.stop()
      val kept = s.read.format("reftable")
        .option("path", root).option("schema", ddl).load()
        .select(lit("kept").as("side"), col("event_id"), col("value"),
          lit("").as("violated"))
      val rejects = s.read.format("reftable")
        .option("path", root + "__quarantine")
        .option("schema", ddl + ", _violated STRING").load()
        .select(lit("quarantined").as("side"), col("event_id"), col("value"),
          col("_violated").as("violated"))
      kept.unionAll(rejects)
        .groupBy("side", "violated")
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("total"))
        .orderBy("side", "violated")
    }, Some(
      """SELECT CASE WHEN value >= 1.0 THEN 'kept' ELSE 'quarantined' END AS side,
        |  CASE WHEN value >= 1.0 THEN '' ELSE 'min_value' END AS violated,
        |  count(*) AS n, round(sum(value), 4) AS total
        |FROM events GROUP BY 1, 2 ORDER BY side, violated""".stripMargin)),

    // STREAMING UPDATE MODE INTO A KEYED TABLE — the watermarked windowed
    // aggregate, the most common streaming shape after plain append,
    // MAINTAINING a reftable in update mode: each epoch emits only the
    // CHANGED (window, type) rows, and the sink applies them as an
    // O(epoch) merge-on-read upsert on the declared keyColumns (DV on the
    // old images, epoch files adopted as the new ones — no table rewrite,
    // unlike complete mode's O(state) republish). The feed is split into
    // two half-feeds over the SAME time range, so epoch 2 genuinely
    // UPDATES epoch-1 keys in place; the final table must equal the batch
    // aggregate of the whole feed — the oracle.
    QueryDef("q183_stream_update_sink", (s, dir) => withShufflePartitions(s, 8) {
      val (tsType, tsExpr) = tsEncoding(s, dir)
      val streamDir = Files.createTempDirectory("graft_updsink_")
      val raw = s.read.schema(eventsSchema(tsType)).parquet(Tables.path(dir, "events"))
      // two epochs with overlapping window keys (both halves span the full
      // 30-day range; watermark delay exceeds the span, so nothing drops)
      raw.filter(col("event_id") % 2 === 0)
        .coalesce(1).write.parquet(s"$streamDir/half0")
      raw.filter(col("event_id") % 2 =!= 0)
        .coalesce(1).write.parquet(s"$streamDir/half1")
      val root = RelationalSupport.scratchDir(s, dir, "q183_upd")
      val ddl = "bucket_s BIGINT, event_type STRING, n BIGINT, total DOUBLE"
      val q = s.readStream.schema(eventsSchema(tsType))
        .option("recursiveFileLookup", "true").option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
        .withColumn("tsm", expr(tsExpr))
        .withWatermark("tsm", "90 days")
        .groupBy(window(col("tsm"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("total"))
        .select(unix_timestamp(col("window.start")).as("bucket_s"),
          col("event_type"), col("n"), col("total"))
        .writeStream.format("reftable")
        .option("path", root).option("schema", ddl)
        .option("keyColumns", "bucket_s,event_type")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_updsink_ck_").toString)
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      val t0 = System.nanoTime()
      q.awaitTermination(120000)
      graft.BenchProbe.addDrain(System.nanoTime() - t0)
      q.stop()
      s.read.format("reftable").option("path", root).option("schema", ddl).load()
        .select(col("bucket_s"), col("event_type"), col("n"),
          r4(col("total")).as("total"))
        .orderBy("bucket_s", "event_type")
    }, Some(
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket_s,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
