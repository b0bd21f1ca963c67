package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** The proof behind the q59/q136 single-drain collapse (round 21): ONE
  * AvailableNow drain whose input ALREADY contains the watermark-advancing
  * sentinel commits the follow-up no-data batch — where event-time timeouts
  * fire / session windows finalize — before awaitTermination returns. Before
  * the collapse those entries ran two full stream lifecycles (ingest drain,
  * then sentinel drain) to get the same emissions.
  */
case class DrainSpecEv(user_id: Long, tsm: java.sql.Timestamp, value: Double)
case class DrainSpecOut(user_id: Long, n: Long)

class StreamingDrainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private type Ev = DrainSpecEv
  private type Out = DrainSpecOut
  private val Ev = DrainSpecEv
  private val Out = DrainSpecOut

  test("single AvailableNow drain commits the no-data timeout batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_drainspec_")
    // real events (old event time) and the far-future sentinel are BOTH on
    // disk before the stream starts — the collapsed-drain input shape
    // (bare .parquet files in the watched dir, like the entries' sentinels)
    def land(name: String, rows: Seq[Ev]): Unit = {
      val stage = Files.createTempDirectory("graft_drainspec_stage_").toString + "/d"
      rows.toDF().coalesce(1).write.parquet(stage)
      new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          Files.move(f.toPath, dir.resolve(s"$name$i.parquet")); () }
    }
    land("batch0_", Seq(
      Ev(1L, new java.sql.Timestamp(1000_000L), 1.0),
      Ev(1L, new java.sql.Timestamp(1060_000L), 2.0),
      Ev(2L, new java.sql.Timestamp(1000_000L), 3.0)))
    Thread.sleep(20) // distinct mtime: sentinel strictly newer (oldest-first source order)
    land("sentinel_", Seq(Ev(-1L, java.sql.Timestamp.valueOf("2033-01-01 00:00:00"), 0.0)))

    val events = spark.readStream
      .schema(Seq(Ev(0L, null, 0.0)).toDF().schema)
      .parquet(dir.toString)
      .withWatermark("tsm", "0 seconds")
      .as[Ev]

    // sessions flush ONLY via the event-time timeout — an emission therefore
    // proves the no-data batch (watermark past every close) ran and committed
    val sessions = events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Out](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val n = state.get; state.remove()
            Iterator.single(Out(uid, n))
          } else {
            state.update(state.getOption.getOrElse(0L) + evs.size)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 60000L)
            Iterator.empty
          }
      }

    val got = scala.collection.mutable.ArrayBuffer.empty[Out]
    val q = sessions.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Out], _: Long) =>
        got.synchronized { got ++= b.collect() }; ()
      }
      .option("checkpointLocation", Files.createTempDirectory("graft_drainspec_ck_").toString)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow drain did not terminate")
    q.stop()

    val byUser = got.synchronized { got.filter(_.user_id >= 0).map(o => o.user_id -> o.n).toMap }
    // every real user's state flushed inside the ONE drain
    assert(byUser == Map(1L -> 2L, 2L -> 1L), s"got $byUser")
  }
}
