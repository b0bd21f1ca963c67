package graft.queries

import java.nio.file.Files
import java.util.UUID

import graft.{QueryDef, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming queries driven through the `reftable` DSv2 source and Spark's
  * file streaming source. Each runs a real StreamingQuery to a memory sink,
  * drains it with processAllAvailable, and returns the result — which must
  * hash-match the same DuckDB oracle as the equivalent batch query: the
  * strongest possible check that the streaming path produces exactly the
  * table snapshot.
  */
object StreamingOps {

  /** Run a streaming DataFrame to completion against a memory sink. */
  private def drain(s: SparkSession, df: DataFrame, outputMode: String): DataFrame = {
    val name = "mem_" + UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", Files.createTempDirectory("graft_ck_").toString)
      .start()
    q.processAllAvailable()
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

    // event-time tumbling window through Spark's file streaming source with a
    // watermark — the batch q12 oracle must reproduce it exactly.
    QueryDef("q47_stream_tumbling", (s, dir) => {
      try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      catch { case _: Throwable => () }
      // the file streaming source wants a directory; expose the single
      // events file through a temp dir via symlink
      val evDir = Files.createTempDirectory("graft_events_")
      Files.createSymbolicLink(evDir.resolve("events.parquet"),
        java.nio.file.Paths.get(Tables.path(dir, "events")))
      val raw = s.readStream
        .schema(StructType(Seq(
          StructField("event_id", LongType), StructField("ts", LongType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType))))
        .parquet(evDir.toString)
      val agg = raw
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), r4(sum("value")).as("sum_value"))
      drain(s, agg, "complete")
        .select(unix_timestamp(col("window.start")).as("bucket_s"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("bucket_s", "event_type")
    }, Some(
      """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS bucket_s, event_type,
        |   count(*) AS n, round(sum(value), 4) AS sum_value
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
