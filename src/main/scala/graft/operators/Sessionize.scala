package graft.operators

import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization: group events into per-key sessions separated by an
  * inactivity gap. Batch form uses Spark's session_window; the streaming
  * form (flatMapGroupsWithState with event-time timeouts) lives in
  * graft.queries.StreamingOps (q59) — both produce identical sessions.
  */
object Sessionize {
  /** (key, session start micros, n_events, value sum) per session. */
  def batch(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      gap: String = "30 minutes"): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), r4(sum(valueCol)).as("v"))
      .select(col(keyCol), unix_micros(col("sw.start")).as("start_us"), col("n_events"), col("v"))
}
