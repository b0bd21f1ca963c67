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
  /** (key, session start micros, n_events, value sum) per session.
    * The window-start cast makes this NTZ-safe: unix_micros only accepts
    * TIMESTAMP_LTZ, but a TIMESTAMP_NTZ event column (the driver's testdata
    * encoding since round 9) produces an NTZ session_window — the cast is a
    * no-op for LTZ input and value-identical for NTZ under a UTC session.
    */
  def batch(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      gap: String = "30 minutes"): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), r4(sum(valueCol)).as("v"))
      .select(col(keyCol),
        unix_micros(col("sw.start").cast(org.apache.spark.sql.types.TimestampType)).as("start_us"),
        col("n_events"), col("v"))
}
