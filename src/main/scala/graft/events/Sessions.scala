package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event log — the standard segmentation
  * step of web-analytics / telemetry / training-data pipelines (a session
  * ends when the user is idle longer than the gap). Spark's Structured
  * Streaming counterpart is `session_window`; this is the batch twin, and
  * `graft.streaming.StreamingOps.streamingSessions` shares the gap
  * semantics on the live path.
  *
  * Scale shape: ONE shuffle on user_id (uniform key at any corpus size),
  * then two in-partition window passes over each user's bounded history;
  * per-session stats are a grouped aggregate on (user, session) that
  * reuses the same partitioning — no driver state, no corpus-wide window.
  * Time math runs on integer microseconds (`unix_micros`) so the DuckDB
  * oracle (`epoch_us`) reproduces every boundary decision bit-for-bit.
  */
object Sessionize {
  /** Per-user session summary: session count, event count, largest
    * session, mean/max session duration in seconds. */
  def userSessions(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_us"), col("event_id"))
    val sess = events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_micros(col("ts")).as("_us"))
      .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(w))
      .withColumn("_new", when(col("_gap").isNull || col("_gap") > gapUs, 1L).otherwise(0L))
      .withColumn("_sess", sum(col("_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("_sess"))
      .agg(count(lit(1)).as("_n"),
        ((max(col("_us")) - min(col("_us"))) / 1e6).as("_dur"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_sessions"),
        sum(col("_n")).cast("long").as("n_events"),
        max(col("_n")).cast("long").as("max_session_events"),
        round(avg(col("_dur")), 4).as("avg_session_s"),
        round(max(col("_dur")), 4).as("max_session_s"))
  }
}
