package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel + cohort retention — the two canonical event-analytics
  * queries next to [[Sessionize]] (every product/telemetry warehouse runs
  * them; a training-data pipeline runs the same shapes over ingest logs).
  *
  * Funnel: a user converts step k only if step k's event happens STRICTLY
  * AFTER their earliest qualifying step-(k−1) event — the running-minimum
  * formulation (cumulative min of each step's qualifying time, chained
  * through the window) needs ONE shuffle on user_id and one in-partition
  * pass, never a self-join per step.
  *
  * Retention: cohort = the user's first-activity week, offset = weeks
  * since cohort; weeks are integer epoch-day arithmetic (floor(us/86.4e9)
  * /7) so both engines bucket identically. Two aggregates on the same
  * user key + one bounded (cohort, offset) aggregate.
  *
  * Scale shape: everything shuffles on user_id once (uniform key); the
  * final frames are bounded by steps / calendar weeks, not corpus size.
  */
object Funnel {

  /** One row: users entering each of the 3 ordered steps + conversion
    * rates (rounded). */
  def funnel3(events: DataFrame, step1: String, step2: String,
              step3: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = events
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        col("event_type").as("_t"), unix_micros(col("ts")).as("_us"))
      .withColumn("_t1", min(when(col("_t") === step1, col("_us"))).over(w))
      .withColumn("_q2", when(col("_t") === step2 && col("_t1").isNotNull &&
        col("_us") > col("_t1"), col("_us")))
      .withColumn("_t2", min(col("_q2")).over(w))
      .withColumn("_q3", when(col("_t") === step3 && col("_t2").isNotNull &&
        col("_us") > col("_t2"), col("_us")))
    val perUser = staged.groupBy("user_id")
      .agg(max(col("_t1").isNotNull).as("_s1"),
        max(col("_q2").isNotNull).as("_s2"),
        max(col("_q3").isNotNull).as("_s3"))
    perUser.agg(
      count(lit(1)).cast("long").as("n_users"),
      sum(when(col("_s1"), 1L).otherwise(0L)).as("n_step1"),
      sum(when(col("_s2"), 1L).otherwise(0L)).as("n_step2"),
      sum(when(col("_s3"), 1L).otherwise(0L)).as("n_step3"))
      .select(col("n_users"), col("n_step1"), col("n_step2"), col("n_step3"),
        round(col("n_step2") / col("n_step1").cast("double"), 4).as("conv12"),
        round(col("n_step3") / col("n_step2").cast("double"), 4).as("conv23"))
  }

  /** (cohort_week, offset_weeks, n_users): distinct active users per
    * first-activity cohort and week offset. */
  def retentionWeekly(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id").cast("long").as("user_id"),
      floor(unix_micros(col("ts")) / lit(86400000000L * 7)).cast("long").as("_wk"))
    val cohort = ev.groupBy("user_id").agg(min(col("_wk")).as("_cw"))
    ev.join(cohort, "user_id")
      .groupBy(col("_cw").as("cohort_week"), (col("_wk") - col("_cw")).as("offset_weeks"))
      .agg(countDistinct(col("user_id")).cast("long").as("n_users"))
      .orderBy("cohort_week", "offset_weeks")
  }
}
