package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left event, the most recent right row with
  * right.time ≤ left.time on the same key: the canonical state-at-event
  * lookup of feature/training-data pipelines (label events joined to the
  * latest feature snapshot, purchases to the last preceding click, …).
  *
  * Spark-first shape: the naive formulation is a per-key range join
  * (quadratic in the dense-key worst case and unsupported as an equi-join);
  * the scalable one is the UNION trick — tag both sides, shuffle ONCE on
  * the key, and run a last-non-null carry-forward window in event-time
  * order. Cost is one exchange + one in-partition sort at any corpus
  * size, the same shape DuckDB/kdb implement ASOF JOIN with internally.
  *
  * Determinism: ties at equal time admit the right row (right sorts before
  * left at the same timestamp), and multiple right rows at the same
  * (key, time) resolve to the highest right id — both decisions are
  * explicit sort keys, so the DuckDB oracle replays them exactly.
  */
object AsOf {
  /** Join `left` (key, t, leftId) to the latest `right` (key, t, rightId,
    * value) with right.t ≤ left.t. Times are integer microseconds.
    * Output: (leftId, key, rightId, value, lag_us) — rightId/value/lag_us
    * null when no right row precedes the left event. */
  def asofJoin(left: DataFrame, right: DataFrame,
               keyCol: String, timeCol: String,
               leftIdCol: String, rightIdCol: String,
               valueCol: String): DataFrame = {
    val l = left.select(col(keyCol).cast("long").as("key"),
      col(timeCol).cast("long").as("t"), lit(1).as("_side"),
      lit(null).cast("long").as("rid"), lit(null).cast("double").as("rval"),
      lit(null).cast("long").as("rt"), col(leftIdCol).cast("long").as("lid"))
    val r = right.select(col(keyCol).cast("long").as("key"),
      col(timeCol).cast("long").as("t"), lit(0).as("_side"),
      col(rightIdCol).cast("long").as("rid"), col(valueCol).cast("double").as("rval"),
      col(timeCol).cast("long").as("rt"), lit(null).cast("long").as("lid"))
    val w = Window.partitionBy(col("key")).orderBy(col("t"), col("_side"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("a_rid", last(col("rid"), ignoreNulls = true).over(w))
      .withColumn("a_rval", last(col("rval"), ignoreNulls = true).over(w))
      .withColumn("a_rt", last(col("rt"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("lid"), col("key"), col("a_rid").as("rid"),
        col("a_rval").as("rval"), (col("t") - col("a_rt")).as("lag_us"))
  }
}
