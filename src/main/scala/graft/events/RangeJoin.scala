package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match each left POINT to the right INTERVALS
  * containing it: the band-join shape of feature pipelines (price bands,
  * score buckets, time windows, geo strips).
  *
  * Spark-first shape: Catalyst turns a raw `lo <= p AND p <= hi` theta
  * join into a broadcast nested loop — O(n·m) at corpus scale. The
  * scalable formulation BUCKETIZES the range dimension: each interval
  * explodes to the ⌈len/width⌉+1 buckets it covers, each point maps to
  * one bucket, and the join is an EQUI-join on the bucket id with the
  * exact containment check as a post-filter — the same
  * bounded-fan-out/verify trick as the DBSCAN grid pair stage. Shuffle
  * volume is points + Σ interval spans, never the cross product.
  *
  * Choose `bucketWidth` near the typical interval length: fan-out per
  * interval is len/width+1 while a point never fans out at all, so the
  * cost is linear in both inputs for boundedly-long intervals.
  */
object RangeJoin {
  /** Inner range join: left (idCol, pointCol) × right (ridCol, loCol,
    * hiCol) with lo ≤ p ≤ hi. Output: (id, point, rid, lo, hi). */
  def pointInInterval(left: DataFrame, right: DataFrame,
                      idCol: String, pointCol: String,
                      ridCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth > 0")
    val l = left.select(col(idCol).cast("long").as("id"),
        col(pointCol).cast("double").as("p"))
      .withColumn("bucket", floor(col("p") / bucketWidth).cast("long"))
    val r = right.select(col(ridCol).cast("long").as("rid"),
      col(loCol).cast("double").as("lo"), col(hiCol).cast("double").as("hi"))
      .filter(col("lo") <= col("hi"))
      .withColumn("bucket", explode(sequence(
        floor(col("lo") / bucketWidth).cast("long"),
        floor(col("hi") / bucketWidth).cast("long"))))
    l.join(r, Seq("bucket"))
      .filter(col("lo") <= col("p") && col("p") <= col("hi"))
      .select(col("id"), col("p").as("point"), col("rid"), col("lo"), col("hi"))
  }
}
