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

  /** Interval × interval OVERLAP join (lo1 ≤ hi2 AND lo2 ≤ hi1) — the
    * genomics/session-overlap shape. Both sides explode to their covered
    * buckets; a candidate pair can share many buckets, so each pair is
    * counted ONLY in its responsibility bucket floor(max(lo1,lo2)/width)
    * — the standard dedup trick that keeps the equi-join output a set
    * without a distinct shuffle. Output: (id, lo, hi, rid, rlo, rhi). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      idCol: String, loCol: String, hiCol: String,
                      ridCol: String, rloCol: String, rhiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth > 0")
    def side(df: DataFrame, id: String, lo: String, hi: String,
             oid: String, olo: String, ohi: String): DataFrame =
      df.select(col(id).cast("long").as(oid),
          col(lo).cast("double").as(olo), col(hi).cast("double").as(ohi))
        .filter(col(olo) <= col(ohi))
        .withColumn("bucket", explode(sequence(
          floor(col(olo) / bucketWidth).cast("long"),
          floor(col(ohi) / bucketWidth).cast("long"))))
    val l = side(left, idCol, loCol, hiCol, "id", "lo", "hi")
    val r = side(right, ridCol, rloCol, rhiCol, "rid", "rlo", "rhi")
    l.join(r, Seq("bucket"))
      .filter(col("lo") <= col("rhi") && col("rlo") <= col("hi") &&
        col("bucket") === floor(greatest(col("lo"), col("rlo")) / bucketWidth).cast("long"))
      .select(col("id"), col("lo"), col("hi"), col("rid"), col("rlo"), col("rhi"))
  }
}
