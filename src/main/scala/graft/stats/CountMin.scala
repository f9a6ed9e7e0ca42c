package graft.stats

import graft.core.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the fixed-memory
  * frequency summary streaming ingest keeps when even the Misra-Gries
  * candidate list is too much state: d hash rows × w counters, point
  * query = min over the d addressed counters, NEVER an underestimate.
  *
  * Scale shape: the sketch build is ONE map-side-combined groupBy of
  * (row, slot) pairs generated in-row (d array entries per token) — the
  * sketch is O(d·w) regardless of corpus size and is exactly what ships
  * to the driver/monitoring store. The audit joins the sketch estimates
  * back against exact counts for the top-k tokens, proving the one-sided
  * error bound in-pass (same discipline as dedup_bloom's FP audit). */
object CountMin {
  private def slot(tok: Column, i: Int, w: Int): Column =
    Num.md5Long(concat(tok, lit(s"_cm_$i"))) % w

  /** Build the d×w sketch over `tok` occurrences in `toks` (one token per
    * row), then audit the top-`k` exact tokens: (rank, term, exact, est,
    * overestimate, never_under). Estimates and exact counts replay in SQL
    * bit-for-bit (md5 addressing). */
  def topkAudit(toks: DataFrame, tok: Column, d: Int, w: Int,
                k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = toks.select(tok.as("_t"))
    val sketch = base.select(posexplode(
        array((0 until d).map(i => slot(col("_t"), i, w)): _*)).as(Seq("row", "slot")))
      .groupBy(col("row"), col("slot"))
      .agg(count(lit(1)).cast("long").as("c"))
    val exact = base.groupBy(col("_t")).agg(count(lit(1)).cast("long").as("exact"))
      .orderBy(col("exact").desc, col("_t")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("exact").desc, col("_t"))))
    // estimate: d broadcast lookups of the O(d·w) sketch, min over rows
    val withSlots = exact.select(col("rank"), col("_t"), col("exact"),
      posexplode(array((0 until d).map(i => slot(col("_t"), i, w)): _*))
        .as(Seq("row", "slot")))
    withSlots.join(sketch, Seq("row", "slot"))
      .groupBy(col("rank"), col("_t").as("term"), col("exact"))
      .agg(min(col("c")).as("est"))
      .select(col("rank").cast("long").as("rank"), col("term"), col("exact"),
        col("est"), (col("est") - col("exact")).as("overestimate"),
        (col("est") >= col("exact")).as("never_under"))
      .orderBy("rank")
  }
}
