package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))` / `ntile(k).over(...)` on
  * data-scale frames. An unpartitioned window collapses the whole input
  * into ONE task (Spark plans it as `Exchange SinglePartition` + a
  * single-threaded sort) — fine on a 10-row decile frame, fatal on a
  * 100 TB fact table.
  *
  * Shape (the classic two-level selection layout, cf. TeraSort ranking):
  *   1. `repartitionByRange(sortCols)` — Spark's sampled range exchange
  *      puts partition i strictly before partition i+1 in sort order,
  *      each partition ~n/P rows, all P tasks in parallel;
  *   2. per-partition `row_number` windows keyed by `spark_partition_id()`
  *      (a hash exchange on the partition id, never SinglePartition);
  *   3. global rank = local rank + offset, where the offsets frame is the
  *      per-partition counts' prefix sum — a ≤P-row summary, broadcast.
  *
  * Both the offsets branch and the rank branch hang off the SAME range
  * exchange subtree, so Catalyst's ReuseExchange (and AQE's stage reuse)
  * evaluates the sampled range boundaries ONCE — the two branches cannot
  * disagree about which rows landed in which partition. PlanSpec gates
  * assert the reuse and the absence of any data-scale SinglePartition
  * exchange.
  *
  * Ordering must be TOTAL (callers pass a unique tiebreak column, as the
  * global-window formulations already did) so ranks are deterministic.
  */
object Ranks {

  private val Pid = "_gr_pid"
  private val Mid = "_gr_mid"
  private val Off = "_gr_off"
  private val Min = "_gr_minmid"
  private val Tot = "_gr_tot"

  /** `df` + a 1-based dense global row number over `sortCols`, plus a
    * total-count column `totName` (every row; needed by ntile) — without
    * any single-partition exchange and without a data-scale window.
    *
    * The local rank comes from `monotonically_increasing_id()` projected
    * ABOVE the per-partition sort: within a partition the id is the
    * per-row counter (consecutive from the partition's base), so
    * `mid − min(mid) + 1` is the local row number with zero extra
    * shuffle — the pid-keyed window formulation would re-exchange the
    * whole frame on the partition id. Both nondeterministic projections
    * (pid, mid) pin above the sort (Catalyst never reorders
    * nondeterministic exprs), and `min(mid)`/`count` in the summary
    * branch are row-order-independent, so the branches agree even if
    * EliminateSorts drops the sort under the aggregate. RanksSpec pins
    * exact parity with the window formulation (incl. AQE coalescing
    * off), so a change in the id's per-partition layout cannot land
    * silently. */
  private def ranked(df: DataFrame, sortCols: Seq[Column], rankName: String,
                     totName: String): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn(Pid, spark_partition_id())
      .withColumn(Mid, monotonically_increasing_id())
    // ≤P-row summary: per-partition counts → prefix-sum offsets + total.
    // The windows here run over the tiny counts frame, not the data.
    val wPrev = Window.orderBy(col(Pid)).rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col(Pid))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = ranged.groupBy(col(Pid))
      .agg(count(lit(1)).as("_gr_cnt"), min(col(Mid)).as(Min))
      .select(col(Pid), col(Min),
        coalesce(sum(col("_gr_cnt")).over(wPrev), lit(0L)).as(Off),
        sum(col("_gr_cnt")).over(wAll).as(Tot))
    ranged.join(broadcast(offsets), Pid)
      .withColumn(rankName, col(Mid) - col(Min) + 1 + col(Off))
      .withColumnRenamed(Tot, totName)
      .drop(Pid, Mid, Min, Off)
  }

  /** `df` + `rankName`: the global `row_number` over `sortCols`. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankName: String): DataFrame =
    ranked(df, sortCols, rankName, Tot).drop(Tot)

  /** `df` + `bucketName`: exactly `ntile(k).over(Window.orderBy(sortCols))`
    * — first n%k buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — computed in
    * closed form from the distributed rank. */
  def withGlobalNtile(df: DataFrame, sortCols: Seq[Column], k: Int,
                      bucketName: String): DataFrame = {
    val r = ranked(df, sortCols, "_gr_rn", Tot)
    // Spark's `/` is double division — use floor() for the integer
    // divisions (exact below 2^53 rows; a 100 TB corpus is ~2^40)
    val q = floor(col(Tot) / k) // floor bucket size
    val rem = col(Tot) % k // this many leading buckets get q+1 rows
    val head = rem * (q + lit(1L)) // rows covered by the big buckets
    val bucket = when(col("_gr_rn") <= head,
        floor((col("_gr_rn") - 1) / (q + lit(1L))) + 1)
      .otherwise(rem + floor((col("_gr_rn") - 1 - head) / q) + 1)
    r.withColumn(bucketName, bucket.cast("long")).drop("_gr_rn", Tot)
  }

  /** `df` + inclusive global running sums of each `(source, outName)`
    * pair over the `sortCols` total order, plus a grand-total column per
    * pair (`outName + "_tot"`, same value on every row) — the scale-safe
    * replacement for `sum(x).over(Window.orderBy(...))` on data-scale
    * frames (CDFs, midranks, prefix counts).
    *
    * Shape: range exchange on `sortCols`; per-partition running sums via
    * a window keyed on `spark_partition_id()` (ONE hash exchange, all
    * partitions in parallel — never SinglePartition); the cross-partition
    * carry is the ≤P-row per-partition-totals frame, prefix-summed and
    * broadcast. Integer-valued sources sum exactly in any order, so the
    * result is bit-identical to the single-partition window formulation
    * (callers with float sources must tolerate reassociation). */
  def withGlobalCumSums(df: DataFrame, sortCols: Seq[Column],
                        sums: Seq[(Column, String)]): DataFrame = {
    val tagged = sums.zipWithIndex.map { case ((c, name), i) => (s"_gr_s$i", name, c) }
    val withSrc = tagged.foldLeft(df) { case (d, (tmp, _, c)) => d.withColumn(tmp, c) }
    val ranged = withSrc.repartitionByRange(sortCols: _*)
      .withColumn(Pid, spark_partition_id())
    val wPrev = Window.orderBy(col(Pid)).rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col(Pid))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val perPart = ranged.groupBy(col(Pid))
      .agg(sum(col(tagged.head._1)).as(s"${tagged.head._1}_t"),
        tagged.tail.map { case (tmp, _, _) => sum(col(tmp)).as(s"${tmp}_t") }: _*)
    val offs = perPart.select(col(Pid) +: tagged.flatMap { case (tmp, name, _) => Seq(
      coalesce(sum(col(s"${tmp}_t")).over(wPrev), lit(0)).as(s"${tmp}_off"),
      sum(col(s"${tmp}_t")).over(wAll).as(s"${name}_tot")) }: _*)
    val wLoc = Window.partitionBy(col(Pid)).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = ranged.join(broadcast(offs), Pid)
    val out = tagged.foldLeft(joined) { case (d, (tmp, name, _)) =>
      d.withColumn(name, sum(col(tmp)).over(wLoc) + col(s"${tmp}_off")) }
    out.drop(Pid +: tagged.flatMap { case (tmp, _, _) =>
      Seq(tmp, s"${tmp}_off") }: _*)
  }

  /** `df` + `lead(value, 1)` over the `sortCols` total order, distributed:
    * per-partition leads after a range exchange; each partition's LAST row
    * takes the next non-empty partition's minimum (the global successor,
    * since range partitions are value-ordered) from a broadcast ≤P-row
    * boundary frame. The global maximum's lead is null, as with the
    * window formulation. */
  def withGlobalLead(df: DataFrame, sortCols: Seq[Column], value: Column,
                     outName: String): DataFrame = {
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn(Pid, spark_partition_id())
      .withColumn("_gr_lv", value)
    val bounds = ranged.groupBy(col(Pid)).agg(min(col("_gr_lv")).as("_gr_pmin"))
      .select(col(Pid),
        lead(col("_gr_pmin"), 1).over(Window.orderBy(col(Pid))).as("_gr_next"))
    val wLoc = Window.partitionBy(col(Pid)).orderBy(sortCols: _*)
    ranged.join(broadcast(bounds), Pid)
      .withColumn(outName,
        coalesce(lead(col("_gr_lv"), 1).over(wLoc), col("_gr_next")))
      .drop(Pid, "_gr_lv", "_gr_next")
  }

  /** Exact order statistics of `value` at any distinct-set cardinality:
    * ONE map-side-combined groupBy to the (value, count) frame, the
    * DISTRIBUTED cumulative count over it ([[withGlobalCumSums]] — no
    * single-partition window even when the distinct set is data-scale,
    * e.g. unquantized prices), then boundary t = min v with cum ≥ t —
    * identical to selecting rank `ceil(n·p)` from a global sort. Returns
    * the values at ranks `ceil(n·p)` for each p, in one job. */
  def exactQuantilesByValue(df: DataFrame, value: Column,
                            probs: Seq[Double]): Seq[Double] = {
    val g = df.select(value.cast("double").as("_v"))
      .groupBy(col("_v")).agg(count(lit(1)).as("_c"))
    val cum = withGlobalCumSums(g, Seq(col("_v")), Seq((col("_c"), "_cum")))
    val sels = probs.zipWithIndex.map { case (p, i) =>
      min(when(col("_cum") >= ceil(col("_cum_tot") * p), col("_v"))).as(s"_q$i")
    }
    val row = cum.agg(sels.head, sels.tail: _*).head()
    probs.indices.map(row.getDouble)
  }
}
