package graft.stats

import graft.core.Num.r6
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between a reference and a current slice
  * of the same column — the model/feature-drift gate of a production
  * pipeline (retrain triggers, ingest canaries).
  *
  * Both operators follow the roc_auc discipline: quantize the value to the
  * oracle grid, reduce to the DISTINCT-value (or bin) frame with one
  * map-side-combined groupBy, and run any ordered pass over that bounded
  * frame — never a global sort of raw rows.
  */
object Drift {
  /** Population Stability Index over `bins` reference-decile bins:
    *   PSI = Σ_b (p_cur − p_ref) · ln(p_cur / p_ref)
    * Boundaries are EXACT rank-select quantiles of the reference side
    * (the audit twin — the production path swaps in percentile_approx,
    * cf quantile_buckets_approx); bin shares are Laplace-smoothed by one
    * pseudo-count so empty bins stay finite, and every per-bin term is
    * rounded before the total so the SQL replay is exact.
    * Output: one row per bin + the repeated psi_total column. */
  def psi(df: DataFrame, value: Column, isRef: Column, bins: Int): DataFrame = {
    val rows = df.select(round(value, 4).as("_v"),
      when(isRef, 1L).otherwise(0L).as("_ref"))
    val ref = rows.filter(col("_ref") === 1)
    // all bins−1 boundary rank-selects in ONE job over the bounded
    // distinct-value frame (_v is quantized to 1e-4; r12: the raw-row
    // global row_number window was a single-partition sort of the whole
    // reference slice)
    val bounds = graft.core.Ranks.exactQuantilesByValue(
      ref, col("_v"), (1 until bins).map(_.toDouble / bins))
    // bin = 1 + #boundaries strictly below x (upper-inclusive deciles)
    val bin = bounds.foldLeft(lit(1L): Column) { (acc, b) =>
      acc + when(col("_v") > b, 1L).otherwise(0L)
    }
    val counts = rows.groupBy(bin.as("bin"))
      .agg(sum(col("_ref")).as("_nr"), sum(lit(1L) - col("_ref")).as("_nc"))
    val tot = counts.agg(sum(col("_nr")).as("_tr"), sum(col("_nc")).as("_tc"))
    val terms = counts.crossJoin(tot)
      .select(col("bin"), col("_nr").as("n_ref"), col("_nc").as("n_cur"),
        ((col("_nr") + 1.0) / (col("_tr") + lit(bins.toDouble))).as("_pr"),
        ((col("_nc") + 1.0) / (col("_tc") + lit(bins.toDouble))).as("_pc"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        r6(col("_pr")).as("p_ref"), r6(col("_pc")).as("p_cur"),
        r6((col("_pc") - col("_pr")) * log(col("_pc") / col("_pr"))).as("psi_term"))
    terms.withColumn("psi_total",
        round(sum(col("psi_term")).over(Window.partitionBy()), 6))
      .orderBy("bin")
  }

  /** PRODUCTION twin of [[psi]]: boundaries from the percentile_approx
    * sketch over the reference slice — ONE map-side-combined aggregate,
    * no global sort at any corpus size (the path a 100 TB drift monitor
    * actually runs; [[psi]] is its exact rank-select audit twin, same
    * relationship as quantile_buckets_approx / quantile_buckets).
    * Binning, smoothing, and the PSI terms are identical to [[psi]];
    * only the boundary source differs, so |psi_approx − psi| is bounded
    * by the sketch's rank error (spec-gated). Same output schema. */
  def psiApprox(df: DataFrame, value: Column, isRef: Column, bins: Int,
                accuracy: Int = 10000): DataFrame = {
    val rows = df.select(round(value, 4).as("_v"),
      when(isRef, 1L).otherwise(0L).as("_ref"))
    val probs = (1 until bins).map(_.toDouble / bins)
    val bounds = rows.filter(col("_ref") === 1)
      .agg(percentile_approx(col("_v"), typedLit(probs), lit(accuracy)).as("_b"))
      .head().getSeq[Double](0)
    val bin = bounds.foldLeft(lit(1L): Column) { (acc, b) =>
      acc + when(col("_v") > b, 1L).otherwise(0L)
    }
    val counts = rows.groupBy(bin.as("bin"))
      .agg(sum(col("_ref")).as("_nr"), sum(lit(1L) - col("_ref")).as("_nc"))
    val tot = counts.agg(sum(col("_nr")).as("_tr"), sum(col("_nc")).as("_tc"))
    val terms = counts.crossJoin(tot)
      .select(col("bin"), col("_nr").as("n_ref"), col("_nc").as("n_cur"),
        ((col("_nr") + 1.0) / (col("_tr") + lit(bins.toDouble))).as("_pr"),
        ((col("_nc") + 1.0) / (col("_tc") + lit(bins.toDouble))).as("_pc"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        r6(col("_pr")).as("p_ref"), r6(col("_pc")).as("p_cur"),
        r6((col("_pc") - col("_pr")) * log(col("_pc") / col("_pr"))).as("psi_term"))
    terms.withColumn("psi_total",
        round(sum(col("psi_term")).over(Window.partitionBy()), 6))
      .orderBy("bin")
  }

  /** Two-sample Kolmogorov–Smirnov statistic D = sup_x |F_ref − F_cur|,
    * exact over the quantized pooled support: one groupBy on the value
    * grid, then the DISTRIBUTED cumulative counts over the distinct-value
    * frame (r12, [[graft.core.Ranks.withGlobalCumSums]] — the
    * single-partition window was data-scale whenever the value grid is,
    * e.g. prices). `reject` compares the ROUNDED D to the large-sample
    * 5% threshold 1.358·√((n+m)/(n·m)) rounded to the same grid. */
  def ksTest(df: DataFrame, value: Column, isRef: Column): DataFrame = {
    val g = df.select(round(value, 4).as("_v"),
        when(isRef, 1L).otherwise(0L).as("_ref"))
      .groupBy(col("_v"))
      .agg(sum(col("_ref")).as("_nr"), sum(lit(1L) - col("_ref")).as("_nc"))
    val cum = graft.core.Ranks.withGlobalCumSums(g, Seq(col("_v")),
        Seq((col("_nr"), "_cr"), (col("_nc"), "_cc")))
      .withColumn("_tr", col("_cr_tot").cast("double"))
      .withColumn("_tc", col("_cc_tot").cast("double"))
    cum
      .agg(
        max(col("_tr")).cast("long").as("n_ref"),
        max(col("_tc")).cast("long").as("n_cur"),
        round(max(abs(col("_cr") / col("_tr") - col("_cc") / col("_tc"))), 6).as("d_stat"))
      .withColumn("crit",
        round(lit(1.358) * sqrt((col("n_ref") + col("n_cur")) /
          (col("n_ref").cast("double") * col("n_cur"))), 6))
      .withColumn("reject", col("d_stat") > col("crit"))
  }
}
