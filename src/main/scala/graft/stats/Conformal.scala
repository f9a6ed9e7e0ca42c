package graft.stats

import graft.core.Num.{md5Long, r4, r6}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split conformal prediction for regression (Vovk et al. 2005; Lei et al.
  * JASA 2018) — the distribution-free way to turn ANY point predictor into
  * a calibrated interval: fit on a proper-training split, take the
  * ⌈(n+1)(1−α)⌉-th smallest absolute calibration residual as the interval
  * half-width q̂, and the interval ŷ ± q̂ covers with probability ≥ 1−α,
  * no matter how wrong the model is.
  *
  * Scale shape: the md5 split is a stateless row tag, the OLS fit is one
  * moments aggregate, q̂ is one rank-select over the quantized-residual
  * distinct frame ([[graft.core.Ranks.withGlobalCumSums]] — no
  * single-partition sort), and coverage is one scoring scan. Nothing holds
  * more than a constant number of rows outside the executors.
  */
object Conformal {
  /** Split-conformal interval for y ~ x (closed-form simple OLS).
    * Splits by md5(id) mod 10: train 0-5, calibration 6-7, test 8-9.
    * Residuals quantize to 1e-4 (the oracle grid shared by the quantile
    * family). Returns one row: split sizes, the fitted line, q̂ at level
    * `alpha`, and the empirical test coverage of ŷ ± q̂. */
  def splitConformal(df: DataFrame, id: Column, x: Column, y: Column,
                     alpha: Double = 0.1): DataFrame = {
    val tagged = df.select(id.as("_id"), x.cast("double").as("_x"),
        y.cast("double").as("_y"))
      .withColumn("_s", md5Long(concat(col("_id"), lit("_conf"))) % 10)
    val train = tagged.filter(col("_s") < 6)
    // closed-form OLS from ONE moments aggregate; coefficients rounded to
    // the shared 1e-6 grid BEFORE any residual is computed, so both
    // engines score the identical line
    // r17 opt (guide §1.2/§2.3): the 1-row fit is cached (it was
    // recomputed by both its consumers — one extra corpus pass), and the
    // calibration AND test sides reduce in ONE corpus pass to a shared
    // (split-group, quantized-residual) histogram: coverage over the
    // 1e-4-quantized residuals is a ratio of integer counts, identical
    // off the histogram (sums of 1.0s regrouped — exact). 5 corpus
    // passes (tag+fit, calib scan, test scan, fit again, …) become 2.
    val fit = train.agg(count(lit(1)).cast("double").as("_n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_x")).as("_sxx"), sum(col("_x") * col("_y")).as("_sxy"))
      .select(col("_n"),
        r6((col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("_n") * col("_sxx") - col("_sx") * col("_sx"))).as("_b1"),
        col("_sx"), col("_sy"))
      .select(col("_n").as("_ntr"), col("_b1"),
        r6(col("_sy") / col("_n") - col("_b1") * (col("_sx") / col("_n"))).as("_b0"))
      .cache()
    val scored = tagged.crossJoin(broadcast(fit))
      .withColumn("_r", r4(abs(col("_y") - (col("_b0") + col("_b1") * col("_x")))))
    // ONE histogram pass over calib+test rows: grp c = calibration (6-7),
    // grp t = test (8-9); ≤ distinct-residual rows per group survive
    val hist = scored.filter(col("_s") >= 6)
      .groupBy(when(col("_s") <= 7, lit("c")).otherwise(lit("t")).as("_grp"),
        col("_r"))
      .agg(count(lit(1)).as("_c"))
      .cache()
    // q̂ = the ⌈(n+1)(1−α)⌉-th smallest |residual|: distinct-value frame +
    // distributed cumulative count, select min value whose cum reaches the
    // conformal rank (clamped to n so tiny calib sets stay defined)
    val g = hist.filter(col("_grp") === "c").select(col("_r"), col("_c"))
    val cum = graft.core.Ranks.withGlobalCumSums(g, Seq(col("_r")),
      Seq((col("_c"), "_cum")))
    val qhat = cum.agg(
      min(when(col("_cum") >=
        least(ceil((col("_cum_tot") + 1) * (1 - alpha)), col("_cum_tot")),
        col("_r"))).as("_qhat"),
      max(col("_cum_tot")).cast("long").as("n_calib"))
    val test = hist.filter(col("_grp") === "t").crossJoin(broadcast(qhat))
      .agg(coalesce(sum(col("_c")), lit(0L)).cast("long").as("n_test"),
        r4(sum(when(col("_r") <= col("_qhat"), col("_c")).otherwise(lit(0L)))
          .cast("double") / sum(col("_c")).cast("double")).as("coverage"),
        max(col("_qhat")).as("_q"), max(col("n_calib")).as("_nc"))
    fit.crossJoin(broadcast(test))
      .select(col("_ntr").cast("long").as("n_train"), col("_nc").as("n_calib"),
        col("n_test"), col("_b1").as("slope"), col("_b0").as("intercept"),
        r4(col("_q")).as("qhat"), r4(col("_q") * 2).as("interval_width"),
        col("coverage"),
        (col("coverage") >= lit(1 - alpha - 0.05)).as("coverage_floor"))
  }
}
