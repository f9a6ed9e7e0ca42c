package graft.metrics

import graft.core.Num.r4
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation metrics (reference python/cuml/metrics/: regression.pyx
  * r2_score/mse, accuracy.pyx, cluster/adjustedrandindex.pyx) as single
  * codegen'd aggregate passes — each metric is one scan, no shuffle beyond
  * the final reduce, identical cost profile at any scale.
  */
object Metrics {
  /** R² = 1 − SS_res / SS_tot, one pass via sufficient sums. */
  def r2Score(df: DataFrame, y: Column, pred: Column): DataFrame =
    df.select(y.cast("double").as("_y"), pred.cast("double").as("_p"))
      .agg(
        count(lit(1)).cast("double").as("_n"),
        sum(col("_y")).as("_sy"), sum(col("_y") * col("_y")).as("_syy"),
        sum((col("_y") - col("_p")) * (col("_y") - col("_p"))).as("_ssres"))
      .select(r4(lit(1.0) - col("_ssres") / (col("_syy") - col("_sy") * col("_sy") / col("_n"))).as("r2"))

  /** MSE, RMSE, MAE in one pass. */
  def regressionErrors(df: DataFrame, y: Column, pred: Column): DataFrame = {
    val e = y.cast("double") - pred.cast("double")
    df.agg(
      r4(avg(e * e)).as("mse"),
      r4(sqrt(avg(e * e))).as("rmse"),
      r4(avg(abs(e))).as("mae"))
  }

  /** Fraction of rows where pred == y. */
  def accuracy(df: DataFrame, y: Column, pred: Column): DataFrame =
    df.agg(r4(avg(when(y === pred, 1.0).otherwise(0.0))).as("accuracy"))

  /** Adjusted Rand Index between two label columns — the contingency table
    * is a groupBy (shuffle on (a,b) only, cardinality = #classes²), then the
    * pair-count formula on the driver-sized result. */
  def adjustedRand(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cont = df.groupBy(a.as("_a"), b.as("_b")).agg(count(lit(1)).cast("double").as("_n"))
    def comb2(c: Column): Column = c * (c - 1) / 2.0
    val stats = cont.agg(
      sum(col("_n")).as("_tot"),
      sum(comb2(col("_n"))).as("_sij"))
    val aSide = cont.groupBy(col("_a")).agg(sum(col("_n")).as("_m"))
      .agg(sum(comb2(col("_m"))).as("_sa"))
    val bSide = cont.groupBy(col("_b")).agg(sum(col("_n")).as("_m"))
      .agg(sum(comb2(col("_m"))).as("_sb"))
    stats.crossJoin(aSide).crossJoin(bSide)
      .select(r4(
        (col("_sij") - col("_sa") * col("_sb") / comb2(col("_tot"))) /
          ((col("_sa") + col("_sb")) / 2.0 - col("_sa") * col("_sb") / comb2(col("_tot")))
      ).as("ari"))
  }
}
