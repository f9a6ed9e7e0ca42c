package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-series outlier detection — Hampel's rule: flag points more
  * than k·1.4826·MAD from the median (MAD = median absolute deviation;
  * 1.4826 is the Gaussian consistency constant). The robust counterpart
  * of z-scoring that a telemetry / training-metrics pipeline uses for
  * spike detection, immune to the outliers it hunts.
  *
  * Scale shape: both medians are rank-selects inside the per-series
  * window — the series key is the ONLY shuffle and every pass reuses the
  * partitioning. Values are 4-decimal-rounded before ranking so every
  * rank decision (and the outlier threshold) is engine-identical for the
  * DuckDB oracle.
  */
object Robust {
  /** Lower median (rank ⌈n/2⌉) of `v` per series — deterministic and
    * exactly SQL-replayable where interpolated medians are not. */
  private def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
    val byS = Window.partitionBy(col("series"))
    df.withColumn("_rn", row_number().over(byS.orderBy(col(v), col("day"))))
      .withColumn("_n", count(lit(1)).over(byS))
      .filter(col("_rn") === ceil(col("_n") * 0.5))
      .select(col("series"), col(v).as(out))
  }

  /** Per-series (n_days, median, mad, n_outliers, max_dev) over a
    * (series, day, x) frame.
    *
    * MAD = 0 (a majority-constant series) is the standard Hampel
    * degenerate case: the naive threshold `dev > 0` would flag EVERY
    * point that differs at all from the median. We flag nothing instead
    * (mad > 0 is part of the outlier predicate, mirrored in the oracle)
    * — on such a series the robust scale carries no information and an
    * alarm-storm is worse than silence; callers that need a gate on a
    * constant series should profile a stddev-based scale. */
  def outlierMad(series: DataFrame, k: Double = 3.0): DataFrame = {
    val base = series.select(col("series"), col("day"), round(col("x"), 4).as("x4"))
    val med = lowerMedian(base, "x4", "med")
    val dev = base.join(med, "series")
      .withColumn("dev", round(abs(col("x4") - col("med")), 4))
    val mad = lowerMedian(dev.select(col("series"), col("day"), col("dev")), "dev", "mad")
    dev.join(mad, "series")
      .groupBy(col("series"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        round(max(col("med")), 4).as("median"),
        round(max(col("mad")), 4).as("mad"),
        sum(when(col("mad") > 0 && col("dev") > lit(k * 1.4826) * col("mad"), 1L)
          .otherwise(0L)).cast("long").as("n_outliers"),
        round(max(col("dev")), 4).as("max_dev"))
  }
}
