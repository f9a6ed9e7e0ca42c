package graft.tsa

import graft.core.Num.r4
import graft.stats.Moments
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series surface (reference python/cuml/tsa/: stationarity.pyx,
  * holtwinters.pyx, arima.pyx; python/cuml/filter/kalman_filter.pyx).
  *
  * Batched-series layout, like the reference: many independent series keyed
  * by a series column. Everything partitions by series key, so 10⁶ series ×
  * long histories parallelize trivially; per-series state recursions run
  * in-partition after a repartitionByRange — never on the driver.
  */
object TimeSeries {
  /** Daily aggregation of the events table into (series, t, x) — t is a
    * dense per-series index, x the daily sum. */
  def dailySeries(events: DataFrame, seriesCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("day"))
    events.groupBy(col(seriesCol).as("series"), to_date(col("ts")).as("day"))
      .agg(sum(col("value")).as("x"))
      .withColumn("t", row_number().over(w).cast("long") - 1)
  }

  /** Simple exponential smoothing, closed form (no recursion):
    *   s_t = (1−α)^t·x_0 + Σ_{i=1..t} α(1−α)^{t−i}·x_i
    * expressed as one window sum — the HoltWinters level channel
    * (reference tsa/holtwinters.pyx with additive level only). */
  def sesSmoothed(series: DataFrame, alpha: Double): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.withColumn("smoothed",
      sum(when(col("t") === 0, col("x")).otherwise(lit(alpha) * col("x")) *
        pow(lit(1.0 - alpha), -col("t").cast("double"))).over(w) *
        pow(lit(1.0 - alpha), col("t").cast("double")))
  }

  /** Holt's linear-trend smoothing (the level+trend channels of
    * reference tsa/holtwinters.pyx additive model):
    *   l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1});  b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    * init l_0 = x_0, b_0 = x_1 − x_0. Per-series sequential recursion run
    * in-partition via groupByKey — parallel across series, like the
    * reference's batched layout. Returns final level/trend and the 1-step
    * forecast per series. */
  def holtTrend(series: DataFrame, alpha: Double, beta: Double): DataFrame = {
    import series.sparkSession.implicits._
    val rows = series.select(col("series").cast("string"), col("t").cast("long"),
      col("x").cast("double")).as[(String, Long, Double)]
    rows.groupByKey(_._1).flatMapGroups { (key, it) =>
      val xs = it.toSeq.sortBy(_._2).map(_._3)
      if (xs.length < 2) Iterator.empty
      else {
        var l = xs(0)
        var b = xs(1) - xs(0)
        var i = 1
        while (i < xs.length) {
          val lPrev = l
          l = alpha * xs(i) + (1.0 - alpha) * (l + b)
          b = beta * (l - lPrev) + (1.0 - beta) * b
          i += 1
        }
        Iterator((key, xs.length.toLong - 1, l, b, l + b))
      }
    }.toDF("series", "t_last", "_l", "_b", "_f")
      .select(col("series"), col("t_last"),
        round(col("_l"), 4).as("level"),
        round(col("_b"), 4).as("trend"),
        round(col("_f"), 4).as("forecast1"))
  }

  /** Stationarity check (reference tsa/stationarity.pyx: pick d ∈ {0,1}
    * per batched series): variance-ratio heuristic — difference the series
    * if it reduces variance. Window lag + two aggregates, one shuffle on
    * the series key. */
  def stationarity(series: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("t"))
    val d = series.withColumn("dx", col("x") - lag(col("x"), 1).over(w))
    d.groupBy(col("series")).agg(
      r4(var_samp(col("x"))).as("var_x"),
      r4(var_samp(col("dx"))).as("var_dx"),
      when(var_samp(col("dx")) < var_samp(col("x")), 1).otherwise(0).as("d"))
  }

  /** AR(p) by conditional least squares: lag features via window, then the
    * one-pass Gram solve per series (reference tsa/arima.pyx fits batched
    * ARIMA; we fit the AR channel exactly). */
  def arFit(series: DataFrame, p: Int): Seq[(String, Seq[Double])] = {
    val w = Window.partitionBy(col("series")).orderBy(col("t"))
    var d = series
    (1 to p).foreach(i => d = d.withColumn(s"lag$i", lag(col("x"), i).over(w)))
    val lagged = d.na.drop()
    val keys = lagged.select(col("series")).distinct().collect().map(_.getString(0)).sorted
    keys.toSeq.map { k =>
      val m = graft.linear.OLS.fit(lagged.filter(col("series") === k),
        (1 to p).map(i => s"lag$i"), "x")
      k -> m.coefs
    }
  }

  /** Scalar Kalman filter (constant-velocity-free local level model):
    *   predict: P += Q;  update: K = P/(P+R); s += K(x−s); P *= (1−K).
    * Runs in-partition per series via groupBy+flatMapGroups — the recursion
    * is inherently sequential per series, parallel across series (exactly
    * the reference's batched layout, reference filter/kalman_filter.pyx). */
  def kalman1D(series: DataFrame, q: Double, r: Double): DataFrame = {
    import series.sparkSession.implicits._
    val rows = series.select(col("series").cast("string"), col("t").cast("long"),
      col("x").cast("double")).as[(String, Long, Double)]
    rows.groupByKey(_._1).flatMapGroups { (key, it) =>
      val sorted = it.toSeq.sortBy(_._2)
      var s = 0.0; var p = 1.0; var init = false
      var sumInnov2 = 0.0
      val out = sorted.map { case (_, t, x) =>
        if (!init) { s = x; p = 1.0; init = true }
        else {
          p += q
          val kGain = p / (p + r)
          val innov = x - s
          s += kGain * innov
          p *= (1.0 - kGain)
          sumInnov2 += innov * innov
        }
        (key, t, x, s, p)
      }
      val last = out.last
      Iterator((key, last._2, last._4, last._5, sumInnov2))
    }.toDF("series", "t_last", "_state", "_p", "_si")
      .select(col("series"), col("t_last"),
        round(col("_state"), 4).as("state"),
        round(col("_p"), 6).as("p_cov"),
        round(col("_si"), 4).as("sum_innov2"))
  }
}
