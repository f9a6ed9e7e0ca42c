package graft.tsa

import graft.core.Num.r4
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series surface (reference python/cuml/tsa/: stationarity.pyx,
  * holtwinters.pyx, arima.pyx; python/cuml/filter/kalman_filter.pyx).
  *
  * Batched-series layout, like the reference: many independent series keyed
  * by a series column. Everything partitions by series key, so 10⁶ series ×
  * long histories parallelize trivially; per-series state recursions run
  * in-partition after the groupByKey shuffle, and per-series model fits are
  * ONE grouped aggregate + a per-row closed-form solve — never a driver
  * loop over series.
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

  /** Simple exponential smoothing — the HoltWinters level channel
    * (reference tsa/holtwinters.pyx, additive level only):
    *   s_0 = x_0;  s_t = α·x_t + (1−α)·s_{t−1}
    * Per-series in-partition recursion (the closed-form window variant
    * multiplies by (1−α)^{−t}, which overflows doubles past t ≈ 10³ —
    * exactly the long-history regime the batched layout targets). Emits
    * every (series, t, x, smoothed) row; parallel across series. */
  def sesSmoothed(series: DataFrame, alpha: Double): DataFrame = {
    import series.sparkSession.implicits._
    val rows = series.select(col("series").cast("string"), col("t").cast("long"),
      col("x").cast("double")).as[(String, Long, Double)]
    rows.groupByKey(_._1).flatMapGroups { (key, it) =>
      val xs = it.toSeq.sortBy(_._2)
      if (xs.isEmpty) Iterator.empty
      else {
        var s = xs.head._3
        var first = true
        xs.iterator.map { case (_, t, x) =>
          if (first) first = false else s = alpha * x + (1.0 - alpha) * s
          (key, t, x, s)
        }
      }
    }.toDF("series", "t", "x", "smoothed")
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

  /** Full additive Holt-Winters: level + trend + seasonal channel of period
    * m (reference tsa/holtwinters.pyx, cpp/src/holtwinters/ — the seasonal
    * fit is the headline of the reference implementation).
    *   l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(x_t − l_t) + (1−γ)s_{t−m}
    * Init (classical): l = mean(x_0..x_{m−1}), b = (mean of second m − mean
    * of first m)/m, s_i = x_i − l. Series shorter than 2m are skipped.
    * Per-series in-partition recursion, parallel across series; the 1-step
    * forecast adds the matching seasonal term. */
  def holtWintersSeasonal(series: DataFrame, alpha: Double, beta: Double,
                          gamma: Double, period: Int,
                          multiplicative: Boolean = false): DataFrame = {
    import series.sparkSession.implicits._
    val m = period
    val rows = series.select(col("series").cast("string"), col("t").cast("long"),
      col("x").cast("double")).as[(String, Long, Double)]
    rows.groupByKey(_._1).flatMapGroups { (key, it) =>
      val xs = it.toSeq.sortBy(_._2).map(_._3)
      if (xs.length < 2 * m) Iterator.empty
      else {
        var l = xs.take(m).sum / m.toDouble
        var b = (xs.slice(m, 2 * m).sum / m.toDouble - l) / m.toDouble
        val seas = scala.collection.mutable.Queue(
          xs.take(m).map(x => if (multiplicative) x / l else x - l): _*)
        var t = m
        while (t < xs.length) {
          val sOld = seas.dequeue()
          val lPrev = l
          if (multiplicative) {
            l = alpha * (xs(t) / sOld) + (1.0 - alpha) * (l + b)
            b = beta * (l - lPrev) + (1.0 - beta) * b
            seas.enqueue(gamma * (xs(t) / l) + (1.0 - gamma) * sOld)
          } else {
            l = alpha * (xs(t) - sOld) + (1.0 - alpha) * (l + b)
            b = beta * (l - lPrev) + (1.0 - beta) * b
            seas.enqueue(gamma * (xs(t) - l) + (1.0 - gamma) * sOld)
          }
          t += 1
        }
        val f = if (multiplicative) (l + b) * seas.head else l + b + seas.head
        Iterator((key, xs.length.toLong - 1, l, b, f))
      }
    }.toDF("series", "t_last", "_l", "_b", "_f")
      .select(col("series"), col("t_last"),
        round(col("_l"), 4).as("level"),
        round(col("_b"), 4).as("trend"),
        round(col("_f"), 4).as("forecast1"))
  }

  /** h-step Holt-Winters forecasts — the reference's
    * ExponentialSmoothing.forecast(h) (tsa/holtwinters.pyx): run the same
    * per-series recursion as [[holtWintersSeasonal]], then emit
    *   ŷ_{T+k} = l + k·b + s_{(k−1) mod m}   (additive)
    *   ŷ_{T+k} = (l + k·b) · s_{(k−1) mod m} (multiplicative)
    * for k = 1..h, where s is the final seasonal window (oldest first —
    * s_0 is the season of time T+1). One row per (series, step). */
  def holtWintersForecast(series: DataFrame, alpha: Double, beta: Double,
                          gamma: Double, period: Int, h: Int,
                          multiplicative: Boolean = false): DataFrame = {
    import series.sparkSession.implicits._
    val m = period
    val rows = series.select(col("series").cast("string"), col("t").cast("long"),
      col("x").cast("double")).as[(String, Long, Double)]
    rows.groupByKey(_._1).flatMapGroups { (key, it) =>
      val xs = it.toSeq.sortBy(_._2).map(_._3)
      if (xs.length < 2 * m) Iterator.empty
      else {
        var l = xs.take(m).sum / m.toDouble
        var b = (xs.slice(m, 2 * m).sum / m.toDouble - l) / m.toDouble
        val seas = scala.collection.mutable.Queue(
          xs.take(m).map(x => if (multiplicative) x / l else x - l): _*)
        var t = m
        while (t < xs.length) {
          val sOld = seas.dequeue()
          val lPrev = l
          if (multiplicative) {
            l = alpha * (xs(t) / sOld) + (1.0 - alpha) * (l + b)
            b = beta * (l - lPrev) + (1.0 - beta) * b
            seas.enqueue(gamma * (xs(t) / l) + (1.0 - gamma) * sOld)
          } else {
            l = alpha * (xs(t) - sOld) + (1.0 - alpha) * (l + b)
            b = beta * (l - lPrev) + (1.0 - beta) * b
            seas.enqueue(gamma * (xs(t) - l) + (1.0 - gamma) * sOld)
          }
          t += 1
        }
        val seasArr = seas.toIndexedSeq
        (1 to h).iterator.map { k =>
          val s = seasArr((k - 1) % m)
          val f = if (multiplicative) (l + k * b) * s else l + k * b + s
          (key, k.toLong, f)
        }
      }
    }.toDF("series", "step", "_f")
      .select(col("series"), col("step"), round(col("_f"), 4).as("forecast"))
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

  /** Per-series 3-unknown (intercept + x1 + x2) least squares via grouped
    * moment sums + Cramer's rule — ONE aggregate job for all series, the
    * per-row solve is a closed-form expression. The expression tree mirrors
    * the SQL oracle operation-for-operation (left-assoc order), so both
    * engines produce bit-identical doubles.
    * Input columns: series, y/x1/x2 as given. Output: series, c0, c1, c2. */
  private[tsa] def cramer3(rows: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val mm = rows.groupBy(col("series")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(x1).as("sx1"), sum(x2).as("sx2"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
      sum(y).as("sy"), sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"))
    val det = col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("sx1") * (col("sx1") * col("s22") - col("s12") * col("sx2")) +
      col("sx2") * (col("sx1") * col("s12") - col("s11") * col("sx2"))
    val det0 = col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("sx1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("sx2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 = col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("sx1") * col("s22") - col("s12") * col("sx2")) +
      col("sx2") * (col("sx1") * col("s2y") - col("s1y") * col("sx2"))
    val det2 = col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("sx1") * (col("sx1") * col("s2y") - col("s1y") * col("sx2")) +
      col("sy") * (col("sx1") * col("s12") - col("s11") * col("sx2"))
    mm.select(col("series"), (det0 / det).as("c0"), (det1 / det).as("c1"),
      (det2 / det).as("c2"))
  }

  /** AR(2) by conditional least squares as ONE grouped aggregate over all
    * series (reference tsa/arima.pyx fits batched ARIMA; this is the AR
    * channel): lag features via window, per-series Gram sums, per-row
    * Cramer solve. No driver loop, no collect of keys — 10⁶ series is one
    * job. Output: (series, term ∈ {intercept, ar1, ar2}, coef). */
  def arFit2(series: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("t"))
    val lagged = series
      .withColumn("l1", lag(col("x"), 1).over(w))
      .withColumn("l2", lag(col("x"), 2).over(w))
      .filter(col("l1").isNotNull && col("l2").isNotNull)
    unpivotCoefs(cramer3(lagged, col("x"), col("l1"), col("l2")),
      Seq("intercept", "ar1", "ar2"))
  }

  /** General AR(p) grouped fit: per-series normal-equation sums in one
    * aggregate, per-row Gaussian-elimination solve (p+1 unknowns) in a
    * deterministic closure. Same single-job shape as arFit2 for any p. */
  def arFit(series: DataFrame, p: Int): DataFrame = {
    require(p >= 1, "p >= 1")
    val w = Window.partitionBy(col("series")).orderBy(col("t"))
    var d = series
    (1 to p).foreach(i => d = d.withColumn(s"lag$i", lag(col("x"), i).over(w)))
    val lagged = d.filter((1 to p).map(i => col(s"lag$i").isNotNull).reduce(_ && _))
    val terms: Seq[Column] = lit(1.0) +: (1 to p).map(i => col(s"lag$i"))
    val k = terms.size
    val gAggs = for (i <- 0 until k; j <- i until k)
      yield sum(terms(i) * terms(j)).as(s"g_${i}_$j")
    val bAggs = (0 until k).map(i => sum(terms(i) * col("x")).as(s"b_$i"))
    val mm = lagged.groupBy(col("series")).agg((gAggs ++ bAggs).head, (gAggs ++ bAggs).tail: _*)
    val gArr = array((for (i <- 0 until k; j <- 0 until k) yield
      col(s"g_${math.min(i, j)}_${math.max(i, j)}")): _*)
    val bArr = array((0 until k).map(i => col(s"b_$i")): _*)
    val solve = udf { (g: Seq[Double], b: Seq[Double]) =>
      val a = Array.tabulate(k, k)((i, j) => g(i * k + j))
      val rhs = b.toArray
      // Gaussian elimination with partial pivoting
      for (c <- 0 until k) {
        var piv = c
        for (r <- c + 1 until k) if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
        val tmp = a(c); a(c) = a(piv); a(piv) = tmp
        val tb = rhs(c); rhs(c) = rhs(piv); rhs(piv) = tb
        for (r <- c + 1 until k) {
          val f = a(r)(c) / a(c)(c)
          for (cc <- c until k) a(r)(cc) -= f * a(c)(cc)
          rhs(r) -= f * rhs(c)
        }
      }
      val x = new Array[Double](k)
      for (c <- k - 1 to 0 by -1) {
        var s = rhs(c)
        for (cc <- c + 1 until k) s -= a(c)(cc) * x(cc)
        x(c) = s / a(c)(c)
      }
      x.toSeq
    }
    val terms2 = "intercept" +: (1 to p).map(i => s"ar$i")
    mm.select(col("series"), solve(gArr, bArr).as("cf"))
      .select(col("series"), explode(array(terms2.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("term"), col("cf").getItem(i).as("coef"))
      }: _*)).as("s"))
      .select(col("series"), col("s.term").as("term"), col("s.coef").as("coef"))
  }

  private def unpivotCoefs(c: DataFrame, terms: Seq[String]): DataFrame =
    c.select(col("series"), explode(array(terms.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("term"), col(s"c$i").as("coef"))
      }: _*)).as("s"))
      .select(col("series"), col("s.term").as("term"), col("s.coef").as("coef"))

  /** h-step AR(2) forecasts (reference tsa/arima.pyx predict/forecast):
    * fit per-series AR(2) in the one grouped-aggregate pass, join the
    * coefficients back onto each series' last two observations (one grouped
    * aggregate — no window over the history), then unroll the forecast
    * recursion ŷ_{T+k} = c0 + c1·ŷ_{T+k−1} + c2·ŷ_{T+k−2} as k nested
    * column expressions. Everything stays one job; h is small by nature.
    * Output: (series, step, forecast). */
  def arForecast(series: DataFrame, h: Int): DataFrame = {
    require(h >= 1, "h >= 1")
    val coefs = {
      val w = Window.partitionBy(col("series")).orderBy(col("t"))
      val lagged = series
        .withColumn("l1", lag(col("x"), 1).over(w))
        .withColumn("l2", lag(col("x"), 2).over(w))
        .filter(col("l1").isNotNull && col("l2").isNotNull)
      cramer3(lagged, col("x"), col("l1"), col("l2"))
    }
    val lastTwo = series.groupBy(col("series")).agg(
        sort_array(collect_list(struct(col("t"), col("x"))), asc = false).as("_a"))
      .select(col("series"),
        col("_a").getItem(0).getField("x").as("xT"),
        col("_a").getItem(1).getField("x").as("xT1"))
    // series with fewer than 2 points have no xT1 (out-of-range getItem →
    // null) and no meaningful AR recursion — drop rather than emit nulls
    val j = coefs.join(lastTwo, Seq("series")).filter(col("xT1").isNotNull)
    var prev2: Column = col("xT1")
    var prev1: Column = col("xT")
    val fs = (1 to h).map { _ =>
      val f = col("c0") + col("c1") * prev1 + col("c2") * prev2
      prev2 = prev1
      prev1 = f
      f
    }
    j.select(col("series"), explode(array(fs.zipWithIndex.map { case (f, i) =>
        struct(lit(i + 1L).as("step"), round(f, 4).as("forecast"))
      }: _*)).as("s"))
      .select(col("series"), col("s.step").as("step"), col("s.forecast").as("forecast"))
  }

  /** ARIMA(1,1,1) by differencing + Hannan–Rissanen (reference
    * tsa/arima.pyx fits batched (p,d,q); this is the distributed
    * re-expression): d=1 via window difference, a preliminary AR(2) on the
    * differenced series supplies residuals, then dx_t is regressed on
    * (dx_{t−1}, e_{t−1}) — intercept + AR(1) + MA(1). Every stage is a
    * window + grouped aggregate; the only join is coefficient-broadcast
    * back onto the rows (shuffle key = series). Mirrors its SQL oracle
    * expression-for-expression. */
  def arimaHR(series: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series")).orderBy(col("t"))
    // d = 1: difference away the trend (what `stationarity` recommends here)
    val dx = series.withColumn("dx", col("x") - lag(col("x"), 1).over(w))
      .filter(col("dx").isNotNull)
      .select(col("series"), col("t"), col("dx"))
    // step 1: preliminary AR(2) per series → residuals
    val l = dx
      .withColumn("l1", lag(col("dx"), 1).over(w))
      .withColumn("l2", lag(col("dx"), 2).over(w))
    val f1 = l.filter(col("l1").isNotNull && col("l2").isNotNull)
    val ar = cramer3(f1, col("dx"), col("l1"), col("l2"))
    val e = l.join(ar, Seq("series"))
      .withColumn("e", when(col("l1").isNotNull && col("l2").isNotNull,
        col("dx") - (col("c0") + col("c1") * col("l1") + col("c2") * col("l2"))))
    // step 2: dx_t ~ intercept + dx_{t−1} + e_{t−1}
    val e1 = e.withColumn("e1", lag(col("e"), 1).over(w))
    val f2 = e1.filter(col("l1").isNotNull && col("e1").isNotNull)
    unpivotCoefs(cramer3(f2, col("dx"), col("l1"), col("e1")),
      Seq("intercept", "ar1", "ma1"))
  }

  /** 2-state constant-velocity Kalman filter — the multi-dimensional
    * (F,H,Q,R) matrix filter of reference filter/kalman_filter.pyx,
    * specialized to F=[[1,1],[0,1]], H=[1,0], Q=diag(q0,q1), scalar R:
    * state = (level, trend), symmetric P tracked as (p00,p01,p11). All the
    * matrix algebra unrolls to scalar expressions, so the recursion is
    * exactly SQL-oracle-able; per-series in-partition, parallel across
    * series. Init: level = x_0, trend = 0, P = I. */
  def kalmanCV(series: DataFrame, q0: Double, q1: Double, r: Double): DataFrame = {
    import series.sparkSession.implicits._
    val rows = series.select(col("series").cast("string"), col("t").cast("long"),
      col("x").cast("double")).as[(String, Long, Double)]
    rows.groupByKey(_._1).flatMapGroups { (key, it) =>
      val sorted = it.toSeq.sortBy(_._2)
      if (sorted.isEmpty) Iterator.empty
      else {
        var x0 = sorted.head._3; var x1 = 0.0
        var p00 = 1.0; var p01 = 0.0; var p11 = 1.0
        var si = 0.0
        sorted.tail.foreach { case (_, _, z) =>
          // predict (F x, F P F' + Q), then scalar-observation update
          val x0p = x0 + x1
          val p00p = p00 + p01 + p01 + p11 + q0
          val p01p = p01 + p11
          val p11p = p11 + q1
          val k0 = p00p / (p00p + r)
          val k1 = p01p / (p00p + r)
          val iv = z - x0p
          x0 = x0p + k0 * iv
          x1 = x1 + k1 * iv
          p00 = (1.0 - k0) * p00p
          p01 = (1.0 - k0) * p01p
          p11 = p11p - k1 * p01p
          si = si + iv * iv
        }
        Iterator((key, sorted.last._2, x0, x1, p00, si))
      }
    }.toDF("series", "t_last", "_l", "_tr", "_p", "_si")
      .select(col("series"), col("t_last"),
        round(col("_l"), 4).as("level"),
        round(col("_tr"), 4).as("trend"),
        round(col("_p"), 6).as("p00"),
        round(col("_si"), 4).as("sum_innov2"))
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
