package graft.queries

import graft.core.Tables
import graft.core.Num.{r4, r6}
import graft.tsa.TimeSeries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series query surface over `events` (daily series per event_type). */
object TSAQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "holtwinters" -> { (s, d) =>
      val ses = TimeSeries.sesSmoothed(TimeSeries.dailySeries(Tables.events(s, d)), 0.3)
      val w = Window.partitionBy(col("series")).orderBy(col("t").desc)
      ses.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("series"), col("t").as("t_last"), r4(col("smoothed")).as("s_last"))
        .orderBy("series")
    },
    "holt_trend" -> { (s, d) =>
      TimeSeries.holtTrend(TimeSeries.dailySeries(Tables.events(s, d)), 0.3, 0.1)
        .orderBy("series")
    },
    "stationarity" -> { (s, d) =>
      val daily = TimeSeries.dailySeries(Tables.events(s, d))
      val w = Window.partitionBy(col("series")).orderBy(col("t"))
      daily.withColumn("dx", col("x") - lag(col("x"), 1).over(w))
        .groupBy(col("series"))
        .agg(r6(var_samp(col("dx")) / var_samp(col("x"))).as("var_ratio"),
          when(var_samp(col("dx")) < var_samp(col("x")), 1L).otherwise(0L).as("d"))
        .orderBy("series")
    },
    "arima" -> { (s, d) =>
      import s.implicits._
      val fits = TimeSeries.arFit(TimeSeries.dailySeries(Tables.events(s, d)), 2)
      fits.flatMap { case (k, coefs) =>
        coefs.zip(Seq("intercept", "ar1", "ar2")).map { case (c, t) =>
          (k, t, math.rint(c * 10000) / 10000)
        }
      }.toDF("series", "term", "coef").orderBy("series", "term")
    },
    "kalman_1d" -> { (s, d) =>
      TimeSeries.kalman1D(TimeSeries.dailySeries(Tables.events(s, d)), 0.1, 2.0)
        .orderBy("series")
    }
  )

  private val dailySql =
    """SELECT event_type AS series, CAST(ts AS DATE) AS day, sum(value) AS x
      |  FROM events GROUP BY 1, 2""".stripMargin

  val oracles: Map[String, String] = Map(
    "holt_trend" ->
      s"""WITH RECURSIVE s0 AS ($dailySql),
         |s AS (SELECT series, x, (row_number() OVER (PARTITION BY series ORDER BY day) - 1)::BIGINT AS t FROM s0),
         |x1 AS (SELECT series, x AS xone FROM s WHERE t = 1),
         |ht AS (
         |  SELECT s.series, s.t, s.x AS l, x1.xone - s.x AS b
         |  FROM s JOIN x1 ON s.series = x1.series WHERE s.t = 0
         |  UNION ALL
         |  SELECT n.series, n.t,
         |    0.3 * n.x + (1.0 - 0.3) * (ht.l + ht.b) AS l,
         |    0.1 * ((0.3 * n.x + (1.0 - 0.3) * (ht.l + ht.b)) - ht.l) + (1.0 - 0.1) * ht.b AS b
         |  FROM ht JOIN s n ON n.series = ht.series AND n.t = ht.t + 1),
         |last AS (SELECT series, t, l, b, row_number() OVER (PARTITION BY series ORDER BY t DESC) AS rn FROM ht)
         |SELECT series, t AS t_last, round(l, 4) AS level, round(b, 4) AS trend,
         |  round(l + b, 4) AS forecast1
         |FROM last WHERE rn = 1 ORDER BY series""".stripMargin,
    "kalman_1d" ->
      s"""WITH RECURSIVE s0 AS ($dailySql),
         |s AS (SELECT series, x, (row_number() OVER (PARTITION BY series ORDER BY day) - 1)::BIGINT AS t FROM s0),
         |kf AS (
         |  SELECT series, t, x AS st, 1.0::DOUBLE AS p, 0.0::DOUBLE AS si FROM s WHERE t = 0
         |  UNION ALL
         |  SELECT n.series, n.t,
         |    kf.st + ((kf.p + 0.1) / ((kf.p + 0.1) + 2.0)) * (n.x - kf.st) AS st,
         |    (kf.p + 0.1) * (1.0 - ((kf.p + 0.1) / ((kf.p + 0.1) + 2.0))) AS p,
         |    kf.si + (n.x - kf.st) * (n.x - kf.st) AS si
         |  FROM kf JOIN s n ON n.series = kf.series AND n.t = kf.t + 1),
         |last AS (SELECT series, t, st, p, si,
         |    row_number() OVER (PARTITION BY series ORDER BY t DESC) AS rn FROM kf)
         |SELECT series, t AS t_last, round(st, 4) AS state, round(p, 6) AS p_cov,
         |  round(si, 4) AS sum_innov2
         |FROM last WHERE rn = 1 ORDER BY series""".stripMargin,
    "holtwinters" ->
      s"""WITH s AS ($dailySql),
         |t AS (SELECT series, x, (row_number() OVER (PARTITION BY series ORDER BY day) - 1)::BIGINT AS t FROM s),
         |sm AS (SELECT series, t,
         |    sum((CASE WHEN t = 0 THEN x ELSE 0.3*x END) * power(0.7, -CAST(t AS DOUBLE)))
         |      OVER (PARTITION BY series ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      * power(0.7, CAST(t AS DOUBLE)) AS smoothed
         |  FROM t),
         |last AS (SELECT series, t, smoothed, row_number() OVER (PARTITION BY series ORDER BY t DESC) AS rn FROM sm)
         |SELECT series, t AS t_last, round(smoothed, 4) AS s_last FROM last WHERE rn = 1 ORDER BY series""".stripMargin,
    "arima" ->
      s"""WITH s AS ($dailySql),
         |l AS (SELECT series, x,
         |    lag(x, 1) OVER (PARTITION BY series ORDER BY day) AS l1,
         |    lag(x, 2) OVER (PARTITION BY series ORDER BY day) AS l2
         |  FROM s),
         |f AS (SELECT * FROM l WHERE l1 IS NOT NULL AND l2 IS NOT NULL),
         |m AS (SELECT series, count(*)::DOUBLE n, sum(l1) sx1, sum(l2) sx2,
         |    sum(l1*l1) s11, sum(l1*l2) s12, sum(l2*l2) s22,
         |    sum(x) sy, sum(l1*x) s1y, sum(l2*x) s2y
         |  FROM f GROUP BY series),
         |d AS (SELECT series,
         |  n*(s11*s22-s12*s12) - sx1*(sx1*s22-s12*sx2) + sx2*(sx1*s12-s11*sx2) AS det,
         |  sy*(s11*s22-s12*s12) - sx1*(s1y*s22-s12*s2y) + sx2*(s1y*s12-s11*s2y) AS det0,
         |  n*(s1y*s22-s12*s2y) - sy*(sx1*s22-s12*sx2) + sx2*(sx1*s2y-s1y*sx2) AS det1,
         |  n*(s11*s2y-s1y*s12) - sx1*(sx1*s2y-s1y*sx2) + sy*(sx1*s12-s11*sx2) AS det2
         |  FROM m)
         |SELECT series, term, coef FROM (
         |  SELECT series, 'intercept' AS term, round(det0/det, 4) AS coef FROM d
         |  UNION ALL SELECT series, 'ar1', round(det1/det, 4) FROM d
         |  UNION ALL SELECT series, 'ar2', round(det2/det, 4) FROM d
         |) ORDER BY series, term""".stripMargin,
    "stationarity" ->
      s"""WITH s AS ($dailySql),
         |t AS (SELECT series, x, row_number() OVER (PARTITION BY series ORDER BY day) AS rn FROM s),
         |d AS (SELECT series, x, x - lag(x) OVER (PARTITION BY series ORDER BY rn) AS dx FROM t)
         |SELECT series, round(var_samp(dx) / var_samp(x), 6) AS var_ratio,
         |  (CASE WHEN var_samp(dx) < var_samp(x) THEN 1 ELSE 0 END)::BIGINT AS d
         |FROM d GROUP BY series ORDER BY series""".stripMargin
  )
}
