package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-component 1-D Gaussian mixture by EM with a FIXED round count —
  * the fixed-round discipline (kmeans_assign / pagerank / CC) that lets a
  * SQL oracle replay the whole fit as chained CTEs: deterministic
  * moment-based init (μ = m ∓ s, σ = s, π = ½), then `rounds` E+M steps,
  * each ONE map-side-combined aggregate over the data (Σw, Σwy, Σwy² —
  * component 2's sums derive from the static Σy, Σy² by subtraction, so
  * the per-round pass computes THREE weighted sums, not six).
  *
  * The driver holds only the 5 mixture parameters between rounds (the
  * lasso_cd/sgd pattern: sufficient statistics distributed, the p-sized
  * state local); data is never collected. At any corpus size the fit is
  * `rounds` scans, the EM cost floor.
  *
  * The scalar normal density drops the 1/√(2π) constant (it cancels in
  * the responsibilities); the log-likelihood restores it at the end.
  */
object GMM {

  final case class Fit(n: Double, pi1: Double, mu1: Double, s1: Double,
                       mu2: Double, s2: Double, ll: Double)

  def fit1d(df: DataFrame, y: Column, rounds: Int = 10): Fit = {
    val base = df.select(y.cast("double").as("y"))
    val st = base.agg(count(lit(1)).cast("double").as("n"), avg(col("y")).as("m"),
      stddev_samp(col("y")).as("sd"), sum(col("y")).as("sy"),
      sum(col("y") * col("y")).as("syy")).head()
    val (n, m, sd) = (st.getDouble(0), st.getDouble(1), st.getDouble(2))
    val (sy, syy) = (st.getDouble(3), st.getDouble(4))
    var (pi1, mu1, mu2) = (0.5, m - sd, m + sd)
    var (s1, s2) = (sd, sd)
    var ll = 0.0
    (0 until rounds).foreach { _ =>
      val f1 = lit(pi1) * exp(-(col("y") - mu1) * (col("y") - mu1) /
        lit(2.0 * s1 * s1)) / lit(s1)
      val f2 = lit(1.0 - pi1) * exp(-(col("y") - mu2) * (col("y") - mu2) /
        lit(2.0 * s2 * s2)) / lit(s2)
      val w = f1 / (f1 + f2)
      val r = base.agg(sum(w).as("sw"), sum(w * col("y")).as("swy"),
        sum(w * col("y") * col("y")).as("swyy"),
        sum(log(f1 + f2)).as("sll")).head()
      val (sw, swy, swyy, sll) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      pi1 = sw / n
      mu1 = swy / sw
      s1 = math.sqrt(swyy / sw - (swy / sw) * (swy / sw))
      mu2 = (sy - swy) / (n - sw)
      s2 = math.sqrt((syy - swyy) / (n - sw) - ((sy - swy) / (n - sw)) * ((sy - swy) / (n - sw)))
      ll = sll / n - math.log(math.sqrt(2.0 * math.Pi))
    }
    Fit(n, pi1, mu1, s1, mu2, s2, ll)
  }

  /** Hard assignment under a fitted mixture: component = argmax
    * responsibility, decided on the ROUNDED posterior (oracle-replayable);
    * per-component occupancy summary. Scoring is a pure codegen scan
    * against the 5 literal parameters — zero shuffle before the 2-key
    * aggregate. */
  def assign1d(df: DataFrame, y: Column, f: Fit): DataFrame = {
    val base = df.select(y.cast("double").as("y"))
    val f1 = lit(f.pi1) * exp(-(col("y") - f.mu1) * (col("y") - f.mu1) /
      lit(2.0 * f.s1 * f.s1)) / lit(f.s1)
    val f2 = lit(1.0 - f.pi1) * exp(-(col("y") - f.mu2) * (col("y") - f.mu2) /
      lit(2.0 * f.s2 * f.s2)) / lit(f.s2)
    val comp = when(round(f1 / (f1 + f2), 6) >= 0.5, 0L).otherwise(1L)
    base.select(comp.as("component"), col("y"))
      .groupBy("component")
      .agg(count(lit(1)).cast("long").as("n"), round(avg(col("y")), 4).as("mean_y"))
      .orderBy("component")
  }

  /** One-row result frame with the oracle's rounding. */
  def fit1dFrame(df: DataFrame, y: Column, rounds: Int = 10): DataFrame = {
    val f = fit1d(df, y, rounds)
    df.sparkSession.range(1).select(
      lit(f.n).cast("long").as("n"),
      round(lit(f.pi1), 6).as("pi1"),
      round(lit(f.mu1), 4).as("mu1"), round(lit(f.s1), 4).as("sigma1"),
      round(lit(f.mu2), 4).as("mu2"), round(lit(f.s2), 4).as("sigma2"),
      round(lit(f.ll), 4).as("avg_loglik"))
  }
}
