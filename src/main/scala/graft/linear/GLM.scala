package graft.linear

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson GLM (log link, intercept + one feature) by IRLS with a FIXED
  * round count — the fixed-round discipline (gmm_em / pagerank) that lets
  * a SQL oracle replay the fit as chained CTEs. Each round is ONE
  * map-side-combined aggregate of the five weighted sums (Σw, Σwx, Σwx²,
  * Σwz, Σwxz with w = μ, z = η + (y−μ)/μ); the normal-equation solve is a
  * closed-form 2×2 Cramer on the driver (p-sized state, never data).
  * Deterministic init: β₀ = ln(ȳ), β₁ = 0 — one moment pass.
  */
object GLM {

  final case class PoissonFit(n: Double, b0: Double, b1: Double, deviance: Double)

  def poissonIrls(df: DataFrame, y: Column, x: Column, rounds: Int = 8): PoissonFit = {
    val base = df.select(y.cast("double").as("y"), x.cast("double").as("x"))
    val st = base.agg(count(lit(1)).cast("double").as("n"), avg(col("y")).as("m")).head()
    val n = st.getDouble(0)
    var b0 = math.log(st.getDouble(1))
    var b1 = 0.0
    (0 until rounds).foreach { _ =>
      val eta = lit(b0) + lit(b1) * col("x")
      val mu = exp(eta)
      val z = eta + (col("y") - mu) / mu
      val r = base.agg(sum(mu).as("sw"), sum(mu * col("x")).as("swx"),
        sum(mu * col("x") * col("x")).as("swxx"),
        sum(mu * z).as("swz"), sum(mu * col("x") * z).as("swxz")).head()
      val (sw, swx, swxx, swz, swxz) =
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val det = sw * swxx - swx * swx
      b0 = (swz * swxx - swx * swxz) / det
      b1 = (sw * swxz - swx * swz) / det
    }
    val mu = exp(lit(b0) + lit(b1) * col("x"))
    val dev = base.agg(sum(
      lit(2.0) * (when(col("y") > 0, col("y") * log(col("y") / mu)).otherwise(0.0) -
        (col("y") - mu)))).head().getDouble(0)
    PoissonFit(n, b0, b1, dev)
  }

  /** One-row result frame with the oracle's rounding. */
  def poissonFrame(df: DataFrame, y: Column, x: Column, rounds: Int = 8): DataFrame = {
    val f = poissonIrls(df, y, x, rounds)
    df.sparkSession.range(1).select(lit(f.n).cast("long").as("n"),
      round(lit(f.b0), 6).as("b0"), round(lit(f.b1), 6).as("b1"),
      round(lit(f.deviance), 4).as("deviance"))
  }
}
