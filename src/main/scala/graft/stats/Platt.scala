package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Platt scaling (Platt 1999) — the sigmoid calibration FIT that pairs
  * with the served calibration metrics (calibration_curve / ece / brier):
  * fit P(y=1 | f) = 1 / (1 + exp(a·f + b)) by Newton on the smoothed-NLL
  * objective, with Platt's Bayes-smoothed targets t⁺ = (N⁺+1)/(N⁺+2),
  * t⁻ = 1/(N⁻+2) and init a = 0, b = ln((N⁻+1)/(N⁺+1)).
  *
  * Scale shape: each Newton iteration is ONE map-side-combined aggregate
  * over the corpus (six O(1) moments — gradient, 2×2 Hessian, loss) with
  * the current (a, b) folded in as literals; the 2×2 solve is driver
  * arithmetic. T iterations = T scans, nothing materialized.
  *
  * Cross-engine determinism (the full-hash-gate discipline): every
  * moment is an AVERAGE (O(1) magnitude — double reassociation error
  * ~1e-13, invisible on the 1e-6 grid) ROUNDED to 6 decimals before the
  * driver update, and (a, b) round to 6 decimals before they recur, so
  * the whole fit replays as chained MATERIALIZED CTEs computing the
  * identical rounded-moment recursion. p is clamped at 1e-300 in both
  * engines so the loss term never takes ln(0). */
object Platt {
  final case class Step(iter: Int, a: Double, b: Double, nll: Double)

  private def r6d(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One row per Newton iteration: (iter, a, b, avg_nll) — a/b are the
    * POST-update parameters on the 1e-6 grid; avg_nll is the smoothed
    * objective at the PRE-update parameters (what the step minimized). */
  def fit(df: DataFrame, margin: Column, isPos: Column, iters: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(margin.cast("double").as("_f"),
      when(isPos, 1.0).otherwise(0.0).as("_y"))
    val cnt = base.agg(sum(col("_y")).as("np"),
      sum(lit(1.0) - col("_y")).as("nn")).head()
    val np = cnt.getDouble(0); val nn = cnt.getDouble(1)
    val tPos = (np + 1.0) / (np + 2.0)
    val tNeg = 1.0 / (nn + 2.0)
    var a = 0.0
    var b = r6d(math.log((nn + 1.0) / (np + 1.0)))
    val steps = (1 to iters).map { it =>
      val t = when(col("_y") === 1.0, lit(tPos)).otherwise(lit(tNeg))
      val p = lit(1.0) / (lit(1.0) + exp(lit(a) * col("_f") + lit(b)))
      val w = p * (lit(1.0) - p)
      val nllTerm = -(t * log(greatest(p, lit(1e-300))) +
        (lit(1.0) - t) * log(greatest(lit(1.0) - p, lit(1e-300))))
      val r = base.agg(
        round(avg((t - p) * col("_f")), 6).as("g1"),
        round(avg(t - p), 6).as("g0"),
        round(avg(w * col("_f") * col("_f")), 6).as("h11"),
        round(avg(w * col("_f")), 6).as("h10"),
        round(avg(w), 6).as("h00"),
        round(avg(nllTerm), 6).as("nll")).head()
      val (g1, g0) = (r.getDouble(0), r.getDouble(1))
      val (h11, h10, h00) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val det = h11 * h00 - h10 * h10
      a = r6d(a - (g1 * h00 - g0 * h10) / det)
      b = r6d(b - (h11 * g0 - h10 * g1) / det)
      Step(it, a, b, r.getDouble(5))
    }
    steps.toDF("iter", "a", "b", "avg_nll")
      .select(col("iter").cast("long").as("iter"), col("a"), col("b"), col("avg_nll"))
  }
}
