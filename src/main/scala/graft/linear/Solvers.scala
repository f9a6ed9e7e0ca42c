package graft.linear

import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative solvers (cuML's SGD / MBSGD* / QN surface —
  * reference python/cuml/solvers/sgd.pyx, qn.pyx;
  * reference cpp/src/solver/sgd.h, qn/qn.h).
  *
  * Spark-first shape: each iteration evaluates the full gradient as ONE
  * codegen'd aggregate over a cached narrow projection (optionally a seeded
  * sample for minibatching); the driver takes the O(p) step. This is the
  * same dataflow as MLlib's GradientDescent/LBFGS (treeAggregate of
  * per-row gradients) but expressed through Catalyst columns, so the
  * per-row math is whole-stage codegen'd — no closures to ship, and at
  * 100 TB each pass is a scan + map-side partial aggregation.
  */
object GradientSolver {
  sealed trait Loss
  case object SquaredLoss extends Loss    // y ∈ ℝ
  case object LogisticLoss extends Loss   // y ∈ {0,1}
  case object HingeLoss extends Loss      // y ∈ {0,1} (mapped to ±1)

  private def margin(w: Array[Double], fx: Seq[Column]): Column =
    fx.zipWithIndex.foldLeft(lit(w(0))) { case (acc, (c, i)) => acc + c * w(i + 1) }

  /** Per-row gradient factor g such that ∇ = Σ g·[1, x]. */
  private def gradFactor(loss: Loss, m: Column, y: Column): Column = loss match {
    case SquaredLoss  => m - y
    case LogisticLoss => lit(1.0) / (lit(1.0) + exp(-m)) - y
    case HingeLoss =>
      val ypm = y * 2.0 - 1.0
      when(ypm * m < 1.0, -ypm).otherwise(lit(0.0))
  }

  /** One-pass feature stats. Null stats (empty input) fall back to (0,1);
    * NaN or ~0 stddev (single row / constant column) falls back to scale 1
    * so a degenerate column can't poison every standardized feature. */
  private def featureStats(df: DataFrame, fx0: Seq[Column]): (Array[Double], Array[Double]) = {
    val p = fx0.size
    val aggs = fx0.flatMap(c => Seq(avg(c), stddev_samp(c)))
    val st = df.agg(aggs.head, aggs.tail: _*).head()
    val mu = Array.tabulate(p)(i => if (st.isNullAt(2 * i)) 0.0 else st.getDouble(2 * i))
    val sd = Array.tabulate(p) { i =>
      if (st.isNullAt(2 * i + 1)) 1.0
      else {
        val s = st.getDouble(2 * i + 1)
        if (s.isNaN || s < 1e-12) 1.0 else s
      }
    }
    (mu, sd)
  }

  def fit(df: DataFrame, features: Seq[String], label: String, loss: Loss,
          lr: Double = 0.05, iters: Int = 40, batchFraction: Double = 1.0,
          l2: Double = 0.0, seed: Long = 42L, standardize: Boolean = true): LinearModel = {
    val fx0 = features.map(c => col(c).cast("double"))
    val y = col(label).cast("double")
    // standardize features once (stats from one pass) for a sane fixed lr
    val (fx, shift, sc) =
      if (!standardize) (fx0, Array.fill(features.size)(0.0), Array.fill(features.size)(1.0))
      else {
        val (mu, sd) = featureStats(df, fx0)
        (fx0.zipWithIndex.map { case (c, i) => (c - mu(i)) / sd(i) }, mu, sd)
      }
    val proj = df.select((fx :+ y.as("_y")).zipWithIndex.map {
      case (c, i) => if (i < features.size) c.as(s"_f$i") else c
    }: _*).cache()
    try {
      val p = features.size
      val w = Array.fill(p + 1)(0.0)
      var it = 0
      while (it < iters) {
        val batch = if (batchFraction >= 1.0) proj else proj.sample(batchFraction, seed + it)
        val fcols = (0 until p).map(i => col(s"_f$i"))
        val g = gradFactor(loss, margin(w, fcols), col("_y"))
        val aggs = (sum(g) +: fcols.map(c => sum(g * c))) :+ count(lit(1)).cast("double")
        val row = batch.agg(aggs.head, aggs.tail: _*).head()
        val n = math.max(row.getDouble(p + 1), 1.0)
        var i = 0
        while (i <= p) {
          val reg = if (i == 0) 0.0 else l2 * w(i)
          w(i) -= lr * (row.getDouble(i) / n + reg)
          i += 1
        }
        it += 1
      }
      // un-standardize: w·(x-μ)/σ + b  →  coefs on original scale
      val coefs = Array.tabulate(p)(i => w(i + 1) / sc(i))
      val b0 = w(0) - (0 until p).map(i => coefs(i) * shift(i)).sum
      LinearModel("intercept" +: features, b0 +: coefs.toSeq)
    } finally proj.unpersist()
  }

  /** Quasi-Newton (L-BFGS) fit — cuML's QN solver surface. One aggregate
    * pass per objective evaluation; breeze drives the search. LogisticLoss
    * gives cuML's QN logistic regression; HingeLoss gives the squared-hinge
    * linear SVC (smooth, so L-BFGS converges — the same loss cuML's
    * LinearSVC/QN path optimizes). */
  def fitQN(df: DataFrame, features: Seq[String], label: String,
            l2: Double = 0.0, maxIter: Int = 50,
            loss: Loss = LogisticLoss, tol: Double = 1e-9): LinearModel = {
    val p = features.size
    val fx0 = features.map(c => col(c).cast("double"))
    // standardize: mixed feature scales stall the line search otherwise
    val (mu, sd) = featureStats(df, fx0)
    val fx = fx0.zipWithIndex.map { case (c, i) => (c - mu(i)) / sd(i) }
    val proj = df.select((fx :+ col(label).cast("double").as("_y")).zipWithIndex.map {
      case (c, i) => if (i < p) c.as(s"_f$i") else c
    }: _*).cache()
    try {
      val n = proj.count().toDouble
      val f = new DiffFunction[DenseVector[Double]] {
        def calculate(w: DenseVector[Double]): (Double, DenseVector[Double]) = {
          val fcols = (0 until p).map(i => col(s"_f$i"))
          val m = margin(w.toArray, fcols)
          val yc = col("_y")
          val ypm = yc * 2.0 - 1.0
          val z = ypm * m
          val (lossE, g) = loss match {
            case HingeLoss =>
              // squared hinge: max(0, 1−z)²; d/dm = −2·y±·max(0, 1−z)
              val hz = greatest(lit(0.0), lit(1.0) - z)
              (hz * hz, lit(-2.0) * ypm * hz)
            case _ =>
              // log(1+exp(-z)) computed stably: max(0,-z) + log1p(exp(-|z|))
              (greatest(lit(0.0), -z) + log1p(exp(-abs(z))),
                lit(1.0) / (lit(1.0) + exp(-m)) - yc)
          }
          val aggs = sum(lossE) +: (sum(g) +: fcols.map(c => sum(g * c)))
          val row = proj.agg(aggs.head, aggs.tail: _*).head()
          val lossV = row.getDouble(0) / n +
            0.5 * l2 * (1 until p + 1).map(i => w(i) * w(i)).sum
          val grad = DenseVector.tabulate(p + 1) { i =>
            row.getDouble(i + 1) / n + (if (i == 0) 0.0 else l2 * w(i))
          }
          (lossV, grad)
        }
      }
      val opt = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7, tolerance = tol)
      val w = opt.minimize(f, DenseVector.zeros[Double](p + 1))
      // un-standardize back to the original feature scale
      val coefs = Array.tabulate(p)(i => w(i + 1) / sd(i))
      val b0 = w(0) - (0 until p).map(i => coefs(i) * mu(i)).sum
      LinearModel("intercept" +: features, b0 +: coefs.toSeq)
    } finally proj.unpersist()
  }
}
