package graft.linear

import breeze.linalg.DenseVector
import breeze.optimize.{DiffFunction, LBFGS}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative solvers (cuML's SGD / MBSGD* / QN surface —
  * reference python/cuml/solvers/sgd.pyx, qn.pyx;
  * reference cpp/src/solver/sgd.h, qn/qn.h).
  *
  * Spark-first shape: standardization stats come from ONE codegen'd
  * Catalyst aggregate; the iterations then run `treeAggregate` (depth 2)
  * over a cached primitive `RDD[Array[Double]]` — MLlib's own
  * GradientDescent/LBFGS dataflow. The inner loop deliberately does NOT
  * re-issue a Catalyst aggregate per iteration: the weight vector changes
  * every step, so each pass would re-analyze the plan and recompile its
  * whole-stage codegen (~100–200 ms of driver work per iteration that
  * dwarfs the scan at local scale and serializes the driver at cluster
  * scale). Per-pass cost is a cache scan + map-side partial aggregation —
  * identical shuffle shape to the Catalyst version, minus the replanning.
  */
object GradientSolver extends Serializable {
  sealed trait Loss
  case object SquaredLoss extends Loss    // y ∈ ℝ
  case object LogisticLoss extends Loss   // y ∈ {0,1}
  case object HingeLoss extends Loss      // y ∈ {0,1} (mapped to ±1)

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

  /** Materialize the (standardized) projection as a cached primitive RDD of
    * [f0..fp-1, y] rows — the iteration substrate shared by fit/fitQN. */
  private def cachedRows(df: DataFrame, fx: Seq[Column], y: Column): RDD[Array[Double]] = {
    val p = fx.size
    val proj = df.select((fx :+ y.as("_y")).zipWithIndex.map {
      case (c, i) => if (i < p) c.as(s"_f$i") else c
    }: _*)
    proj.rdd.map { r =>
      val a = new Array[Double](p + 1)
      var i = 0
      while (i <= p) { a(i) = r.getDouble(i); i += 1 }
      a
    }.persist(StorageLevel.MEMORY_AND_DISK)
  }

  private def marginAt(w: Array[Double], row: Array[Double], p: Int): Double = {
    var m = w(0)
    var i = 0
    while (i < p) { m += row(i) * w(i + 1); i += 1 }
    m
  }

  /** One L-BFGS objective evaluation: acc = [Σloss, Σg, Σg·x0..Σg·xp-1].
    * A standalone method so the treeAggregate closures capture only (wB,
    * lossB, p) — defined inside the breeze DiffFunction they would capture
    * the (non-serializable) anonymous class itself. */
  private def qnPass(data: RDD[Array[Double]], wB: Array[Double], lossB: Loss,
                     p: Int): Array[Double] =
    data.treeAggregate(new Array[Double](p + 2))(
      seqOp = (a, row) => {
        val m = marginAt(wB, row, p)
        val yv = row(p)
        val ypm = yv * 2.0 - 1.0
        val z = ypm * m
        val (lv, g) = lossB match {
          case HingeLoss =>
            // squared hinge: max(0, 1−z)²; d/dm = −2·y±·max(0, 1−z)
            val hz = math.max(0.0, 1.0 - z)
            (hz * hz, -2.0 * ypm * hz)
          case _ =>
            // log(1+exp(-z)) computed stably: max(0,-z) + log1p(exp(-|z|))
            (math.max(0.0, -z) + math.log1p(math.exp(-math.abs(z))),
              1.0 / (1.0 + math.exp(-m)) - yv)
        }
        a(0) += lv
        a(1) += g
        var i = 0
        while (i < p) { a(i + 2) += g * row(i); i += 1 }
        a
      },
      combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
      depth = 2)

  def fit(df: DataFrame, features: Seq[String], label: String, loss: Loss,
          lr: Double = 0.05, iters: Int = 40, batchFraction: Double = 1.0,
          l2: Double = 0.0, seed: Long = 42L, standardize: Boolean = true): LinearModel =
    // deterministic (seeded batches, fixed iteration count) → fit-once
    graft.core.FitCache.getOrFit(graft.core.FitCache.key(df, "gs_fit",
      features.mkString(","), label, loss, lr, iters, batchFraction, l2, seed, standardize)) {
      fitUncached(df, features, label, loss, lr, iters, batchFraction, l2, seed, standardize)
    }

  private def fitUncached(df: DataFrame, features: Seq[String], label: String, loss: Loss,
                          lr: Double, iters: Int, batchFraction: Double,
                          l2: Double, seed: Long, standardize: Boolean): LinearModel = {
    val fx0 = features.map(c => col(c).cast("double"))
    val y = col(label).cast("double")
    // standardize features once (stats from one pass) for a sane fixed lr
    val (fx, shift, sc) =
      if (!standardize) (fx0, Array.fill(features.size)(0.0), Array.fill(features.size)(1.0))
      else {
        val (mu, sd) = featureStats(df, fx0)
        (fx0.zipWithIndex.map { case (c, i) => (c - mu(i)) / sd(i) }, mu, sd)
      }
    val p = features.size
    val data = cachedRows(df, fx, y)
    try {
      val w = Array.fill(p + 1)(0.0)
      var it = 0
      while (it < iters) {
        val batch = if (batchFraction >= 1.0) data
          else data.sample(withReplacement = false, batchFraction, seed + it)
        val wB = w.clone()
        val lossB = loss
        // acc = [Σg, Σg·x0..Σg·xp-1, n]
        val acc = batch.treeAggregate(new Array[Double](p + 2))(
          seqOp = (a, row) => {
            val m = marginAt(wB, row, p)
            val yv = row(p)
            val g = lossB match {
              case SquaredLoss  => m - yv
              case LogisticLoss => 1.0 / (1.0 + math.exp(-m)) - yv
              case HingeLoss =>
                val ypm = yv * 2.0 - 1.0
                if (ypm * m < 1.0) -ypm else 0.0
            }
            a(0) += g
            var i = 0
            while (i < p) { a(i + 1) += g * row(i); i += 1 }
            a(p + 1) += 1.0
            a
          },
          combOp = (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a },
          depth = 2)
        val n = math.max(acc(p + 1), 1.0)
        var i = 0
        while (i <= p) {
          val reg = if (i == 0) 0.0 else l2 * w(i)
          w(i) -= lr * (acc(i) / n + reg)
          i += 1
        }
        it += 1
      }
      // un-standardize: w·(x-μ)/σ + b  →  coefs on original scale
      val coefs = Array.tabulate(p)(i => w(i + 1) / sc(i))
      val b0 = w(0) - (0 until p).map(i => coefs(i) * shift(i)).sum
      LinearModel("intercept" +: features, b0 +: coefs.toSeq)
    } finally data.unpersist(blocking = false)
  }

  /** Quasi-Newton fit — cuML's QN solver surface, including its OWL-QN
    * dispatch (solvers/qn.pyx:179: "if non-zero l1, will run OWL-QN, else
    * L-BFGS"; Andrew & Gao ICML'07). One aggregate pass per objective
    * evaluation; breeze drives the search. LogisticLoss gives cuML's QN
    * logistic regression; HingeLoss gives the squared-hinge linear SVC
    * (smooth, so L-BFGS converges — the same loss cuML's LinearSVC/QN
    * path optimizes). `l1 > 0` switches to OWL-QN with the intercept
    * unpenalized; the L1 prox runs on the STANDARDIZED coefficients (the
    * scale on which the penalty is comparable across features). */
  def fitQN(df: DataFrame, features: Seq[String], label: String,
            l2: Double = 0.0, maxIter: Int = 50,
            loss: Loss = LogisticLoss, tol: Double = 1e-9,
            l1: Double = 0.0): LinearModel =
    // deterministic (fixed start, deterministic line search) → fit-once
    graft.core.FitCache.getOrFit(graft.core.FitCache.key(df, "qn_fit",
      features.mkString(","), label, l2, maxIter, loss, tol, l1)) {
      fitQNUncached(df, features, label, l2, maxIter, loss, tol, l1)
    }

  private def fitQNUncached(df: DataFrame, features: Seq[String], label: String,
                            l2: Double, maxIter: Int, loss: Loss, tol: Double,
                            l1: Double): LinearModel = {
    val p = features.size
    val fx0 = features.map(c => col(c).cast("double"))
    // standardize: mixed feature scales stall the line search otherwise
    val (mu, sd) = featureStats(df, fx0)
    val fx = fx0.zipWithIndex.map { case (c, i) => (c - mu(i)) / sd(i) }
    val data = cachedRows(df, fx, col(label).cast("double"))
    try {
      val n = data.count().toDouble
      val f = new DiffFunction[DenseVector[Double]] {
        def calculate(w: DenseVector[Double]): (Double, DenseVector[Double]) = {
          val acc = qnPass(data, w.toArray, loss, p)
          val lossV = acc(0) / n +
            0.5 * l2 * (1 until p + 1).map(i => w(i) * w(i)).sum
          val grad = DenseVector.tabulate(p + 1) { i =>
            acc(i + 1) / n + (if (i == 0) 0.0 else l2 * w(i))
          }
          (lossV, grad)
        }
      }
      val w =
        if (l1 > 0.0)
          new breeze.optimize.OWLQN[Int, DenseVector[Double]](maxIter, 7,
              (i: Int) => if (i == 0) 0.0 else l1, tol)
            .minimize(f, DenseVector.zeros[Double](p + 1))
        else
          new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7, tolerance = tol)
            .minimize(f, DenseVector.zeros[Double](p + 1))
      // un-standardize back to the original feature scale
      val coefs = Array.tabulate(p)(i => w(i + 1) / sd(i))
      val b0 = w(0) - (0 until p).map(i => coefs(i) * mu(i)).sum
      LinearModel("intercept" +: features, b0 +: coefs.toSeq)
    } finally data.unpersist(blocking = false)
  }
}
