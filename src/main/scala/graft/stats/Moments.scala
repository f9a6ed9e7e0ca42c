package graft.stats

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass sufficient statistics for the linear-model / decomposition
  * family: n, Σx_i, Σx_i x_j, Σx_i y, Σy, Σy².
  *
  * Computed as a single codegen'd aggregate over the scan — the Spark-first
  * replacement for the reference's GPU normal-equation kernels
  * (reference cpp/src/glm/ols.h: svd/eig/qr solve of X'X). p is the feature
  * count (small); the p×p Gram collapses to one driver-side row regardless
  * of n, so the same single pass works at 100 TB: it is a map-side-combined
  * partial aggregation with no shuffle beyond the final reduce.
  */
final case class GramStats(
    n: Long,
    xSum: DenseVector[Double],    // Σ x_i              (p)
    xx: DenseMatrix[Double],      // Σ x_i x_j          (p×p)
    xy: DenseVector[Double],      // Σ x_i y            (p)
    ySum: Double,                 // Σ y
    yy: Double                    // Σ y²
) {
  def p: Int = xSum.length

  /** Gram of the design matrix with an intercept column prepended:
    * [[n, Σx'], [Σx, Σxx']]  — (p+1)×(p+1). */
  def designGram: DenseMatrix[Double] = {
    val g = DenseMatrix.zeros[Double](p + 1, p + 1)
    g(0, 0) = n.toDouble
    for (i <- 0 until p) { g(0, i + 1) = xSum(i); g(i + 1, 0) = xSum(i) }
    for (i <- 0 until p; j <- 0 until p) g(i + 1, j + 1) = xx(i, j)
    g
  }

  /** [Σy, Σxy] — response side of the design normal equations. */
  def designXty: DenseVector[Double] =
    DenseVector.vertcat(DenseVector(ySum), xy)

  /** Sample covariance matrix of the features. */
  def covariance: DenseMatrix[Double] = {
    val c = DenseMatrix.zeros[Double](p, p)
    for (i <- 0 until p; j <- 0 until p)
      c(i, j) = (xx(i, j) - xSum(i) * xSum(j) / n) / (n - 1)
    c
  }
}

object Moments {
  /** Collect GramStats in ONE aggregate pass. `label` optional (PCA needs
    * none). All products are built as native column expressions (sum(x*y))
    * so the whole pass stays in whole-stage codegen. */
  def gram(df: DataFrame, features: Seq[String], label: Option[String]): GramStats = {
    val p = features.size
    val fx = features.map(f => col(f).cast("double"))
    val aggs = Seq(count(lit(1)).cast("long").as("_n")) ++
      fx.zipWithIndex.map { case (c, i) => sum(c).as(s"_s$i") } ++
      (for (i <- 0 until p; j <- i until p)
        yield sum(fx(i) * fx(j)).as(s"_p${i}_$j")) ++
      label.toSeq.flatMap { l =>
        val y = col(l).cast("double")
        fx.zipWithIndex.map { case (c, i) => sum(c * y).as(s"_xy$i") } ++
          Seq(sum(y).as("_y"), sum(y * y).as("_yy"))
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    var k = 0
    def next(): Double = { val v = row.getDouble(k); k += 1; v }
    val n = { val v = row.getLong(0); k = 1; v }
    val xSum = DenseVector.fill(p)(next())
    val xx = DenseMatrix.zeros[Double](p, p)
    for (i <- 0 until p; j <- i until p) { val v = next(); xx(i, j) = v; xx(j, i) = v }
    val (xy, ySum, yy) = label match {
      case Some(_) => (DenseVector.fill(p)(next()), next(), next())
      case None    => (DenseVector.zeros[Double](p), 0.0, 0.0)
    }
    GramStats(n, xSum, xx, xy, ySum, yy)
  }
}
