package graft.preprocessing

import graft.core.Num
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic dataset generators (reference python/cuml/datasets/blobs.pyx,
  * regression.pyx). Engine-neutral determinism: uniforms come from
  * md5(tag||row||dim) and gaussians from Box–Muller on those uniforms, so
  * DuckDB reproduces every row bit-for-bit (libm ulp differences wash out
  * in the aggregate outputs). Generation is a pure map over spark.range —
  * embarrassingly parallel at any n. */
object Datasets {
  private def u(tag: String, idc: Column, suffix: String): Column =
    (Num.md5Long(concat(lit(tag), idc.cast("string"), lit(suffix))) % 1000000L)
      .cast("double") / 1000000.0 + 5e-7

  /** Standard normal from two md5 uniforms. */
  def gaussian(tag: String, idc: Column, dim: String): Column =
    sqrt(lit(-2.0) * log(u(tag, idc, s"_${dim}_a"))) *
      cos(lit(2.0 * math.Pi) * u(tag, idc, s"_${dim}_b"))

  /** make_blobs: k literal centers, isotropic sigma. */
  def makeBlobs(spark: SparkSession, n: Long, centers: Seq[(Double, Double)],
                sigma: Double): DataFrame = {
    val base = spark.range(n).select(col("id"))
    val k = centers.size
    val cl = (col("id") % k).cast("int").as("cluster")
    val cx = centers.zipWithIndex.foldRight(lit(0.0)) { case (((x, _), i), acc) =>
      when(col("id") % k === i, lit(x)).otherwise(acc)
    }
    val cy = centers.zipWithIndex.foldRight(lit(0.0)) { case (((_, y), i), acc) =>
      when(col("id") % k === i, lit(y)).otherwise(acc)
    }
    base.select(col("id"), cl,
      (cx + gaussian("blob_", col("id"), "x") * sigma).as("x"),
      (cy + gaussian("blob_", col("id"), "y") * sigma).as("y"))
  }

  /** make_regression: y = Xw + b + noise·sigma with hash-uniform X. */
  def makeRegression(spark: SparkSession, n: Long, w: Seq[Double], b: Double,
                     sigma: Double): DataFrame = {
    val base = spark.range(n).select(col("id"))
    val xs = w.indices.map(i => u("reg_", col("id"), s"x$i").as(s"x$i"))
    val withX = base.select((col("id") +: xs): _*)
    val yExpr = w.zipWithIndex.map { case (wi, i) => col(s"x$i") * wi }
      .reduce(_ + _) + b + gaussian("reg_", col("id"), "e") * sigma
    withX.withColumn("y", yExpr)
  }
}
