package graft.svm

import graft.core.Num.r4
import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SVC (reference python/cuml/svm/svm.pyx — SMO-based SVC). The
  * distributed counterpart of the linear kernel is MLlib's LinearSVC
  * (hinge loss via OWL-QN over treeAggregated gradients); kernel SVMs do
  * not distribute over 100 TB and are out of scope by design, as in every
  * large-scale Spark deployment. */
object SVMGraft {
  def linearSvcSummary(df: DataFrame, features: Seq[String], binaryLabel: org.apache.spark.sql.Column,
                       regParam: Double = 0.01, maxIter: Int = 50): DataFrame = {
    val p = features.size
    // z-score the features up front (one aggregate pass, same pattern as
    // GradientSolver.fitQN): mixed raw scales (l_quantity ~25 vs l_tax
    // ~0.04) stall OWL-QN's line search into many sub-iteration passes.
    val fx0 = features.map(c => col(c).cast("double"))
    val st = df.agg(
      fx0.flatMap(c => Seq(avg(c), stddev_samp(c))).head,
      fx0.flatMap(c => Seq(avg(c), stddev_samp(c))).tail: _*).head()
    val mu = Array.tabulate(p)(i => st.getDouble(2 * i))
    val sd = Array.tabulate(p)(i => math.max(st.getDouble(2 * i + 1), 1e-12))
    val base = df.select((features.zipWithIndex.map { case (f, i) =>
      ((col(f).cast("double") - mu(i)) / sd(i)).as(f)
    } :+ binaryLabel.cast("double").as("_lab")): _*)
    val input = new VectorAssembler().setInputCols(features.toArray).setOutputCol("_fv")
      .transform(base).select(col("_fv"), col("_lab")).cache()
    input.count() // materialize before the iterative fit
    val model = new LinearSVC().setFeaturesCol("_fv").setLabelCol("_lab")
      .setRegParam(regParam).setMaxIter(maxIter).setTol(1e-6).fit(input)
    val scored = model.transform(input)
    val spark = df.sparkSession
    import spark.implicits._
    // un-standardize back to the original feature scale
    val coefsOrig = Array.tabulate(p)(i => model.coefficients(i) / sd(i))
    val b0 = model.intercept - (0 until p).map(i => coefsOrig(i) * mu(i)).sum
    val coefRows = ("intercept", math.rint(b0 * 10000) / 10000) +:
      features.zipWithIndex.map { case (f, i) =>
        (f, math.rint(coefsOrig(i) * 10000) / 10000)
      }
    val acc = scored.agg(r4(avg(when(col("prediction") === col("_lab"), 1.0).otherwise(0.0))))
      .head().getDouble(0)
    input.unpersist()
    coefRows.toDF("term", "value").withColumn("train_accuracy", lit(acc))
  }
}
