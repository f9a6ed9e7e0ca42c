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
    val base = df.select((features.map(c => col(c).cast("double").as(c)) :+
      binaryLabel.cast("double").as("_lab")): _*)
    val input = new VectorAssembler().setInputCols(features.toArray).setOutputCol("_fv")
      .transform(base).cache()
    val model = new LinearSVC().setFeaturesCol("_fv").setLabelCol("_lab")
      .setRegParam(regParam).setMaxIter(maxIter).setTol(1e-6).fit(input)
    val scored = model.transform(input)
    val spark = df.sparkSession
    import spark.implicits._
    val coefRows = ("intercept", math.rint(model.intercept * 10000) / 10000) +:
      features.zipWithIndex.map { case (f, i) =>
        (f, math.rint(model.coefficients(i) * 10000) / 10000)
      }
    val acc = scored.agg(r4(avg(when(col("prediction") === col("_lab"), 1.0).otherwise(0.0))))
      .head().getDouble(0)
    input.unpersist()
    coefRows.toDF("term", "value").withColumn("train_accuracy", lit(acc))
  }
}
