package graft.ensemble

import graft.core.Num.r4
import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random forests + forest inference (reference python/cuml/ensemble/
  * randomforestclassifier.pyx, randomforestregressor.pyx, fil/fil.pyx).
  *
  * MLlib's distributed histogram-based tree growth IS the Spark-native
  * answer to cuML's GPU forest builder. ForestInference (FIL) maps to a
  * broadcast model applied through a codegen'd transform — a pure map at
  * scoring time, which is the part that runs over 100 TB.
  */
object Forest {
  private def withFeatures(df: DataFrame, features: Seq[String],
                           extra: Seq[(String, Column)]): DataFrame = {
    val base = df.select(features.map(c => col(c).cast("double").as(c)) ++
      extra.map { case (n, c) => c.as(n) }: _*)
    new VectorAssembler().setInputCols(features.toArray).setOutputCol("_fv")
      .transform(base)
  }

  /** Histogram resolution matching the reference's default (n_bins = 8 in
    * randomforestclassifier.pyx:308) — MLlib's 32-bin default quadruples the
    * split-stats cost for no fidelity gain over the reference. maxDepth
    * stays at 5 (vs the reference's 16): depth-16 level-wise training is a
    * 2¹⁶-node frontier — not a 100 TB-viable setting on any engine. */
  private val MaxBins = 8

  /** One seeded classifier fit shared by [[classifierSummary]] and
    * [[classifierImportances]] — the two queries are different VIEWS of the
    * same fitted estimator (exactly the reference's fit-once object with
    * `predict` and `feature_importances_` accessors), so the fit is
    * memoized on (canonicalized input plan, hyperparameters). The fit is
    * deterministic given the seed, the model holds only driver-local
    * trees, and both queries stay independently callable. */
  private val classifierFits =
    new java.util.concurrent.ConcurrentHashMap[String, RandomForestClassificationModel]()

  private def fitClassifier(df: DataFrame, features: Seq[String], labelCol: String,
                            numTrees: Int, maxDepth: Int,
                            seed: Long): (DataFrame, RandomForestClassificationModel) = {
    val input = indexedInput(df, features, labelCol)
    // key on the RAW caller plan (pure column ops over the scan — stable
    // semanticHash), not the assembled/indexed one: VectorAssembler and
    // StringIndexerModel wrap per-instance UDF closures whose canonical
    // form differs on every call, which would defeat the memoization
    val key = s"${df.queryExecution.analyzed.semanticHash()}:" +
      s"${features.mkString(",")}:$labelCol:$numTrees:$maxDepth:$seed:$MaxBins"
    (input, classifierFits.computeIfAbsent(key, _ =>
      new RandomForestClassifier().setFeaturesCol("_fv").setLabelCol("_lab")
        .setNumTrees(numTrees).setMaxDepth(maxDepth).setMaxBins(MaxBins).setSeed(seed)
        .fit(input)))
  }

  private def indexedInput(df: DataFrame, features: Seq[String], labelCol: String): DataFrame = {
    val input0 = withFeatures(df, features, Seq("_labstr" -> col(labelCol)))
    val si = new StringIndexer().setInputCol("_labstr").setOutputCol("_lab")
      .setStringOrderType("alphabetAsc")
    si.fit(input0).transform(input0)
  }

  /** Train a seeded RF classifier; return per-class prediction counts and
    * per-class precision (deterministic given the seed). */
  def classifierSummary(df: DataFrame, features: Seq[String], labelCol: String,
                        numTrees: Int = 20, maxDepth: Int = 5, seed: Long = 42L): DataFrame = {
    val (input, model) = fitClassifier(df, features, labelCol, numTrees, maxDepth, seed)
    val scored = model.transform(input)
    scored.groupBy(col("prediction").cast("long").as("pred_class"))
      .agg(count(lit(1)).cast("long").as("n"),
        r4(avg(when(col("prediction") === col("_lab"), 1.0).otherwise(0.0))).as("class_precision"))
      .orderBy(col("pred_class"))
  }

  /** Gini-based feature importances of the seeded RF classifier (reference
    * randomforest's feature_importances_): MLlib accumulates per-split
    * impurity gains during the distributed fit, so this is free at any
    * scale — the output is just the normalized vector. */
  def classifierImportances(df: DataFrame, features: Seq[String], labelCol: String,
                            numTrees: Int = 20, maxDepth: Int = 5, seed: Long = 42L): DataFrame = {
    val imp = fitClassifier(df, features, labelCol, numTrees, maxDepth, seed)._2
      .featureImportances
    val spark = df.sparkSession
    import spark.implicits._
    features.zipWithIndex.map { case (f, i) =>
      (f, math.rint(imp(i) * 10000) / 10000)
    }.toDF("feature", "importance").orderBy(col("importance").desc, col("feature"))
  }

  def regressorSummary(df: DataFrame, features: Seq[String], labelCol: String,
                       numTrees: Int = 20, maxDepth: Int = 5, seed: Long = 42L): DataFrame = {
    val input = withFeatures(df, features, Seq("_y" -> col(labelCol).cast("double")))
    // seeded → deterministic → fit-once (keyed on the raw caller frame)
    val model = graft.core.FitCache.getOrFit(graft.core.FitCache.key(df,
      "rf_reg", features.mkString(","), labelCol, numTrees, maxDepth, seed, MaxBins)) {
      new RandomForestRegressor().setFeaturesCol("_fv").setLabelCol("_y")
        .setNumTrees(numTrees).setMaxDepth(maxDepth).setMaxBins(MaxBins).setSeed(seed)
        .fit(input)
    }
    val scored = model.transform(input)
    scored.agg(
      r4(sqrt(avg((col("prediction") - col("_y")) * (col("prediction") - col("_y"))))).as("train_rmse"),
      r4(avg(abs(col("prediction") - col("_y")))).as("train_mae"),
      count(lit(1)).cast("long").as("n"))
  }

  /** A literal decision tree scored as a pure codegen CASE chain — the
    * kmeans_assign/softmax_predict fixed-model pattern applied to forest
    * inference: this is EXACTLY what FIL compiles a tree to (a branch-free
    * scoring kernel over broadcast node parameters; fil/fil.pyx), so the
    * claim "forest scoring is a zero-shuffle codegen map at any corpus
    * size" gets a hash gate the seeded MLlib fits can't provide.
    * `tree` = (featureIdx, threshold, left, right) recursive spec. */
  sealed trait TreeNode
  final case class Leaf(value: Double) extends TreeNode
  final case class Split(feature: Int, threshold: Double,
                         left: TreeNode, right: TreeNode) extends TreeNode

  /** Score expression: features(f) <= thr → left else right. */
  def treeScore(features: Seq[Column], tree: TreeNode): Column = tree match {
    case Leaf(v) => lit(v)
    case Split(f, thr, l, r) =>
      when(features(f) <= thr, treeScore(features, l))
        .otherwise(treeScore(features, r))
  }

  /** Per-leaf summary of a literal-tree scoring pass: (prediction, n,
    * mean_label) — one codegen scan + one tiny aggregate. */
  def treePredictSummary(df: DataFrame, features: Seq[String], labelCol: String,
                         tree: TreeNode): DataFrame = {
    val cols = features.map(c => col(c).cast("double"))
    df.select(treeScore(cols, tree).as("prediction"),
        col(labelCol).cast("double").as("_y"))
      .groupBy(col("prediction"))
      .agg(count(lit(1)).cast("long").as("n"), r4(avg(col("_y"))).as("mean_label"))
      .orderBy("prediction")
  }

  /** FIL-style inference: train once, broadcast the model, score a stream
    * of rows through the codegen'd transform; output is the score
    * distribution — the inference pass itself is shuffle-free. */
  def inferenceSummary(train: DataFrame, score: DataFrame, features: Seq[String],
                       labelCol: String, numTrees: Int = 20, seed: Long = 42L): DataFrame = {
    // cache the assembled train split: MLlib's tree growth iterates over it,
    // and the upstream split filter (md5 per row) must not re-run per pass
    val model = graft.core.FitCache.getOrFit(graft.core.FitCache.key(train,
      "rf_infer", features.mkString(","), labelCol, numTrees, seed, MaxBins)) {
      val input = withFeatures(train, features, Seq("_y" -> col(labelCol).cast("double")))
        .select(col("_fv"), col("_y")).cache()
      input.count() // materialize before the iterative fit
      try {
        new RandomForestRegressor().setFeaturesCol("_fv").setLabelCol("_y")
          .setNumTrees(numTrees).setMaxDepth(5).setMaxBins(MaxBins).setSeed(seed).fit(input)
      } finally input.unpersist(blocking = false)
    }
    val scored = model.transform(withFeatures(score, features, Seq.empty))
    scored.agg(
      count(lit(1)).cast("long").as("n_scored"),
      r4(avg(col("prediction"))).as("mean_pred"),
      r4(stddev_samp(col("prediction"))).as("sd_pred"))
  }
}
