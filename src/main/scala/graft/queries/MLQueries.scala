package graft.queries

import graft.cluster.KMeansGraft
import graft.core.Tables
import graft.ensemble.Forest
import graft.linear.{ElasticNet, GradientSolver, Lasso}
import graft.preprocessing.Preprocessing
import graft.svm.SVMGraft
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative / seeded estimators (rows-only checks): MLlib-backed models and
  * the graft solver harness. Deterministic output shapes, coefficients
  * rounded — the driver checks row presence; ScalaTest checks semantics
  * against closed-form ground truth where it exists. */
object MLQueries {
  type Q = (SparkSession, String) => DataFrame

  private val LiFeatures = Seq("l_quantity", "l_discount", "l_tax")

  private def liWithLabel(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).withColumn("_bin",
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0))

  val queries: Map[String, Q] = Map(
    "lasso_cd" -> { (s, d) =>
      Lasso.fit(Tables.lineitem(s, d), LiFeatures, "l_extendedprice", alpha = 10.0)
        .toDF(s).select(col("term"), round(col("coef"), 2).as("coef")).orderBy("term")
    },
    "elastic_net" -> { (s, d) =>
      ElasticNet.fit(Tables.lineitem(s, d), LiFeatures, "l_extendedprice",
          alpha = 10.0, l1Ratio = 0.5)
        .toDF(s).select(col("term"), round(col("coef"), 2).as("coef")).orderBy("term")
    },
    "logreg" -> { (s, d) =>
      val df = liWithLabel(s, d)
      val input = new VectorAssembler().setInputCols(LiFeatures.toArray).setOutputCol("_fv")
        .transform(df.select((LiFeatures.map(c => col(c).cast("double").as(c)) :+ col("_bin")): _*))
      val m = new LogisticRegression().setFeaturesCol("_fv").setLabelCol("_bin")
        .setMaxIter(50).setRegParam(0.0).setTol(1e-9).fit(input)
      import s.implicits._
      (("intercept", math.rint(m.intercept * 10000) / 10000) +:
        LiFeatures.zipWithIndex.map { case (f, i) =>
          (f, math.rint(m.coefficients(i) * 10000) / 10000)
        }).toDF("term", "coef").orderBy("term")
    },
    "qn_logreg" -> { (s, d) =>
      GradientSolver.fitQN(liWithLabel(s, d), LiFeatures, "_bin")
        .toDF(s).select(col("term"), round(col("coef"), 4).as("coef")).orderBy("term")
    },
    "sgd_linreg" -> { (s, d) =>
      GradientSolver.fit(Tables.lineitem(s, d), Seq("l_quantity"), "l_extendedprice",
          GradientSolver.SquaredLoss, lr = 0.1, iters = 60)
        .toDF(s).select(col("term"), round(col("coef"), 1).as("coef")).orderBy("term")
    },
    "mbsgd_classifier" -> { (s, d) =>
      GradientSolver.fit(liWithLabel(s, d), LiFeatures, "_bin",
          GradientSolver.HingeLoss, lr = 0.05, iters = 40, batchFraction = 0.5)
        .toDF(s).select(col("term"), round(col("coef"), 3).as("coef")).orderBy("term")
    },
    "mbsgd_regressor" -> { (s, d) =>
      GradientSolver.fit(Tables.lineitem(s, d), Seq("l_quantity"), "l_extendedprice",
          GradientSolver.SquaredLoss, lr = 0.1, iters = 60, batchFraction = 0.5)
        .toDF(s).select(col("term"), round(col("coef"), 1).as("coef")).orderBy("term")
    },
    "kmeans" -> { (s, d) =>
      KMeansGraft.fitSummary(Tables.lineitem(s, d),
        Seq("l_quantity", "l_discount", "l_tax"), k = 4, maxIter = 10)
    },
    "rf_classifier" -> { (s, d) =>
      Forest.classifierSummary(Tables.lineitem(s, d), LiFeatures, "l_returnflag",
        numTrees = 10)
    },
    "rf_regressor" -> { (s, d) =>
      Forest.regressorSummary(Tables.lineitem(s, d), LiFeatures, "l_extendedprice",
        numTrees = 10)
    },
    "fil_inference" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val split = Preprocessing.trainTestSplit(li, "l_orderkey", 0.25)
      Forest.inferenceSummary(split.filter(col("split") === "train"),
        split.filter(col("split") === "test"), LiFeatures, "l_extendedprice",
        numTrees = 10)
    },
    "svm_linear" -> { (s, d) =>
      SVMGraft.linearSvcSummary(Tables.lineitem(s, d), LiFeatures,
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0), maxIter = 20)
    }
  )
}
