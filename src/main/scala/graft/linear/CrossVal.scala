package graft.linear

import graft.core.Num.{md5Long, r4}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-fold cross-validation for the closed-form linear family — the
  * model-selection surface over train_test_split (reference
  * preprocessing/model_selection, sklearn KFold semantics) re-expressed
  * for one-pass distributed fitting.
  *
  * The trick: per-fold sufficient statistics from ONE map-side-combined
  * groupBy, then every leave-one-fold-out training fit is algebra on the
  * k-row frame (train stats = global − fold stats). All k models cost one
  * corpus scan; validation scoring joins the k-row coefficient frame back
  * by fold key (broadcast) for one more scan. Never a per-fold refit, at
  * any corpus size or k. */
object CrossVal {
  /** Deterministic engine-neutral fold id in [0, k): md5 of the row key. */
  def foldId(rowKey: Column, k: Int): Column = md5Long(rowKey) % k

  /** K-fold CV of 1-feature OLS: returns one row per fold with the
    * leave-that-fold-out coefficients and the held-out MSE/R². */
  def kFoldOLS(df: DataFrame, x: String, y: Column, rowKey: Column, k: Int): DataFrame = {
    val rows = df.select(foldId(rowKey, k).as("fold"), col(x).as("_x"), y.as("_y"))
    // k-row sufficient-stats frame, referenced by BOTH the global reduce
    // and the train-side algebra — cached so the corpus aggregates once
    // (r17 opt, guide §1.2: one pass was the design; the second reference
    // silently re-scanned)
    val perFold = rows.groupBy("fold").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
      sum(col("_x") * col("_x")).as("sxx"),
      sum(col("_x") * col("_y")).as("sxy"))
      .cache()
    val global = perFold.agg(
      sum(col("n")).as("gn"), sum(col("sx")).as("gsx"), sum(col("sy")).as("gsy"),
      sum(col("sxx")).as("gsxx"), sum(col("sxy")).as("gsxy"))
    // train-side stats for fold f = global − fold f (exact: same doubles
    // summed, grouped first — associativity differences live below the
    // oracle's rounding grid)
    val t = perFold.crossJoin(global)
      .select(col("fold"), col("n"),
        (col("gn") - col("n")).as("tn"),
        (col("gsx") - col("sx")).as("tsx"), (col("gsy") - col("sy")).as("tsy"),
        (col("gsxx") - col("sxx")).as("tsxx"), (col("gsxy") - col("sxy")).as("tsxy"))
    val slope = (col("tsxy") - col("tsx") * col("tsy") / col("tn")) /
      (col("tsxx") - col("tsx") * col("tsx") / col("tn"))
    val coefs = t.select(col("fold"), col("tn"), col("n").as("nv"),
      slope.as("_slope"),
      (col("tsy") / col("tn") - slope * col("tsx") / col("tn")).as("_icpt"))
    rows.join(broadcast(coefs), "fold")
      .groupBy("fold")
      .agg(
        max(col("tn")).cast("long").as("n_train"),
        count(lit(1)).cast("long").as("n_val"),
        r4(max(col("_slope"))).as("slope"),
        r4(max(col("_icpt"))).as("intercept"),
        r4(avg(pow(col("_y") - (col("_icpt") + col("_slope") * col("_x")), 2))).as("val_mse"))
      .orderBy("fold")
  }

  /** Cross-validated ridge hyperparameter search: k folds × L lambdas, all
    * k·L closed-form models from the SAME per-fold sufficient-stats pass
    * (leave-one-fold-out centered Gram ± λ), scored in ONE more scan —
    * each row evaluates all L of its fold's candidate models as codegen
    * columns, so candidate count multiplies CPU per row, not scans or
    * shuffles. Output: one row per λ with the CV-mean validation MSE and
    * the argmin winner (decided on ROUNDED mse, ties to the smaller λ —
    * SQL-replayable). */
  def ridgeCV(df: DataFrame, x: String, y: Column, rowKey: Column, k: Int,
              lambdas: Seq[Double]): DataFrame = {
    val rows = df.select(foldId(rowKey, k).as("fold"), col(x).as("_x"), y.as("_y"))
    // k-row sufficient-stats frame, referenced by BOTH the global reduce
    // and the train-side algebra — cached so the corpus aggregates once
    // (r17 opt, guide §1.2: one pass was the design; the second reference
    // silently re-scanned)
    val perFold = rows.groupBy("fold").agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("_x")).as("sx"), sum(col("_y")).as("sy"),
      sum(col("_x") * col("_x")).as("sxx"),
      sum(col("_x") * col("_y")).as("sxy"))
      .cache()
    val global = perFold.agg(
      sum(col("n")).as("gn"), sum(col("sx")).as("gsx"), sum(col("sy")).as("gsy"),
      sum(col("sxx")).as("gsxx"), sum(col("sxy")).as("gsxy"))
    val t = perFold.crossJoin(global)
      .select(col("fold"),
        (col("gn") - col("n")).as("tn"),
        (col("gsx") - col("sx")).as("tsx"), (col("gsy") - col("sy")).as("tsy"),
        (col("gsxx") - col("sxx")).as("tsxx"), (col("gsxy") - col("sxy")).as("tsxy"))
    // slope_λ = centered-Sxy / (centered-Sxx + λ), intercept unpenalized
    val coefCols = lambdas.zipWithIndex.flatMap { case (lam, i) =>
      val slope = (col("tsxy") - col("tsx") * col("tsy") / col("tn")) /
        (col("tsxx") - col("tsx") * col("tsx") / col("tn") + lit(lam))
      Seq(slope.as(s"_s$i"),
        (col("tsy") / col("tn") - slope * col("tsx") / col("tn")).as(s"_b$i"))
    }
    val coefs = t.select(col("fold") +: coefCols: _*)
    val errAggs = lambdas.indices.map { i =>
      sum(pow(col("_y") - (col(s"_b$i") + col(s"_s$i") * col("_x")), 2)).as(s"_e$i")
    }
    val perFoldErr = rows.join(broadcast(coefs), "fold")
      .groupBy("fold")
      .agg(count(lit(1)).cast("double").as("nv"), errAggs: _*)
    // CV score per λ = mean over folds of (fold SSE / fold n) — reduce the
    // k-row frame, then argmin on the rounded score
    val scoreCols = lambdas.zipWithIndex.map { case (lam, i) =>
      struct(lit(lam).as("lambda"),
        round(avg(col(s"_e$i") / col("nv")), 4).as("mean_val_mse")).as(s"_c$i")
    }
    val exploded = perFoldErr.agg(scoreCols.head, scoreCols.tail: _*)
      .select(explode(array(lambdas.indices.map(i => col(s"_c$i")): _*)).as("_s"))
      .select(col("_s.lambda").as("lambda"), col("_s.mean_val_mse").as("mean_val_mse"))
    val w = Window.orderBy(col("mean_val_mse"), col("lambda"))
    exploded.withColumn("best", row_number().over(w) === 1)
      .orderBy("lambda")
  }
}
