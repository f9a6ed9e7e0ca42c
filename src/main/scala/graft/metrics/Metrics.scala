package graft.metrics

import graft.core.Num.{r4, r6}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation metrics (reference python/cuml/metrics/: regression.pyx
  * r2_score/mse, accuracy.pyx, cluster/adjustedrandindex.pyx) as single
  * codegen'd aggregate passes — each metric is one scan, no shuffle beyond
  * the final reduce, identical cost profile at any scale.
  */
object Metrics {
  /** R² = 1 − SS_res / SS_tot, one pass via sufficient sums. */
  def r2Score(df: DataFrame, y: Column, pred: Column): DataFrame =
    df.select(y.cast("double").as("_y"), pred.cast("double").as("_p"))
      .agg(
        count(lit(1)).cast("double").as("_n"),
        sum(col("_y")).as("_sy"), sum(col("_y") * col("_y")).as("_syy"),
        sum((col("_y") - col("_p")) * (col("_y") - col("_p"))).as("_ssres"))
      .select(r4(lit(1.0) - col("_ssres") / (col("_syy") - col("_sy") * col("_sy") / col("_n"))).as("r2"))

  /** MSE, RMSE, MAE in one pass. */
  def regressionErrors(df: DataFrame, y: Column, pred: Column): DataFrame = {
    val e = y.cast("double") - pred.cast("double")
    df.agg(
      r4(avg(e * e)).as("mse"),
      r4(sqrt(avg(e * e))).as("rmse"),
      r4(avg(abs(e))).as("mae"))
  }

  /** Fraction of rows where pred == y. */
  def accuracy(df: DataFrame, y: Column, pred: Column): DataFrame =
    df.agg(r4(avg(when(y === pred, 1.0).otherwise(0.0))).as("accuracy"))

  /** Adjusted Rand Index between two label columns — the contingency table
    * is a groupBy (shuffle on (a,b) only, cardinality = #classes²), then the
    * pair-count formula on the driver-sized result. */
  def adjustedRand(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cont = df.groupBy(a.as("_a"), b.as("_b")).agg(count(lit(1)).cast("double").as("_n"))
    def comb2(c: Column): Column = c * (c - 1) / 2.0
    val stats = cont.agg(
      sum(col("_n")).as("_tot"),
      sum(comb2(col("_n"))).as("_sij"))
    val aSide = cont.groupBy(col("_a")).agg(sum(col("_n")).as("_m"))
      .agg(sum(comb2(col("_m"))).as("_sa"))
    val bSide = cont.groupBy(col("_b")).agg(sum(col("_n")).as("_m"))
      .agg(sum(comb2(col("_m"))).as("_sb"))
    stats.crossJoin(aSide).crossJoin(bSide)
      .select(r4(
        (col("_sij") - col("_sa") * col("_sb") / comb2(col("_tot"))) /
          ((col("_sa") + col("_sb")) / 2.0 - col("_sa") * col("_sb") / comb2(col("_tot")))
      ).as("ari"))
  }

  /** Confusion matrix: counts per (truth, pred) — ONE map-side-combined
    * groupBy on the bounded class-pair key; classes² rows out regardless of
    * corpus size. */
  def confusionMatrix(df: DataFrame, y: Column, pred: Column): DataFrame =
    df.groupBy(y.as("truth"), pred.as("pred"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** Per-class precision / recall / F1 (sklearn classification_report
    * surface). One corpus pass builds the confusion matrix; every reduction
    * after that runs on the classes²-row frame. Classes are the TRUTH-side
    * classes (support > 0); a class never predicted gets precision 0. */
  def classificationReport(df: DataFrame, y: Column, pred: Column): DataFrame = {
    val cm = confusionMatrix(df, y, pred)
    val byTruth = cm.groupBy(col("truth").as("cls"))
      .agg(sum(col("n")).cast("double").as("_support"))
    val byPred = cm.groupBy(col("pred").as("cls"))
      .agg(sum(col("n")).cast("double").as("_predn"))
    val tp = cm.filter(col("truth") === col("pred"))
      .select(col("truth").as("cls"), col("n").cast("double").as("_tp"))
    byTruth.join(byPred, Seq("cls"), "left").join(tp, Seq("cls"), "left")
      .select(col("cls"),
        col("_support").cast("long").as("support"),
        r4(when(coalesce(col("_predn"), lit(0.0)) > 0,
          coalesce(col("_tp"), lit(0.0)) / col("_predn")).otherwise(0.0)).as("precision"),
        r4(coalesce(col("_tp"), lit(0.0)) / col("_support")).as("recall"),
        r4(lit(2.0) * coalesce(col("_tp"), lit(0.0)) /
          (coalesce(col("_predn"), lit(0.0)) + col("_support"))).as("f1"))
  }

  /** Exact ROC-AUC via the tie-corrected rank statistic
    * AUC = Σ_s n⁺(s)·(N⁻_{<s} + n⁻(s)/2) / (P·N), computed over the
    * DISTINCT-score frame: scores are quantized to the 1e-4 oracle grid,
    * grouped (map-side combine, bounded key cardinality), and the single
    * cumulative window runs over distinct scores only — never a global
    * sort of the raw rows. Equivalent to trapezoidal ROC integration with
    * tie-averaging. `label` must be a boolean column. */
  /** Cohen's kappa — chance-corrected agreement between two labelings:
    *   κ = (p_o − p_e)/(1 − p_e),  p_e = Σ_c marginal_y(c)·marginal_pred(c)
    * One confusion-matrix pass; the marginals and both probabilities are
    * aggregates over the classes²-row frame. */
  def cohenKappa(df: DataFrame, y: Column, pred: Column): DataFrame = {
    val cm = confusionMatrix(df, y, pred)
    val tot = cm.agg(sum(col("n")).cast("double").as("_tot"),
      sum(when(col("truth") === col("pred"), col("n")).otherwise(0L)).cast("double").as("_agree"))
    val byTruth = cm.groupBy(col("truth").as("_c")).agg(sum(col("n")).cast("double").as("_nt"))
    val byPred = cm.groupBy(col("pred").as("_c")).agg(sum(col("n")).cast("double").as("_np"))
    val pe = byTruth.join(byPred, "_c")
      .agg(sum(col("_nt") * col("_np")).as("_pe_num"))
    tot.crossJoin(pe)
      .select(r4(
        (col("_agree") / col("_tot") - col("_pe_num") / (col("_tot") * col("_tot"))) /
          (lit(1.0) - col("_pe_num") / (col("_tot") * col("_tot")))).as("kappa"))
  }

  /** Homogeneity / completeness / V-measure / mutual information between
    * two label columns (Rosenberg & Hirschberg 2007, the sklearn
    * clustering-metric trio). Like adjustedRand: ONE groupBy builds the
    * contingency table (shuffle key = the bounded class pair), every
    * entropy term is an aggregate over that classes²-row frame.
    *   H(C|K) = −Σ (n_ck/N)·ln(n_ck/n_k),  h = 1 − H(C|K)/H(C)
    *   MI = H(C) + H(K) − H(C,K)
    * Degenerate single-class sides follow sklearn: h/c = 1 when the
    * conditional entropy's reference entropy is 0. */
  def vMeasure(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cont = df.groupBy(a.as("_a"), b.as("_b"))
      .agg(count(lit(1)).cast("double").as("_n"))
    val tot = cont.agg(sum(col("_n")).as("_tot"))
    val aTot = cont.groupBy(col("_a")).agg(sum(col("_n")).as("_na"))
    val bTot = cont.groupBy(col("_b")).agg(sum(col("_n")).as("_nb"))
    val joined = cont.join(aTot, "_a").join(bTot, "_b").crossJoin(tot)
    val stats = joined.agg(
      // H(C|K) normalizes each cell by the K-side (=b) marginal, H(K|C)
      // by the C-side (=a) marginal
      (-sum(col("_n") / col("_tot") * log(col("_n") / col("_nb")))).as("_hCgK"),
      (-sum(col("_n") / col("_tot") * log(col("_n") / col("_na")))).as("_hKgC"),
      (-sum(col("_n") / col("_tot") * log(col("_n") / col("_tot")))).as("_hCK"))
    val hc = tot.crossJoin(
      aTot.crossJoin(tot).agg((-sum(col("_na") / col("_tot") * log(col("_na") / col("_tot")))).as("_hC")))
      .crossJoin(
        bTot.crossJoin(tot).agg((-sum(col("_nb") / col("_tot") * log(col("_nb") / col("_tot")))).as("_hK")))
    val h = when(col("_hC") > 0, lit(1.0) - col("_hCgK") / col("_hC")).otherwise(1.0)
    val c = when(col("_hK") > 0, lit(1.0) - col("_hKgC") / col("_hK")).otherwise(1.0)
    stats.crossJoin(hc)
      .select(
        r4(h).as("homogeneity"),
        r4(c).as("completeness"),
        r4(when(h + c > 0, lit(2.0) * h * c / (h + c)).otherwise(0.0)).as("v_measure"),
        r6(col("_hC") + col("_hK") - col("_hCK")).as("mutual_info"))
  }

  /** Simplified (centroid-based) silhouette per cluster: a = distance to
    * own centroid, b = min distance to any other, s = (b−a)/max(a,b).
    * The pairwise-distance silhouette is O(n²) by definition; the
    * centroid form is the one that scales — a pure codegen scan against
    * the broadcast literal model, then one bounded-key aggregate. */
  def silhouetteSimplified(df: DataFrame, feats: Seq[Column],
                           centroids: Seq[Seq[Double]]): DataFrame = {
    val dists = centroids.map { c =>
      sqrt(feats.zip(c).map { case (f, v) => (f - v) * (f - v) }.reduce(_ + _))
    }
    val assign = graft.cluster.KMeansGraft.assign(feats, centroids)
    val a = dists.zipWithIndex.foldRight(lit(0.0): Column) { case ((dc, i), acc) =>
      when(assign === i, dc).otherwise(acc)
    }
    val b = dists.indices.foldRight(lit(0.0): Column) { case (i, acc) =>
      val others = dists.indices.filter(_ != i).map(dists)
      val minOther = if (others.size == 1) others.head else least(others: _*)
      when(assign === i, minOther).otherwise(acc)
    }
    val sil = (b - a) / greatest(a, b)
    df.select(assign.as("cluster"), sil.as("_s"))
      .groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n"), r4(avg(col("_s"))).as("mean_silhouette"))
  }

  /** Average precision (area under the precision-recall curve, sklearn's
    * step-sum definition: AP = Σᵢ (Rᵢ−Rᵢ₋₁)·Pᵢ over thresholds descending)
    * plus the best F1 over all thresholds. Same discipline as [[rocAuc]]:
    * quantize the score to the 1e-4 oracle grid, ONE groupBy to the
    * distinct-score frame, then a bounded window over it — never a window
    * over raw rows. */
  def averagePrecision(df: DataFrame, label: Column, score: Column): DataFrame = {
    val g = df
      .select(round(score, 4).as("_s"), when(label, 1L).otherwise(0L).as("_y"))
      .groupBy(col("_s"))
      .agg(sum(col("_y")).cast("double").as("_np"),
        sum(lit(1L) - col("_y")).cast("double").as("_nn"))
    val w = Window.orderBy(col("_s").desc).rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy(col("_s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g.withColumn("_cumtp", sum(col("_np")).over(w))
      .withColumn("_cumpp", sum(col("_np") + col("_nn")).over(w))
      .withColumn("_ptot", sum(col("_np")).over(wAll))
      .agg(
        sum(col("_np")).cast("long").as("n_pos"),
        sum(col("_nn")).cast("long").as("n_neg"),
        count(lit(1)).cast("long").as("n_thresholds"),
        r6(sum(col("_np") * col("_cumtp") / col("_cumpp")) / sum(col("_np")))
          .as("average_precision"),
        r6(max(round(lit(2.0) * col("_cumtp") / (col("_cumpp") + col("_ptot")), 6)))
          .as("best_f1"))
  }

  /** Spearman rank correlation with average (midrank) tie handling:
    * rank(v) = #below(v) + (#eq(v)+1)/2 from each column's distinct-value
    * frame (ONE groupBy + a bounded window, the [[rocAuc]] discipline —
    * callers must pass bounded-cardinality/quantized columns), ranks join
    * back on the value key, then Pearson-on-ranks from one
    * sufficient-stats aggregate. */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("double").as("_x"), y.cast("double").as("_y"))
    def rankFrame(vc: String, rc: String): DataFrame = {
      val g = base.groupBy(col(vc)).agg(count(lit(1)).cast("double").as("_n"))
      val w = Window.orderBy(col(vc)).rowsBetween(Window.unboundedPreceding, -1)
      g.select(col(vc),
        (coalesce(sum(col("_n")).over(w), lit(0.0)) + (col("_n") + 1.0) / 2.0).as(rc))
    }
    base
      .join(rankFrame("_x", "_rx"), "_x")
      .join(rankFrame("_y", "_ry"), "_y")
      .agg(count(lit(1)).cast("double").as("_cn"),
        sum(col("_rx")).as("_sx"), sum(col("_ry")).as("_sy"),
        sum(col("_rx") * col("_ry")).as("_sxy"),
        sum(col("_rx") * col("_rx")).as("_sxx"),
        sum(col("_ry") * col("_ry")).as("_syy"))
      .select(col("_cn").cast("long").as("n"),
        r6((col("_cn") * col("_sxy") - col("_sx") * col("_sy")) /
          sqrt((col("_cn") * col("_sxx") - col("_sx") * col("_sx")) *
            (col("_cn") * col("_syy") - col("_sy") * col("_sy")))).as("spearman"))
  }

  /** Normalized mutual information between two labelings (sqrt and
    * arithmetic normalizations — sklearn's `nmi` variants), from the same
    * contingency aggregate as [[vMeasure]]. */
  def nmi(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cont = df.groupBy(a.as("_a"), b.as("_b"))
      .agg(count(lit(1)).cast("double").as("_n"))
    val tot = cont.agg(sum(col("_n")).as("_tot"))
    val aTot = cont.groupBy(col("_a")).agg(sum(col("_n")).as("_na"))
    val bTot = cont.groupBy(col("_b")).agg(sum(col("_n")).as("_nb"))
    val mi = cont.join(aTot, "_a").join(bTot, "_b").crossJoin(tot)
      .agg(sum(col("_n") / col("_tot") *
        log(col("_n") * col("_tot") / (col("_na") * col("_nb")))).as("_mi"))
    val hs = aTot.crossJoin(tot)
      .agg((-sum(col("_na") / col("_tot") * log(col("_na") / col("_tot")))).as("_ha"))
      .crossJoin(bTot.crossJoin(tot)
        .agg((-sum(col("_nb") / col("_tot") * log(col("_nb") / col("_tot")))).as("_hb")))
    mi.crossJoin(hs).select(
      r6(col("_mi")).as("mutual_info"),
      r6(col("_mi") / sqrt(col("_ha") * col("_hb"))).as("nmi_sqrt"),
      r6(lit(2.0) * col("_mi") / (col("_ha") + col("_hb"))).as("nmi_arith"))
  }

  def rocAuc(df: DataFrame, label: Column, score: Column): DataFrame = {
    val g = df
      .select(round(score, 4).as("_s"), when(label, 1L).otherwise(0L).as("_y"))
      .groupBy(col("_s"))
      .agg(sum(col("_y")).cast("double").as("_np"),
        sum(lit(1L) - col("_y")).cast("double").as("_nn"))
    val w = Window.orderBy(col("_s")).rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("_cumneg", coalesce(sum(col("_nn")).over(w), lit(0.0)))
      .agg(
        sum(col("_np")).cast("long").as("n_pos"),
        sum(col("_nn")).cast("long").as("n_neg"),
        r6(sum(col("_np") * (col("_cumneg") + col("_nn") / 2.0)) /
          (sum(col("_np")) * sum(col("_nn")))).as("auc"))
  }
}
