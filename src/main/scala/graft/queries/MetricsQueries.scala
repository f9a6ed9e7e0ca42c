package graft.queries

import graft.core.Tables
import graft.core.Num.{r4, r6}
import graft.linear.Softmax
import graft.metrics.Metrics
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classification-metric depth (reference python/cuml/metrics/ surface
  * extended the way every evaluation harness needs it at corpus scale):
  * confusion matrix, per-class precision/recall/F1, multiclass log-loss,
  * exact tie-corrected ROC-AUC, and the simplified (centroid-based)
  * silhouette. Every entry scores a FIXED literal model (the
  * kmeans_assign/softmax_predict pattern), so each metric is hash-gated
  * end to end. */
object MetricsQueries {
  type Q = (SparkSession, String) => DataFrame

  private def liFeatureCols: Seq[Column] = MLQueries.LiFeatures.map(c => col(c))

  /** SQL mirror of Softmax.scoreColumns over the shared literal model. */
  private def softmaxScoreSql(c: Int): String = {
    val terms = MLQueries.SoftmaxWeights(c).zip(MLQueries.LiFeatures)
      .map { case (w, f) => s"$w * $f" }
    (MLQueries.SoftmaxIntercepts(c).toString +: terms).mkString(" + ")
  }

  /** SQL mirror of Softmax.predict's argmax CASE chain (first class wins
    * exact ties — identical tie order in both engines). */
  private val softmaxPredSql: String =
    """CASE WHEN sa >= sn AND sa >= sr THEN 'A'
      |     WHEN sn >= sr THEN 'N' ELSE 'R' END""".stripMargin

  private val softmaxScoresCte: String =
    s"""sc AS (SELECT l_returnflag,
       |    ${softmaxScoreSql(0)} AS sa,
       |    ${softmaxScoreSql(1)} AS sn,
       |    ${softmaxScoreSql(2)} AS sr
       |  FROM lineitem)""".stripMargin

  /** SQL mirror of the linear-SVC literal margin (shared with svm_predict). */
  private val svmMarginSql: String = {
    val terms = MLQueries.SvmWeights.zip(MLQueries.LiFeatures)
      .map { case (w, f) => s"$w * $f" }
    (MLQueries.SvmIntercept.toString +: terms).mkString(" + ")
  }

  val queries: Map[String, Q] = Map(
    "confusion_matrix" -> { (s, d) =>
      // truth × predicted counts under the literal softmax model — one
      // map-side-combined groupBy on the bounded class-pair key
      val (pred, _) = Softmax.predict(liFeatureCols, MLQueries.SoftmaxClasses,
        MLQueries.SoftmaxIntercepts, MLQueries.SoftmaxWeights)
      Metrics.confusionMatrix(Tables.lineitem(s, d), col("l_returnflag"), pred)
        .orderBy("truth", "pred")
    },
    "precision_recall_f1" -> { (s, d) =>
      // sklearn classification_report surface: per-class P/R/F1 from ONE
      // corpus pass (the confusion matrix); everything after runs on the
      // classes²-row frame
      val (pred, _) = Softmax.predict(liFeatureCols, MLQueries.SoftmaxClasses,
        MLQueries.SoftmaxIntercepts, MLQueries.SoftmaxWeights)
      Metrics.classificationReport(Tables.lineitem(s, d), col("l_returnflag"), pred)
        .orderBy("cls")
    },
    "log_loss" -> { (s, d) =>
      // multiclass negative log-likelihood of the true class under the
      // literal softmax model, grouped by true class — max-subtracted
      // log-sum-exp so unbounded scores can't overflow; pure codegen scan
      // + one bounded-key aggregate
      val scores = Softmax.scoreColumns(liFeatureCols,
        MLQueries.SoftmaxIntercepts, MLQueries.SoftmaxWeights)
      val sMax = greatest(scores: _*)
      val lse = sMax + log(scores.map(sc => exp(sc - sMax)).reduce(_ + _))
      val sTrue = MLQueries.SoftmaxClasses.zip(scores).foldRight(lit(0.0): Column) {
        case ((cls, sc), acc) => when(col("l_returnflag") === cls, sc).otherwise(acc)
      }
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("class"), (lse - sTrue).as("_nll"))
        .groupBy("class")
        .agg(count(lit(1)).cast("long").as("n"), r4(avg(col("_nll"))).as("log_loss"))
        .orderBy("class")
    },
    "roc_auc" -> { (s, d) =>
      // exact tie-corrected AUC of the literal SVM decision_function for
      // the R class — grouped on the quantized score, one window over
      // DISTINCT scores (never a global row sort; see Metrics.rocAuc)
      val margin = MLQueries.SvmWeights.zip(liFeatureCols)
        .foldLeft(lit(MLQueries.SvmIntercept): Column) { case (acc, (w, f)) => acc + lit(w) * f }
      Metrics.rocAuc(Tables.lineitem(s, d), col("l_returnflag") === "R", margin)
    },
    "cohen_kappa" -> { (s, d) =>
      // chance-corrected agreement of the literal softmax model
      val (pred, _) = Softmax.predict(liFeatureCols, MLQueries.SoftmaxClasses,
        MLQueries.SoftmaxIntercepts, MLQueries.SoftmaxWeights)
      Metrics.cohenKappa(Tables.lineitem(s, d), col("l_returnflag"), pred)
    },
    "matthews_corr" -> { (s, d) =>
      // binary MCC of the literal SVM sign rule — all four confusion
      // cells from ONE codegen aggregate
      val margin = MLQueries.SvmWeights.zip(liFeatureCols)
        .foldLeft(lit(MLQueries.SvmIntercept): Column) { case (acc, (w, f)) => acc + lit(w) * f }
      val y = when(col("l_returnflag") === "R", 1.0).otherwise(0.0)
      val p = when(margin > 0, 1.0).otherwise(0.0)
      Tables.lineitem(s, d)
        .agg(sum(y * p).as("_tp"), sum((lit(1.0) - y) * (lit(1.0) - p)).as("_tn"),
          sum((lit(1.0) - y) * p).as("_fp"), sum(y * (lit(1.0) - p)).as("_fn"))
        .select(
          col("_tp").cast("long").as("tp"), col("_tn").cast("long").as("tn"),
          col("_fp").cast("long").as("fp"), col("_fn").cast("long").as("fn"),
          r4((col("_tp") * col("_tn") - col("_fp") * col("_fn")) /
            sqrt((col("_tp") + col("_fp")) * (col("_tp") + col("_fn")) *
              (col("_tn") + col("_fp")) * (col("_tn") + col("_fn")))).as("mcc"))
    },
    "ece" -> { (s, d) =>
      // expected + maximum calibration error over the calibration_curve
      // bins (the single-number summary of the reliability diagram):
      // ECE = Σ (n_b/N)|mean_pred − frac_pos| from ONE bounded-key
      // aggregate
      val margin = MLQueries.SvmWeights.zip(liFeatureCols)
        .foldLeft(lit(MLQueries.SvmIntercept): Column) { case (acc, (w, f)) => acc + lit(w) * f }
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(8.0) * margin)))
      val bin = least(floor(p * 10).cast("long"), lit(9L))
      val binned = Tables.lineitem(s, d)
        .select(bin.as("bin"), p.as("_p"),
          when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("_y"))
        .groupBy("bin")
        .agg(count(lit(1)).cast("double").as("_n"),
          avg(col("_p")).as("_mp"), avg(col("_y")).as("_fp"))
      val tot = binned.agg(sum(col("_n")).as("_tot"))
      binned.crossJoin(broadcast(tot))
        .agg(count(lit(1)).cast("long").as("n_bins"),
          r4(sum(col("_n") / col("_tot") * abs(col("_mp") - col("_fp")))).as("ece"),
          r4(max(abs(col("_mp") - col("_fp")))).as("mce"))
    },
    "youden_j" -> { (s, d) =>
      // optimal decision threshold by Youden's J = TPR − FPR: descending
      // cumulative window over the DISTINCT quantized-score frame (the
      // rocAuc discipline — never a global row sort), argmax on the
      // ROUNDED J with the smallest qualifying threshold as tie-break
      val margin = MLQueries.SvmWeights.zip(liFeatureCols)
        .foldLeft(lit(MLQueries.SvmIntercept): Column) { case (acc, (w, f)) => acc + lit(w) * f }
      val g = Tables.lineitem(s, d)
        .select(round(margin, 4).as("_s"),
          when(col("l_returnflag") === "R", 1L).otherwise(0L).as("_y"))
        .groupBy(col("_s"))
        .agg(sum(col("_y")).cast("double").as("_np"),
          sum(lit(1L) - col("_y")).cast("double").as("_nn"))
      val wd = org.apache.spark.sql.expressions.Window.orderBy(col("_s").desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val tot = g.agg(sum(col("_np")).as("_P"), sum(col("_nn")).as("_N"))
      val cum = g.withColumn("_ctp", sum(col("_np")).over(wd))
        .withColumn("_cfp", sum(col("_nn")).over(wd))
        .crossJoin(broadcast(tot))
      val j = col("_ctp") / col("_P") - col("_cfp") / col("_N")
      cum.select(col("_s"), r4(col("_ctp") / col("_P")).as("tpr"),
          r4(col("_cfp") / col("_N")).as("fpr"), r4(j).as("j"))
        .orderBy(col("j").desc, col("_s"))
        .limit(1)
        .select(col("_s").as("threshold"), col("tpr"), col("fpr"), col("j"))
    },
    "temperature_scaling" -> { (s, d) =>
      // multiclass calibration (Guo et al. 2017): rescale the literal
      // softmax model's logits by 1/T and pick the T minimizing the NLL.
      // The hw_fit_opt lattice discipline: EVERY candidate T evaluates in
      // ONE aggregate pass (8 rounded avg-NLL columns), the argmin runs
      // on the bounded 8-row unpivot. FULL hash gate
      val li = Tables.lineitem(s, d)
      val grid = Seq(0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0, 3.0)
      val z = MLQueries.SoftmaxClasses.zip(MLQueries.SoftmaxIntercepts)
        .zip(MLQueries.SoftmaxWeights).map { case ((c, b0), w) =>
          c -> MLQueries.LiFeatures.zip(w).foldLeft(lit(b0)) {
            case (acc, (f, wj)) => acc + col(f).cast("double") * wj
          }
        }
      val zmax = greatest(z.map(_._2): _*)
      val zTrue = z.foldLeft(lit(0.0)) { case (acc, (c, zc)) =>
        when(col("l_returnflag") === c, zc).otherwise(acc)
      }
      val aggs = grid.zipWithIndex.map { case (t, i) =>
        val lse = log(z.map { case (_, zc) => exp((zc - zmax) / t) }.reduce(_ + _)) +
          zmax / t
        round(avg(lse - zTrue / t), 6).as(s"_n$i")
      }
      val one = li.agg(aggs.head, aggs.tail: _*)
      val rows = one.select(explode(array(grid.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("temperature"), col(s"_n$i").as("avg_nll"))
      }: _*)).as("r")).select(col("r.temperature"), col("r.avg_nll"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("avg_nll"), col("temperature")) // bounded 8-row frame
      rows.withColumn("is_best", row_number().over(w) === 1)
        .orderBy("temperature")
    },
    "platt_scaling" -> { (s, d) =>
      // the calibration FIT face (pairs with calibration_curve/ece/
      // brier): 6 Newton iterations on the Platt smoothed-NLL sigmoid,
      // one rounded-moment aggregate per iteration. FULL hash gate —
      // the fit replays as chained MATERIALIZED CTEs
      val li = Tables.lineitem(s, d)
      val margin = lit(-0.1) + lit(0.004) * col("l_quantity") +
        lit(1.5) * col("l_discount") + lit(-2.0) * col("l_tax")
      graft.stats.Platt.fit(li, margin, col("l_returnflag") === "R")
    },
    "brier_score" -> { (s, d) =>
      // mean squared error of the calibrated probability (the proper
      // scoring rule behind calibration_curve) — one codegen aggregate
      val margin = MLQueries.SvmWeights.zip(liFeatureCols)
        .foldLeft(lit(MLQueries.SvmIntercept): Column) { case (acc, (w, f)) => acc + lit(w) * f }
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(8.0) * margin)))
      val y = when(col("l_returnflag") === "R", 1.0).otherwise(0.0)
      Tables.lineitem(s, d)
        .agg(count(lit(1)).cast("long").as("n"),
          r6(avg((p - y) * (p - y))).as("brier"))
    },
    "calibration_curve" -> { (s, d) =>
      // reliability diagram of the literal logistic score σ(margin) for
      // the R class: fixed-width probability bins (pure codegen) → per-bin
      // mean predicted vs observed frequency; ONE bounded-key aggregate
      val margin = MLQueries.SvmWeights.zip(liFeatureCols)
        .foldLeft(lit(MLQueries.SvmIntercept): Column) { case (acc, (w, f)) => acc + lit(w) * f }
      // ×8 temperature spreads σ(margin) across the bin range (the raw
      // margin spans ±0.26 → two bins only)
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(8.0) * margin)))
      val bin = least(floor(p * 10).cast("long"), lit(9L))
      Tables.lineitem(s, d)
        .select(bin.as("bin"), p.as("_p"),
          when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("_y"))
        .groupBy("bin")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg(col("_p"))).as("mean_pred"), r4(avg(col("_y"))).as("frac_pos"))
        .orderBy("bin")
    },
    "v_measure" -> { (s, d) =>
      // homogeneity / completeness / V-measure / MI between the lang and
      // source labelings (the clustering-metric trio next to adjusted_rand)
      Metrics.vMeasure(Tables.documents(s, d), col("lang"), col("source"))
    },
    "pr_curve" -> { (s, d) =>
      // average precision + best F1 of the literal SVM score for the R
      // class — the PR-side companion of roc_auc, same distinct-score
      // discipline
      val margin = MLQueries.SvmWeights.zip(liFeatureCols)
        .foldLeft(lit(MLQueries.SvmIntercept): Column) { case (acc, (w, f)) => acc + lit(w) * f }
      Metrics.averagePrecision(Tables.lineitem(s, d), col("l_returnflag") === "R", margin)
    },
    "spearman" -> { (s, d) =>
      // rank correlation of quantity vs BINNED extendedprice (the binning
      // bounds the distinct-value frames — declared quantized regime)
      Metrics.spearman(Tables.lineitem(s, d), col("l_quantity"),
        floor(col("l_extendedprice") / 1000.0))
    },
    "nmi" -> { (s, d) =>
      // normalized mutual information (sqrt + arithmetic) of lang × source
      Metrics.nmi(Tables.documents(s, d), col("lang"), col("source"))
    },
    "silhouette" -> { (s, d) =>
      // simplified silhouette (centroid-based — the form that scales: the
      // pairwise-distance silhouette is O(n²) by definition): a = dist to
      // own centroid, b = min dist to any other, s = (b−a)/max(a,b);
      // distances are pure codegen against the broadcast literal model
      Metrics.silhouetteSimplified(Tables.lineitem(s, d), liFeatureCols,
          TabularQueries.Centroids)
        .orderBy("cluster")
    }
  )

  /** Platt-scaling oracle: the rounded-moment Newton recursion replayed
    * as chained MATERIALIZED CTEs (the lasso_cd/gbt chained-fit
    * discipline) — identical smoothed targets, identical 1e-6 moment
    * grid, identical 2×2 Cramer update per iteration. */
  private def plattOracle(iters: Int): String = {
    val f = "(-0.1 + 0.004 * l_quantity + 1.5 * l_discount + -2.0 * l_tax)"
    val chain = (1 to iters).map { k =>
      val (aP, bP) = (s"(SELECT a FROM t${k - 1})", s"(SELECT b FROM t${k - 1})")
      s"""m$k AS MATERIALIZED (SELECT
         |    round(avg((t - p) * f), 6) AS g1, round(avg(t - p), 6) AS g0,
         |    round(avg(p * (1.0 - p) * f * f), 6) AS h11,
         |    round(avg(p * (1.0 - p) * f), 6) AS h10,
         |    round(avg(p * (1.0 - p)), 6) AS h00,
         |    round(avg(-(t * ln(greatest(p, 1e-300))
         |      + (1.0 - t) * ln(greatest(1.0 - p, 1e-300)))), 6) AS nll
         |  FROM (SELECT f, t, 1.0 / (1.0 + exp($aP * f + $bP)) AS p FROM bt)),
         |t$k AS (SELECT
         |    round($aP - (g1 * h00 - g0 * h10) / (h11 * h00 - h10 * h10), 6) AS a,
         |    round($bP - (h11 * g0 - h10 * g1) / (h11 * h00 - h10 * h10), 6) AS b
         |  FROM m$k)""".stripMargin
    }.mkString(",\n")
    val out = (1 to iters).map(k =>
      s"SELECT $k::BIGINT AS iter, (SELECT a FROM t$k) AS a, " +
        s"(SELECT b FROM t$k) AS b, (SELECT nll FROM m$k) AS avg_nll")
      .mkString("\nUNION ALL ")
    s"""WITH base AS (SELECT $f AS f,
       |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y FROM lineitem),
       |cnt AS (SELECT sum(y) AS np, sum(1.0 - y) AS nn FROM base),
       |bt AS MATERIALIZED (SELECT f,
       |    CASE WHEN y = 1.0 THEN (SELECT (np + 1.0) / (np + 2.0) FROM cnt)
       |         ELSE (SELECT 1.0 / (nn + 2.0) FROM cnt) END AS t FROM base),
       |t0 AS (SELECT 0.0 AS a,
       |    round(ln((SELECT nn + 1.0 FROM cnt) / (SELECT np + 1.0 FROM cnt)), 6) AS b),
       |$chain
       |$out ORDER BY iter""".stripMargin
  }

  /** Temperature-scaling oracle: identical logit expressions, identical
    * per-T shifted log-sum-exp, the same 1e-6 rounding, argmin over the
    * unnested 8-row grid with the lowest-T tiebreak. */
  private def temperatureOracle: String = {
    val grid = Seq(0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0, 3.0)
    val feats = MLQueries.LiFeatures
    val zs = MLQueries.SoftmaxClasses.zip(MLQueries.SoftmaxIntercepts)
      .zip(MLQueries.SoftmaxWeights).map { case ((c, b0), w) =>
        c -> (s"($b0" + feats.zip(w).map { case (f, wj) => s" + $f * $wj" }
          .mkString + ")")
      }
    val zmax = zs.map(_._2).mkString("greatest(", ", ", ")")
    val zTrue = zs.foldLeft("0.0") { case (acc, (c, e)) =>
      s"CASE WHEN l_returnflag = '$c' THEN $e ELSE $acc END"
    }
    val cols = grid.zipWithIndex.map { case (t, i) =>
      val lse = zs.map { case (_, e) => s"exp(($e - zm) / $t)" }
        .mkString("ln(", " + ", s") + zm / $t")
      s"round(avg($lse - zt / $t), 6) AS n$i"
    }.mkString(",\n  ")
    val unnest = grid.zipWithIndex.map { case (t, i) =>
      s"SELECT $t::DOUBLE AS temperature, n$i AS avg_nll FROM one"
    }.mkString("\nUNION ALL ")
    s"""WITH base AS (SELECT l_returnflag, $zmax AS zm, $zTrue AS zt,
       |    ${feats.mkString(", ")} FROM lineitem),
       |one AS (SELECT
       |  $cols
       |  FROM base),
       |g AS ($unnest),
       |r AS (SELECT temperature, avg_nll,
       |    row_number() OVER (ORDER BY avg_nll, temperature) AS rk FROM g)
       |SELECT temperature, avg_nll, rk = 1 AS is_best FROM r ORDER BY temperature""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "platt_scaling" -> plattOracle(6),
    "temperature_scaling" -> temperatureOracle,
    "confusion_matrix" ->
      s"""WITH $softmaxScoresCte
         |SELECT l_returnflag AS truth, ($softmaxPredSql) AS pred, count(*)::BIGINT AS n
         |FROM sc GROUP BY 1, 2 ORDER BY truth, pred""".stripMargin,
    "precision_recall_f1" ->
      s"""WITH $softmaxScoresCte,
         |p AS (SELECT l_returnflag AS truth, ($softmaxPredSql) AS pred FROM sc),
         |cm AS (SELECT truth, pred, count(*)::DOUBLE AS n FROM p GROUP BY 1, 2),
         |sup AS (SELECT truth AS cls, sum(n) AS support FROM cm GROUP BY 1),
         |prd AS (SELECT pred AS cls, sum(n) AS predn FROM cm GROUP BY 1),
         |tp AS (SELECT truth AS cls, n AS tp FROM cm WHERE truth = pred)
         |SELECT sup.cls AS cls, sup.support::BIGINT AS support,
         |  round(CASE WHEN coalesce(prd.predn, 0) > 0
         |    THEN coalesce(tp.tp, 0) / prd.predn ELSE 0.0 END, 4) AS precision,
         |  round(coalesce(tp.tp, 0) / sup.support, 4) AS recall,
         |  round(2.0 * coalesce(tp.tp, 0) / (coalesce(prd.predn, 0) + sup.support), 4) AS f1
         |FROM sup LEFT JOIN prd ON sup.cls = prd.cls LEFT JOIN tp ON sup.cls = tp.cls
         |ORDER BY cls""".stripMargin,
    "log_loss" ->
      s"""WITH $softmaxScoresCte,
         |t AS (SELECT l_returnflag AS class,
         |    greatest(sa, sn, sr) + ln(exp(sa - greatest(sa, sn, sr))
         |      + exp(sn - greatest(sa, sn, sr)) + exp(sr - greatest(sa, sn, sr)))
         |    - (CASE WHEN l_returnflag = 'A' THEN sa
         |            WHEN l_returnflag = 'N' THEN sn ELSE sr END) AS nll
         |  FROM sc)
         |SELECT class, count(*)::BIGINT AS n, round(avg(nll), 4) AS log_loss
         |FROM t GROUP BY class ORDER BY class""".stripMargin,
    "roc_auc" ->
      s"""WITH t AS (SELECT round($svmMarginSql, 4) AS s,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem),
         |g AS (SELECT s, sum(y)::DOUBLE AS np, sum(1 - y)::DOUBLE AS nn FROM t GROUP BY s),
         |c AS (SELECT s, np, nn,
         |    coalesce(sum(nn) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
         |  FROM g)
         |SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
         |  round(sum(np * (cumneg + nn / 2.0)) / (sum(np) * sum(nn)), 6) AS auc
         |FROM c""".stripMargin,
    "cohen_kappa" ->
      s"""WITH $softmaxScoresCte,
         |p AS (SELECT l_returnflag AS truth, ($softmaxPredSql) AS pred FROM sc),
         |cm AS (SELECT truth, pred, count(*)::DOUBLE AS n FROM p GROUP BY 1, 2),
         |t AS (SELECT sum(n) AS tot,
         |    sum(CASE WHEN truth = pred THEN n ELSE 0 END) AS agree FROM cm),
         |mt AS (SELECT truth AS c, sum(n) AS nt FROM cm GROUP BY 1),
         |mp AS (SELECT pred AS c, sum(n) AS np FROM cm GROUP BY 1),
         |pe AS (SELECT sum(mt.nt * mp.np) AS pe_num FROM mt JOIN mp ON mt.c = mp.c)
         |SELECT round((agree / tot - pe_num / (tot * tot))
         |  / (1.0 - pe_num / (tot * tot)), 4) AS kappa
         |FROM t, pe""".stripMargin,
    "matthews_corr" ->
      s"""WITH t AS (SELECT
         |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y,
         |    CASE WHEN ($svmMarginSql) > 0 THEN 1.0 ELSE 0.0 END AS p
         |  FROM lineitem),
         |c AS (SELECT sum(y * p) AS tp, sum((1.0 - y) * (1.0 - p)) AS tn,
         |    sum((1.0 - y) * p) AS fp, sum(y * (1.0 - p)) AS fn FROM t)
         |SELECT tp::BIGINT AS tp, tn::BIGINT AS tn, fp::BIGINT AS fp, fn::BIGINT AS fn,
         |  round((tp * tn - fp * fn) / sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)), 4) AS mcc
         |FROM c""".stripMargin,
    "ece" ->
      s"""WITH t AS (SELECT
         |    1.0 / (1.0 + exp(-(8.0 * ($svmMarginSql)))) AS p,
         |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
         |  FROM lineitem),
         |b AS (SELECT least(floor(p * 10), 9)::BIGINT AS bin, p, y FROM t),
         |g AS (SELECT bin, count(*)::DOUBLE AS n, avg(p) AS mp, avg(y) AS fp
         |  FROM b GROUP BY bin),
         |tt AS (SELECT sum(n) AS nn FROM g)
         |SELECT count(*)::BIGINT AS n_bins,
         |  round(sum(n / tt.nn * abs(mp - fp)), 4) AS ece,
         |  round(max(abs(mp - fp)), 4) AS mce
         |FROM g, tt""".stripMargin,
    "youden_j" ->
      s"""WITH t AS (SELECT round($svmMarginSql, 4) AS s,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem),
         |g AS (SELECT s, sum(y)::DOUBLE AS np, sum(1 - y)::DOUBLE AS nn FROM t GROUP BY s),
         |tt AS (SELECT sum(np) AS p, sum(nn) AS n FROM g),
         |c AS (SELECT s,
         |    sum(np) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ctp,
         |    sum(nn) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cfp
         |  FROM g),
         |f AS (SELECT s, round(ctp / tt.p, 4) AS tpr, round(cfp / tt.n, 4) AS fpr,
         |    round(ctp / tt.p - cfp / tt.n, 4) AS j
         |  FROM c, tt)
         |SELECT s AS threshold, tpr, fpr, j
         |FROM f ORDER BY j DESC, s LIMIT 1""".stripMargin,
    "brier_score" ->
      s"""WITH t AS (SELECT
         |    1.0 / (1.0 + exp(-(8.0 * ($svmMarginSql)))) AS p,
         |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
         |  FROM lineitem)
         |SELECT count(*)::BIGINT AS n, round(avg((p - y) * (p - y)), 6) AS brier
         |FROM t""".stripMargin,
    "calibration_curve" ->
      s"""WITH t AS (SELECT
         |    1.0 / (1.0 + exp(-(8.0 * ($svmMarginSql)))) AS p,
         |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
         |  FROM lineitem),
         |b AS (SELECT least(floor(p * 10), 9)::BIGINT AS bin, p, y FROM t)
         |SELECT bin, count(*)::BIGINT AS n, round(avg(p), 4) AS mean_pred,
         |  round(avg(y), 4) AS frac_pos
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "pr_curve" ->
      s"""WITH t AS (SELECT round($svmMarginSql, 4) AS s,
         |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem),
         |g AS (SELECT s, sum(y)::DOUBLE AS np, sum(1 - y)::DOUBLE AS nn FROM t GROUP BY s),
         |c AS (SELECT s, np, nn,
         |    sum(np) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtp,
         |    sum(np + nn) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumpp,
         |    sum(np) OVER () AS ptot
         |  FROM g)
         |SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
         |  count(*)::BIGINT AS n_thresholds,
         |  round(sum(np * cumtp / cumpp) / sum(np), 6) AS average_precision,
         |  round(max(round(2.0 * cumtp / (cumpp + ptot), 6)), 6) AS best_f1
         |FROM c""".stripMargin,
    "spearman" ->
      """WITH b AS (SELECT l_quantity::DOUBLE AS x, floor(l_extendedprice / 1000.0) AS y FROM lineitem),
        |gx AS (SELECT x, count(*)::DOUBLE AS n FROM b GROUP BY x),
        |rx AS (SELECT x, coalesce(sum(n) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (n + 1.0) / 2.0 AS r FROM gx),
        |gy AS (SELECT y, count(*)::DOUBLE AS n FROM b GROUP BY y),
        |ry AS (SELECT y, coalesce(sum(n) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (n + 1.0) / 2.0 AS r FROM gy),
        |j AS (SELECT rx.r AS a, ry.r AS c FROM b JOIN rx USING (x) JOIN ry USING (y)),
        |st AS (SELECT count(*)::DOUBLE AS cn, sum(a) AS sx, sum(c) AS sy,
        |    sum(a * c) AS sxy, sum(a * a) AS sxx, sum(c * c) AS syy FROM j)
        |SELECT cn::BIGINT AS n,
        |  round((cn * sxy - sx * sy) / sqrt((cn * sxx - sx * sx) * (cn * syy - sy * sy)), 6) AS spearman
        |FROM st""".stripMargin,
    "nmi" ->
      """WITH c AS (SELECT lang AS a, source AS b, count(*)::DOUBLE AS n FROM documents GROUP BY 1, 2),
        |t AS (SELECT sum(n) AS tot FROM c),
        |at AS (SELECT a, sum(n) AS na FROM c GROUP BY a),
        |bt AS (SELECT b, sum(n) AS nb FROM c GROUP BY b),
        |mi AS (SELECT sum(c.n / t.tot * ln(c.n * t.tot / (at.na * bt.nb))) AS mi
        |  FROM c JOIN at USING (a) JOIN bt USING (b), t),
        |hs AS (SELECT (SELECT -sum(na / tot * ln(na / tot)) FROM at, t) AS ha,
        |    (SELECT -sum(nb / tot * ln(nb / tot)) FROM bt, t) AS hb)
        |SELECT round(mi, 6) AS mutual_info,
        |  round(mi / sqrt(ha * hb), 6) AS nmi_sqrt,
        |  round(2.0 * mi / (ha + hb), 6) AS nmi_arith
        |FROM mi, hs""".stripMargin,
    "v_measure" ->
      """WITH c AS (SELECT lang AS a, source AS b, count(*)::DOUBLE AS n FROM documents GROUP BY 1, 2),
        |t AS (SELECT sum(n) AS tot FROM c),
        |at AS (SELECT a, sum(n) AS na FROM c GROUP BY a),
        |bt AS (SELECT b, sum(n) AS nb FROM c GROUP BY b),
        |s AS (SELECT -sum(c.n / t.tot * ln(c.n / bt.nb)) AS hcgk,
        |    -sum(c.n / t.tot * ln(c.n / at.na)) AS hkgc,
        |    -sum(c.n / t.tot * ln(c.n / t.tot)) AS hck
        |  FROM c JOIN at USING (a) JOIN bt USING (b), t),
        |hc AS (SELECT (SELECT -sum(na / tot * ln(na / tot)) FROM at, t) AS hcl,
        |    (SELECT -sum(nb / tot * ln(nb / tot)) FROM bt, t) AS hk),
        |fin AS (SELECT
        |    CASE WHEN hcl > 0 THEN 1.0 - hcgk / hcl ELSE 1.0 END AS h,
        |    CASE WHEN hk > 0 THEN 1.0 - hkgc / hk ELSE 1.0 END AS cm,
        |    hcl + hk - hck AS mi FROM s, hc)
        |SELECT round(h, 4) AS homogeneity, round(cm, 4) AS completeness,
        |  round(CASE WHEN h + cm > 0 THEN 2.0 * h * cm / (h + cm) ELSE 0.0 END, 4) AS v_measure,
        |  round(mi, 6) AS mutual_info FROM fin""".stripMargin,
    "silhouette" -> {
      def distSql(i: Int) = s"sqrt(${TabularQueries.centroidDistSql(i)})"
      val aSql = s"CASE WHEN cl = 0 THEN ${distSql(0)} WHEN cl = 1 THEN ${distSql(1)} ELSE ${distSql(2)} END"
      val bSql = s"CASE WHEN cl = 0 THEN least(${distSql(1)}, ${distSql(2)}) " +
        s"WHEN cl = 1 THEN least(${distSql(0)}, ${distSql(2)}) " +
        s"ELSE least(${distSql(0)}, ${distSql(1)}) END"
      s"""WITH t AS (SELECT l_quantity, l_discount, l_tax,
         |    (${TabularQueries.centroidSql}) AS cl FROM lineitem),
         |s AS (SELECT cl, (($bSql) - ($aSql)) / greatest(($aSql), ($bSql)) AS sil FROM t)
         |SELECT cl::BIGINT AS cluster, count(*)::BIGINT AS n,
         |  round(avg(sil), 4) AS mean_silhouette
         |FROM s GROUP BY cl ORDER BY cluster""".stripMargin
    }
  )
}
