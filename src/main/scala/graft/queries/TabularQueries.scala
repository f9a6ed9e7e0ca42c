package graft.queries

import graft.cluster.{DBSCAN, KMeansGraft}
import graft.core.Tables
import graft.core.Num.{r4, r6}
import graft.decomposition.RandomProjection
import graft.linear.{OLS, Ridge}
import graft.metrics.Metrics
import graft.preprocessing.Preprocessing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tabular (lineitem/customer/orders) query surface: linear models,
  * cluster-assignment, 1-D DBSCAN, PCA moments, metrics, preprocessing.
  * Every query here has a DuckDB oracle in [[oracles]].
  */
object TabularQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "linreg_ols" -> { (s, d) =>
      val m = OLS.fit(Tables.lineitem(s, d), Seq("l_quantity"), "l_extendedprice")
      m.toDF(s).select(col("term"),
        when(col("term") === "intercept", round(col("coef"), 2))
          .otherwise(round(col("coef"), 4)).as("coef"))
        .orderBy("term")
    },
    "linreg_multi" -> { (s, d) =>
      val m = OLS.fit(Tables.lineitem(s, d), Seq("l_quantity", "l_discount"), "l_extendedprice")
      m.toDF(s).select(col("term"), round(col("coef"), 2).as("coef")).orderBy("term")
    },
    "ridge" -> { (s, d) =>
      val m = Ridge.fit(Tables.lineitem(s, d), Seq("l_quantity"), "l_extendedprice", 1000.0)
      m.toDF(s).select(col("term"),
        when(col("term") === "intercept", round(col("coef"), 2))
          .otherwise(round(col("coef"), 4)).as("coef"))
        .orderBy("term")
    },
    "ridge_multi" -> { (s, d) =>
      // multi-feature Ridge (same closed form the reference's eig path
      // solves): centered Gram + λI, intercept unpenalized
      val m = Ridge.fit(Tables.lineitem(s, d), Seq("l_quantity", "l_discount"),
        "l_extendedprice", 1000.0)
      m.toDF(s).select(col("term"),
        when(col("term") === "intercept", round(col("coef"), 2))
          .otherwise(round(col("coef"), 4)).as("coef"))
        .orderBy("term")
    },
    "linreg_grouped" -> { (s, d) =>
      // per-group OLS fits in ONE aggregate pass — the grouped-models shape
      // (many small models over a grouped scan) cuML has no distributed
      // answer for
      val li = Tables.lineitem(s, d)
      val slope = covar_pop(col("l_extendedprice"), col("l_quantity")) /
        var_pop(col("l_quantity"))
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n"), r4(slope).as("slope"),
          round(avg(col("l_extendedprice")) - slope * avg(col("l_quantity")), 2).as("intercept"))
        .orderBy("l_returnflag")
    },
    "kmeans_inertia" -> { (s, d) =>
      // KMeans.score()/inertia_ against the broadcast literal model: one
      // codegen scan, per-cluster summed min squared distance
      val li = Tables.lineitem(s, d)
      val feats = Seq(col("l_quantity"), col("l_discount"), col("l_tax"))
      li.select(KMeansGraft.assign(feats, Centroids).as("cluster"),
          KMeansGraft.minSqDist(feats, Centroids).as("d2"))
        .groupBy("cluster")
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("d2")), 0).cast("long").as("inertia"),
          r4(sum(col("d2")) / count(lit(1)).cast("double")).as("mean_sqdist"))
        .orderBy("cluster")
    },
    "kmeans_transform" -> { (s, d) =>
      // KMeans.transform(): the n×k centroid-distance matrix, summarized
      // per assigned cluster (mean distance to every centroid) — the
      // distance columns are pure codegen, the only shuffle is the tiny
      // k-row groupBy
      val li = Tables.lineitem(s, d)
      val feats = Seq(col("l_quantity"), col("l_discount"), col("l_tax"))
      val ds = KMeansGraft.distances(feats, Centroids)
      val sel = KMeansGraft.assign(feats, Centroids).as("cluster") +:
        ds.zipWithIndex.map { case (c, i) => c.as(s"_d$i") }
      li.select(sel: _*)
        .groupBy("cluster")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg(col("_d0"))).as("avg_d0"),
          r4(avg(col("_d1"))).as("avg_d1"),
          r4(avg(col("_d2"))).as("avg_d2"))
        .orderBy("cluster")
    },
    "kmeans_assign" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val cl = KMeansGraft.assign(
        Seq(col("l_quantity"), col("l_discount"), col("l_tax")),
        Centroids)
      li.select(cl.as("cluster"), col("l_quantity"), col("l_extendedprice"))
        .groupBy("cluster")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg("l_quantity")).as("avg_quantity"),
          round(avg("l_extendedprice"), 2).as("avg_price"))
        .orderBy("cluster")
    },
    "dbscan_1d" -> { (s, d) =>
      DBSCAN.oneD(Tables.customer(s, d), "c_custkey", "c_acctbal", 50.0, 3)
        .orderBy("id")
    },
    "pca_cov" -> { (s, d) =>
      // all 6 correlations in ONE aggregate pass, then unpivot
      val li = Tables.lineitem(s, d)
      val fs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for (i <- fs.indices; j <- i + 1 until fs.size) yield (fs(i), fs(j))
      val aggs = pairs.zipWithIndex.map { case ((a, b), k) =>
        corr(col(a), col(b)).as(s"_c$k")
      }
      li.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(pairs.zipWithIndex.map { case ((a, b), k) =>
          struct(lit(a).as("f1"), lit(b).as("f2"), r6(col(s"_c$k")).as("corr"))
        }: _*)).as("s"))
        .select(col("s.f1").as("f1"), col("s.f2").as("f2"), col("s.corr").as("corr"))
        .orderBy("f1", "f2")
    },
    "pca_evd2" -> { (s, d) =>
      Tables.lineitem(s, d)
        .agg(var_samp(col("l_quantity")).as("a"),
          covar_samp(col("l_quantity"), col("l_tax")).as("b"),
          var_samp(col("l_tax")).as("c"))
        .select(
          r6((col("a") + col("c")) / 2 +
            sqrt(pow((col("a") - col("c")) / 2, 2) + pow(col("b"), 2))).as("lambda1"),
          r6((col("a") + col("c")) / 2 -
            sqrt(pow((col("a") - col("c")) / 2, 2) + pow(col("b"), 2))).as("lambda2"))
    },
    "pca_explained_ratio" -> { (s, d) =>
      // explained_variance_ratio_ (pca.pyx exposes it alongside the
      // eigenvalues): λi / Σλ from the same closed-form 2×2 EVD
      Tables.lineitem(s, d)
        .agg(var_samp(col("l_quantity")).as("a"),
          covar_samp(col("l_quantity"), col("l_tax")).as("b"),
          var_samp(col("l_tax")).as("c"))
        .select(
          r6(((col("a") + col("c")) / 2 +
            sqrt(pow((col("a") - col("c")) / 2, 2) + pow(col("b"), 2))) /
            (col("a") + col("c"))).as("ratio1"),
          r6(((col("a") + col("c")) / 2 -
            sqrt(pow((col("a") - col("c")) / 2, 2) + pow(col("b"), 2))) /
            (col("a") + col("c"))).as("ratio2"))
    },
    "pca_transform2" -> { (s, d) =>
      // PCA.transform for the 2-feature case: closed-form PC1 from the
      // 2×2 covariance (driver-side from one aggregate), projection as a
      // codegen'd expression, per-group score stats
      val li = Tables.lineitem(s, d)
      val st = li.agg(var_samp(col("l_quantity")).as("a"),
        covar_samp(col("l_quantity"), col("l_tax")).as("b"),
        var_samp(col("l_tax")).as("c"),
        avg(col("l_quantity")).as("mq"), avg(col("l_tax")).as("mt")).head()
      val (a, b, c, mq, mt) = (st.getDouble(0), st.getDouble(1), st.getDouble(2),
        st.getDouble(3), st.getDouble(4))
      val l1 = (a + c) / 2 + math.sqrt(((a - c) / 2) * ((a - c) / 2) + b * b)
      val w2 = l1 - a
      val nrm = math.sqrt(b * b + w2 * w2)
      val (v1, v2) = (b / nrm, w2 / nrm)
      val score = (col("l_quantity") - mq) * v1 + (col("l_tax") - mt) * v2
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg(score)).as("mean_pc1"),
          r4(stddev_samp(score)).as("sd_pc1"))
        .orderBy("l_returnflag")
    },
    "standard_scale" -> { (s, d) =>
      // feature standardization (the step every estimator here applies
      // internally, exposed as the user-facing preprocessing operator):
      // stats from ONE aggregate, the transform a pure codegen map with
      // literal mean/sd — per-group summary verifies mean→0 / sd→1
      val li = Tables.lineitem(s, d)
      val fs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val aggs = fs.flatMap(c =>
        Seq(avg(col(c)).as(s"_m$c"), stddev_samp(col(c)).as(s"_s$c")))
      val st = li.agg(aggs.head, aggs.tail: _*).head()
      val scaled = fs.zipWithIndex.map { case (c, i) =>
        ((col(c) - st.getDouble(2 * i)) / st.getDouble(2 * i + 1)).as(s"_z$i")
      }
      li.select(col("l_returnflag") +: scaled: _*)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg(col("_z0"))).as("mean_z_qty"), r4(stddev_samp(col("_z0"))).as("sd_z_qty"),
          r4(avg(col("_z1"))).as("mean_z_price"), r4(stddev_samp(col("_z1"))).as("sd_z_price"),
          r4(avg(col("_z2"))).as("mean_z_disc"), r4(stddev_samp(col("_z2"))).as("sd_z_disc"))
        .orderBy("l_returnflag")
    },
    "jl_min_dim" -> { (s, _) =>
      import s.implicits._
      val grid = for (n <- Seq(1000L, 10000L, 100000L, 1000000L);
                      e <- Seq(0.1, 0.2, 0.5))
        yield (n, e, RandomProjection.jlMinDim(n, e))
      grid.toDF("n_samples", "eps", "min_dim").orderBy("n_samples", "eps")
    },
    "r2_score" -> { (s, d) =>
      val li = scaled(Tables.lineitem(s, d))
      Metrics.r2Score(li, col("_y"), col("_p"))
    },
    "mse_mae" -> { (s, d) =>
      val li = scaled(Tables.lineitem(s, d))
      Metrics.regressionErrors(li, col("_y"), col("_p"))
    },
    "accuracy" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      Metrics.accuracy(li, col("l_returnflag"),
        when(col("l_discount") > 0.05, "R").otherwise("N"))
    },
    "adjusted_rand" -> { (s, d) =>
      Metrics.adjustedRand(Tables.documents(s, d), col("lang"), col("source"))
    },
    "label_encoder" -> { (s, d) =>
      Preprocessing.labelEncoderMapping(Tables.customer(s, d), "c_mktsegment")
        .orderBy("code")
    },
    "salted_join" -> { (s, d) =>
      // skew-safe fact⋈dim join (salts=8) — result must be identical to
      // the plain join, which is exactly what the oracle states
      val fact = Tables.orders(s, d)
        .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), col("c_nationkey"))
      graft.core.Salting.saltedJoin(fact, dim, "custkey", "o_orderkey", salts = 8)
        .groupBy(col("c_nationkey").cast("long").as("nation"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("nation")
    },
    "quantile_buckets" -> { (s, d) =>
      // exact audit twin (global-sort ntile — declared; production path
      // is quantile_buckets_approx)
      Preprocessing.quantileBuckets(Tables.orders(s, d), "o_totalprice", "o_orderkey", 10)
    },
    "winsorize" -> { (s, d) =>
      // winsorized mean (the outlier-robust preprocessing step before any
      // moment-based stat): exact p05/p95 fences from the DISTRIBUTED
      // distinct-value cumsum (core.Ranks — no global-sort window), clip
      // as a pure codegen least/greatest scan
      val o = Tables.orders(s, d)
      val qs = graft.core.Ranks.exactQuantilesByValue(o, col("o_totalprice"),
        Seq(0.05, 0.95))
      val lo = lit(qs(0)); val hi = lit(qs(1))
      val w = least(greatest(col("o_totalprice"), lo), hi)
      o.agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("o_totalprice") < lo, 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("o_totalprice") > hi, 1L).otherwise(0L)).as("n_clip_hi"),
        r4(avg(w)).as("win_mean"), r4(avg(col("o_totalprice"))).as("raw_mean"),
        r4(lo).as("lo"), r4(hi).as("hi"))
    },
    "quantile_buckets_approx" -> { (s, d) =>
      // sketch-boundary production path: one aggregate + codegen CASE.
      // PARTIAL HASH GATE (r11): bucket ids + total row count + the
      // spec's per-bucket share bound (|n − N/k| ≤ 10%·N/k + 2) hashed;
      // the sketch boundaries stay engine-internal
      val b = Preprocessing.quantileBucketsApprox(Tables.orders(s, d), "o_totalprice", 10)
      val tot = b.agg(sum(col("n")).cast("double").as("_nt"))
      b.crossJoin(broadcast(tot))
        .select(col("bucket"), col("_nt").cast("long").as("n_total"),
          (abs(col("n") - col("_nt") / 10) <= col("_nt") / 10 * 0.10 + 2)
            .as("share_close"))
        .orderBy("bucket")
    },
    "train_test_split" -> { (s, d) =>
      Preprocessing.trainTestSplit(Tables.orders(s, d), "o_orderkey", 0.25)
        .groupBy("split")
        .agg(count(lit(1)).cast("long").as("n"), r4(avg("o_totalprice")).as("avg_price"))
        .orderBy("split")
    },
    "kfold_cv" -> { (s, d) =>
      // k-fold CV of closed-form OLS: per-fold sufficient stats from ONE
      // groupBy, leave-one-fold-out train stats = global − fold (algebra
      // on the k-row frame), validation scoring joins the broadcast k-row
      // coefficients back — k models for one scan + one scoring pass
      graft.linear.CrossVal.kFoldOLS(Tables.lineitem(s, d), "l_quantity",
        col("l_extendedprice") / 1000.0,
        concat_ws("_", col("l_orderkey"), col("l_linenumber"), lit("cv")), k = 5)
    },
    "minmax_scale" -> { (s, d) =>
      // MinMaxScaler semantics: range stats from ONE aggregate, transform
      // a literal-stat pure codegen map (standard_scale's twin)
      val li = Tables.lineitem(s, d)
      val fs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val aggs = fs.flatMap(c => Seq(min(col(c)).as(s"_lo$c"), max(col(c)).as(s"_hi$c")))
      val st = li.agg(aggs.head, aggs.tail: _*).head()
      val scaled = fs.zipWithIndex.map { case (c, i) =>
        val (lo, hi) = (st.getDouble(2 * i), st.getDouble(2 * i + 1))
        ((col(c) - lo) / (hi - lo)).as(s"_z$i")
      }
      li.select(col("l_returnflag") +: scaled: _*)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg(col("_z0"))).as("mean_z_qty"),
          r4(min(col("_z0"))).as("min_z_qty"), r4(max(col("_z0"))).as("max_z_qty"),
          r4(avg(col("_z1"))).as("mean_z_price"),
          r4(avg(col("_z2"))).as("mean_z_disc"))
        .orderBy("l_returnflag")
    },
    "one_hot" -> { (s, d) =>
      // one-hot encode c_mktsegment over the FIXED category vocabulary
      // (the 5 TPC-H segments — fixed-vocabulary encode, the form that
      // scales: no distinct-scan, pure codegen indicator columns); summary
      // = per-nation indicator sums
      val cust = Tables.customer(s, d)
      val indicators = Segments.map(seg =>
        sum(when(col("c_mktsegment") === seg, 1L).otherwise(0L))
          .as("n_" + seg.toLowerCase))
      cust.groupBy(col("c_nationkey").cast("long").as("nation"))
        .agg(count(lit(1)).cast("long").as("n"), indicators: _*)
        .orderBy("nation")
    },
    "ridge_cv" -> { (s, d) =>
      // hyperparameter search at scale: k folds × 3 lambdas, all 15
      // closed-form ridge models from ONE sufficient-stats pass, scored in
      // ONE more scan (each row evaluates its fold's 3 candidates as
      // codegen columns); winner by rounded CV mean MSE
      graft.linear.CrossVal.ridgeCV(Tables.lineitem(s, d), "l_quantity",
        col("l_extendedprice") / 1000.0,
        concat_ws("_", col("l_orderkey"), col("l_linenumber"), lit("cv")),
        k = 5, lambdas = Seq(0.1, 100.0, 100000.0))
    },
    "robust_scale" -> { (s, d) =>
      // RobustScaler semantics: (x − median)/IQR with exact rank-select
      // quartiles (the audit twin — the production path at scale is the
      // percentile_approx sketch, cf quantile_buckets_approx); transform
      // is a literal-stat codegen map like standard_scale. Quartiles come
      // from the bounded distinct-value frame (r12: the raw-row global
      // sort window collapsed lineitem into one task — 9.7× at 10× data)
      val li = Tables.lineitem(s, d)
      val Seq(q1, med, q3) = graft.core.Ranks.exactQuantilesByValue(
        li, col("l_quantity"), Seq(0.25, 0.5, 0.75))
      val z = (col("l_quantity") - med) / (q3 - q1)
      li.groupBy("l_returnflag")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg(z)).as("mean_z"), r4(min(z)).as("min_z"), r4(max(z)).as("max_z"))
        .orderBy("l_returnflag")
    },
    "target_encode" -> { (s, d) =>
      // mean-target encoding with additive smoothing (m = 50):
      // enc(seg) = (Σ y_seg + m·μ)/(n_seg + m) — category from the dim
      // join, then ONE groupBy on the bounded segment key; μ is a
      // broadcast scalar
      val o = Tables.orders(s, d)
        .select(col("o_custkey").as("custkey"), col("o_totalprice").as("y"))
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("custkey"), col("c_mktsegment").as("segment"))
      val joined = o.join(c, "custkey")
      val mu = joined.agg(avg(col("y"))).head().getDouble(0)
      joined.groupBy("segment")
        .agg(count(lit(1)).cast("long").as("n"),
          round((sum(col("y")) + lit(50.0) * mu) / (count(lit(1)) + lit(50.0)), 2).as("enc"),
          round(avg(col("y")), 2).as("raw_mean"))
        .orderBy("segment")
    },
    "poly_features" -> { (s, d) =>
      // PolynomialFeatures degree-2 expansion of (quantity, discount) —
      // generated columns are pure codegen; summary = means + correlation
      // of each generated feature with the price target
      val li = Tables.lineitem(s, d)
      val q = col("l_quantity"); val dc = col("l_discount"); val y = col("l_extendedprice")
      li.agg(
        r4(avg(q * q)).as("mean_q2"),
        r4(avg(q * dc)).as("mean_qd"),
        r6(avg(dc * dc)).as("mean_d2"),
        r6(corr(q * q, y)).as("corr_q2_y"),
        r6(corr(q * dc, y)).as("corr_qd_y"),
        r6(corr(dc * dc, y)).as("corr_d2_y"))
    }
  )

  /** Fixed one-hot vocabulary (the 5 TPC-H market segments). */
  private[queries] val Segments: Seq[String] =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  val Centroids: Seq[Seq[Double]] =
    Seq(Seq(10.0, 0.02, 0.02), Seq(25.0, 0.05, 0.04), Seq(40.0, 0.08, 0.06))

  /** Shared synthetic y/pred (scaled to keep metric magnitudes round-safe).
    * The expression tree matches the oracle SQL exactly so both engines
    * produce bit-identical per-row doubles. */
  private def scaled(li: DataFrame): DataFrame =
    li.select((col("l_extendedprice") / 1000.0).as("_y"),
      (lit(0.3) + col("l_quantity") * 7.16 * (lit(1.0) - col("l_discount")) / 1000.0).as("_p"))

  /** Squared distance to Centroids(i) as SQL (shared by the assignment /
    * inertia / transform oracles). */
  private[queries] def centroidDistSql(i: Int): String = {
    val c = Centroids(i)
    s"((l_quantity-(${c(0)}))*(l_quantity-(${c(0)})) + (l_discount-(${c(1)}))*(l_discount-(${c(1)})) + (l_tax-(${c(2)}))*(l_tax-(${c(2)})))"
  }

  private[queries] val centroidSql: String = {
    def dist(i: Int) = centroidDistSql(i)
    s"CASE WHEN ${dist(0)} <= ${dist(1)} AND ${dist(0)} <= ${dist(2)} THEN 0 " +
      s"WHEN ${dist(1)} <= ${dist(2)} THEN 1 ELSE 2 END"
  }

  val oracles: Map[String, String] = Map(
    "linreg_ols" ->
      """SELECT term, coef FROM (
        |  SELECT 'intercept' AS term, round(regr_intercept(l_extendedprice, l_quantity), 2) AS coef FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', round(regr_slope(l_extendedprice, l_quantity), 4) FROM lineitem
        |) ORDER BY term""".stripMargin,
    "linreg_multi" ->
      """WITH s AS (SELECT count(*)::DOUBLE n, sum(l_quantity) sx1, sum(l_discount) sx2,
        |  sum(l_quantity*l_quantity) s11, sum(l_quantity*l_discount) s12, sum(l_discount*l_discount) s22,
        |  sum(l_extendedprice) sy, sum(l_quantity*l_extendedprice) s1y, sum(l_discount*l_extendedprice) s2y
        |  FROM lineitem),
        |d AS (SELECT
        |  n*(s11*s22-s12*s12) - sx1*(sx1*s22-s12*sx2) + sx2*(sx1*s12-s11*sx2) AS det,
        |  sy*(s11*s22-s12*s12) - sx1*(s1y*s22-s12*s2y) + sx2*(s1y*s12-s11*s2y) AS det0,
        |  n*(s1y*s22-s12*s2y) - sy*(sx1*s22-s12*sx2) + sx2*(sx1*s2y-s1y*sx2) AS det1,
        |  n*(s11*s2y-s1y*s12) - sx1*(sx1*s2y-s1y*sx2) + sy*(sx1*s12-s11*sx2) AS det2
        |  FROM s)
        |SELECT term, coef FROM (
        |  SELECT 'intercept' AS term, round(det0/det, 2) AS coef FROM d
        |  UNION ALL SELECT 'l_quantity', round(det1/det, 2) FROM d
        |  UNION ALL SELECT 'l_discount', round(det2/det, 2) FROM d
        |) ORDER BY term""".stripMargin,
    "ridge" ->
      """WITH s AS (SELECT count(*)::DOUBLE n, sum(l_quantity) sx, sum(l_extendedprice) sy,
        |  sum(l_quantity*l_quantity) sxx, sum(l_quantity*l_extendedprice) sxy FROM lineitem),
        |w AS (SELECT (sxy - sx*sy/n)/((sxx - sx*sx/n) + 1000.0) AS slope, sy/n AS ybar, sx/n AS xbar FROM s)
        |SELECT term, coef FROM (
        |  SELECT 'intercept' AS term, round(ybar - slope*xbar, 2) AS coef FROM w
        |  UNION ALL SELECT 'l_quantity', round(slope, 4) FROM w
        |) ORDER BY term""".stripMargin,
    "ridge_multi" ->
      """WITH s AS (SELECT count(*)::DOUBLE n,
        |    sum(l_quantity) s1, sum(l_discount) s2, sum(l_extendedprice) sy,
        |    sum(l_quantity*l_quantity) s11, sum(l_quantity*l_discount) s12,
        |    sum(l_discount*l_discount) s22,
        |    sum(l_quantity*l_extendedprice) s1y, sum(l_discount*l_extendedprice) s2y
        |  FROM lineitem),
        |c AS (SELECT n, s1, s2, sy,
        |    s11 - s1*s1/n + 1000.0 AS a, s12 - s1*s2/n AS b, s22 - s2*s2/n + 1000.0 AS cc,
        |    s1y - s1*sy/n AS r1, s2y - s2*sy/n AS r2 FROM s),
        |w AS (SELECT n, s1, s2, sy,
        |    (r1*cc - b*r2) / (a*cc - b*b) AS w1,
        |    (a*r2 - b*r1) / (a*cc - b*b) AS w2 FROM c)
        |SELECT term, coef FROM (
        |  SELECT 'intercept' AS term, round(sy/n - w1*s1/n - w2*s2/n, 2) AS coef FROM w
        |  UNION ALL SELECT 'l_quantity', round(w1, 4) FROM w
        |  UNION ALL SELECT 'l_discount', round(w2, 4) FROM w
        |) ORDER BY term""".stripMargin,
    "linreg_grouped" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "kmeans_inertia" -> {
      val minD = s"least(${centroidDistSql(0)}, ${centroidDistSql(1)}, ${centroidDistSql(2)})"
      s"""SELECT $centroidSql AS cluster, count(*)::BIGINT AS n,
         |  round(sum($minD), 0)::BIGINT AS inertia,
         |  round(sum($minD) / count(*)::DOUBLE, 4) AS mean_sqdist
         |FROM lineitem GROUP BY 1 ORDER BY cluster""".stripMargin
    },
    "kmeans_transform" ->
      s"""SELECT $centroidSql AS cluster, count(*)::BIGINT AS n,
         |  round(avg(sqrt(${centroidDistSql(0)})), 4) AS avg_d0,
         |  round(avg(sqrt(${centroidDistSql(1)})), 4) AS avg_d1,
         |  round(avg(sqrt(${centroidDistSql(2)})), 4) AS avg_d2
         |FROM lineitem GROUP BY 1 ORDER BY cluster""".stripMargin,
    "kmeans_assign" ->
      s"""SELECT $centroidSql AS cluster, count(*)::BIGINT AS n,
         |  round(avg(l_quantity), 4) AS avg_quantity, round(avg(l_extendedprice), 2) AS avg_price
         |FROM lineitem GROUP BY 1 ORDER BY cluster""".stripMargin,
    "dbscan_1d" ->
      """WITH b AS (SELECT c_custkey::BIGINT id, CAST(round(c_acctbal*100) AS BIGINT) v,
        |    count(*) OVER (ORDER BY CAST(round(c_acctbal*100) AS BIGINT)
        |                   RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) n_nbr
        |  FROM customer),
        |c AS (SELECT id, v, (n_nbr >= 3) AS is_core FROM b),
        |cl AS (SELECT id, (sum(CASE WHEN gap IS NULL OR gap > 5000 THEN 1 ELSE 0 END)
        |         OVER (ORDER BY v, id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)::BIGINT AS cluster
        |  FROM (SELECT id, v, v - lag(v) OVER (ORDER BY v, id) AS gap FROM c WHERE is_core))
        |SELECT c.id AS id, round(c.v/100.0, 4) AS value, c.is_core AS is_core,
        |  coalesce(cl.cluster, -1)::BIGINT AS cluster
        |FROM c LEFT JOIN cl ON c.id = cl.id ORDER BY id""".stripMargin,
    "pca_cov" ->
      """SELECT f1, f2, "corr" FROM (
        |  SELECT 'l_quantity' AS f1, 'l_extendedprice' AS f2, round(corr(l_quantity, l_extendedprice), 6) AS "corr" FROM lineitem
        |  UNION ALL SELECT 'l_quantity', 'l_discount', round(corr(l_quantity, l_discount), 6) FROM lineitem
        |  UNION ALL SELECT 'l_quantity', 'l_tax', round(corr(l_quantity, l_tax), 6) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount', round(corr(l_extendedprice, l_discount), 6) FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax', round(corr(l_extendedprice, l_tax), 6) FROM lineitem
        |  UNION ALL SELECT 'l_discount', 'l_tax', round(corr(l_discount, l_tax), 6) FROM lineitem
        |) ORDER BY f1, f2""".stripMargin,
    "pca_evd2" ->
      """WITH s AS (SELECT var_samp(l_quantity) a, covar_samp(l_quantity, l_tax) b, var_samp(l_tax) c FROM lineitem)
        |SELECT round((a+c)/2 + sqrt(((a-c)/2)*((a-c)/2) + b*b), 6) AS lambda1,
        |       round((a+c)/2 - sqrt(((a-c)/2)*((a-c)/2) + b*b), 6) AS lambda2 FROM s""".stripMargin,
    "pca_explained_ratio" ->
      """WITH s AS (SELECT var_samp(l_quantity) a, covar_samp(l_quantity, l_tax) b, var_samp(l_tax) c FROM lineitem)
        |SELECT round(((a+c)/2 + sqrt(((a-c)/2)*((a-c)/2) + b*b)) / (a+c), 6) AS ratio1,
        |       round(((a+c)/2 - sqrt(((a-c)/2)*((a-c)/2) + b*b)) / (a+c), 6) AS ratio2 FROM s""".stripMargin,
    "pca_transform2" ->
      """WITH s AS (SELECT var_samp(l_quantity) a, covar_samp(l_quantity, l_tax) b,
        |    var_samp(l_tax) c, avg(l_quantity) mq, avg(l_tax) mt FROM lineitem),
        |ev AS (SELECT a, b, c, mq, mt,
        |    (a+c)/2 + sqrt(((a-c)/2)*((a-c)/2) + b*b) AS l1 FROM s),
        |vv AS (SELECT mq, mt, b / sqrt(b*b + (l1-a)*(l1-a)) AS v1,
        |    (l1-a) / sqrt(b*b + (l1-a)*(l1-a)) AS v2 FROM ev)
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(avg((l_quantity - mq)*v1 + (l_tax - mt)*v2), 4) AS mean_pc1,
        |  round(stddev_samp((l_quantity - mq)*v1 + (l_tax - mt)*v2), 4) AS sd_pc1
        |FROM lineitem, vv GROUP BY l_returnflag, mq, mt, v1, v2 ORDER BY l_returnflag""".stripMargin,
    "standard_scale" ->
      """WITH st AS (SELECT avg(l_quantity) mq, stddev_samp(l_quantity) sq,
        |    avg(l_extendedprice) mp, stddev_samp(l_extendedprice) sp,
        |    avg(l_discount) md, stddev_samp(l_discount) sd FROM lineitem)
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(avg((l_quantity - mq) / sq), 4) AS mean_z_qty,
        |  round(stddev_samp((l_quantity - mq) / sq), 4) AS sd_z_qty,
        |  round(avg((l_extendedprice - mp) / sp), 4) AS mean_z_price,
        |  round(stddev_samp((l_extendedprice - mp) / sp), 4) AS sd_z_price,
        |  round(avg((l_discount - md) / sd), 4) AS mean_z_disc,
        |  round(stddev_samp((l_discount - md) / sd), 4) AS sd_z_disc
        |FROM lineitem, st GROUP BY l_returnflag, mq, sq, mp, sp, md, sd
        |ORDER BY l_returnflag""".stripMargin,
    "jl_min_dim" ->
      """SELECT n_samples::BIGINT AS n_samples, eps::DOUBLE AS eps,
        |  CAST(ceil(4.0 * ln(n_samples) / (eps*eps/2 - eps*eps*eps/3)) AS BIGINT) AS min_dim
        |FROM (VALUES (1000, 0.1), (1000, 0.2), (1000, 0.5),
        |             (10000, 0.1), (10000, 0.2), (10000, 0.5),
        |             (100000, 0.1), (100000, 0.2), (100000, 0.5),
        |             (1000000, 0.1), (1000000, 0.2), (1000000, 0.5)) AS t(n_samples, eps)
        |ORDER BY n_samples, eps""".stripMargin,
    "r2_score" ->
      """WITH t AS (SELECT l_extendedprice/1000.0 AS y,
        |    0.3 + l_quantity*7.16*(1.0-l_discount)/1000.0 AS p FROM lineitem)
        |SELECT round(1.0 - sum((y-p)*(y-p)) / (sum(y*y) - sum(y)*sum(y)/count(*)), 4) AS r2 FROM t""".stripMargin,
    "mse_mae" ->
      """WITH t AS (SELECT l_extendedprice/1000.0 AS y,
        |    0.3 + l_quantity*7.16*(1.0-l_discount)/1000.0 AS p FROM lineitem)
        |SELECT round(avg((y-p)*(y-p)), 4) AS mse, round(sqrt(avg((y-p)*(y-p))), 4) AS rmse,
        |  round(avg(abs(y-p)), 4) AS mae FROM t""".stripMargin,
    "accuracy" ->
      """SELECT round(avg(CASE WHEN l_returnflag = (CASE WHEN l_discount > 0.05 THEN 'R' ELSE 'N' END)
        |  THEN 1.0 ELSE 0.0 END), 4) AS accuracy FROM lineitem""".stripMargin,
    "adjusted_rand" ->
      """WITH c AS (SELECT lang, source, count(*)::DOUBLE n FROM documents GROUP BY 1, 2),
        |t AS (SELECT (SELECT sum(n) FROM c) AS tot, (SELECT sum(n*(n-1)/2) FROM c) AS sij,
        |  (SELECT sum(m*(m-1)/2) FROM (SELECT sum(n) m FROM c GROUP BY lang)) AS sa,
        |  (SELECT sum(m*(m-1)/2) FROM (SELECT sum(n) m FROM c GROUP BY source)) AS sb)
        |SELECT round((sij - sa*sb/(tot*(tot-1)/2)) / ((sa+sb)/2 - sa*sb/(tot*(tot-1)/2)), 4) AS ari FROM t""".stripMargin,
    "label_encoder" ->
      """SELECT label, (dense_rank() OVER (ORDER BY label) - 1)::BIGINT AS code
        |FROM (SELECT DISTINCT c_mktsegment AS label FROM customer) ORDER BY code""".stripMargin,
    "salted_join" ->
      """SELECT c.c_nationkey::BIGINT AS nation, count(*)::BIGINT AS n_orders,
        |  round(sum(o.o_totalprice), 2) AS total
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "winsorize" ->
      """WITH g AS (SELECT o_totalprice AS v, count(*) AS c FROM orders GROUP BY v),
        |cum AS (SELECT v, sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
        |  sum(c) OVER () AS tot FROM g),
        |q AS (SELECT min(CASE WHEN cs >= ceil(tot * 0.05) THEN v END) AS lo,
        |    min(CASE WHEN cs >= ceil(tot * 0.95) THEN v END) AS hi FROM cum)
        |SELECT count(*)::BIGINT AS n,
        |  sum(CASE WHEN o_totalprice < q.lo THEN 1 ELSE 0 END)::BIGINT AS n_clip_lo,
        |  sum(CASE WHEN o_totalprice > q.hi THEN 1 ELSE 0 END)::BIGINT AS n_clip_hi,
        |  round(avg(least(greatest(o_totalprice, q.lo), q.hi)), 4) AS win_mean,
        |  round(avg(o_totalprice), 4) AS raw_mean,
        |  round(max(q.lo), 4) AS lo, round(max(q.hi), 4) AS hi
        |FROM orders, q""".stripMargin,
    "quantile_buckets" ->
      """WITH b AS (SELECT o_totalprice AS v,
        |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket FROM orders)
        |SELECT bucket::BIGINT AS bucket, count(*)::BIGINT AS n,
        |  round(min(v), 4) AS lo, round(max(v), 4) AS hi, round(avg(v), 4) AS mean
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    // sketch-bucket partial gate: bucket ids + total + per-bucket share
    // bound booleans (boundaries stay engine-internal)
    "quantile_buckets_approx" ->
      """SELECT g.i::BIGINT AS bucket, (SELECT count(*) FROM orders)::BIGINT AS n_total,
        |  TRUE AS share_close
        |FROM generate_series(1, 10) g(i) ORDER BY bucket""".stripMargin,
    "train_test_split" ->
      """SELECT CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
        |  THEN 'test' ELSE 'train' END AS split,
        |  count(*)::BIGINT AS n, round(avg(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY split""".stripMargin,
    "kfold_cv" ->
      """WITH r AS (SELECT
        |    ('0x' || substr(md5(l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR || '_cv'), 1, 15))::BIGINT % 5 AS fold,
        |    l_quantity AS x, l_extendedprice / 1000.0 AS y FROM lineitem),
        |pf AS (SELECT fold, count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy FROM r GROUP BY fold),
        |g AS (SELECT sum(n) AS gn, sum(sx) AS gsx, sum(sy) AS gsy,
        |    sum(sxx) AS gsxx, sum(sxy) AS gsxy FROM pf),
        |t AS (SELECT fold, n, gn - n AS tn, gsx - sx AS tsx, gsy - sy AS tsy,
        |    gsxx - sxx AS tsxx, gsxy - sxy AS tsxy FROM pf, g),
        |c AS (SELECT fold, n, tn,
        |    (tsxy - tsx*tsy/tn) / (tsxx - tsx*tsx/tn) AS slope,
        |    tsy/tn - (tsxy - tsx*tsy/tn) / (tsxx - tsx*tsx/tn) * tsx/tn AS icpt
        |  FROM t)
        |SELECT c.fold::BIGINT AS fold, c.tn::BIGINT AS n_train, count(*)::BIGINT AS n_val,
        |  round(c.slope, 4) AS slope, round(c.icpt, 4) AS intercept,
        |  round(avg(power(r.y - (c.icpt + c.slope * r.x), 2)), 4) AS val_mse
        |FROM r JOIN c ON r.fold = c.fold
        |GROUP BY c.fold, c.tn, c.slope, c.icpt ORDER BY fold""".stripMargin,
    "minmax_scale" ->
      """WITH st AS (SELECT min(l_quantity) loq, max(l_quantity) hiq,
        |    min(l_extendedprice) lop, max(l_extendedprice) hip,
        |    min(l_discount) lod, max(l_discount) hid FROM lineitem)
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(avg((l_quantity - loq) / (hiq - loq)), 4) AS mean_z_qty,
        |  round(min((l_quantity - loq) / (hiq - loq)), 4) AS min_z_qty,
        |  round(max((l_quantity - loq) / (hiq - loq)), 4) AS max_z_qty,
        |  round(avg((l_extendedprice - lop) / (hip - lop)), 4) AS mean_z_price,
        |  round(avg((l_discount - lod) / (hid - lod)), 4) AS mean_z_disc
        |FROM lineitem, st GROUP BY l_returnflag, loq, hiq, lop, hip, lod, hid
        |ORDER BY l_returnflag""".stripMargin,
    "one_hot" -> {
      val sums = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
        .map(seg => s"  sum(CASE WHEN c_mktsegment = '$seg' THEN 1 ELSE 0 END)::BIGINT AS n_${seg.toLowerCase}")
        .mkString(",\n")
      s"""SELECT c_nationkey::BIGINT AS nation, count(*)::BIGINT AS n,
         |$sums
         |FROM customer GROUP BY 1 ORDER BY nation""".stripMargin
    },
    "ridge_cv" ->
      """WITH r AS (SELECT
        |    ('0x' || substr(md5(l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR || '_cv'), 1, 15))::BIGINT % 5 AS fold,
        |    l_quantity AS x, l_extendedprice / 1000.0 AS y FROM lineitem),
        |pf AS (SELECT fold, count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy FROM r GROUP BY fold),
        |g AS (SELECT sum(n) AS gn, sum(sx) AS gsx, sum(sy) AS gsy,
        |    sum(sxx) AS gsxx, sum(sxy) AS gsxy FROM pf),
        |t AS (SELECT fold, gn - n AS tn, gsx - sx AS tsx, gsy - sy AS tsy,
        |    gsxx - sxx AS tsxx, gsxy - sxy AS tsxy FROM pf, g),
        |lam AS (SELECT unnest([0.1, 100.0, 100000.0]) AS lambda),
        |c AS (SELECT fold, lambda,
        |    (tsxy - tsx*tsy/tn) / (tsxx - tsx*tsx/tn + lambda) AS slope,
        |    tsy/tn - (tsxy - tsx*tsy/tn) / (tsxx - tsx*tsx/tn + lambda) * tsx/tn AS icpt
        |  FROM t, lam),
        |fe AS (SELECT c.lambda, c.fold,
        |    sum(power(r.y - (c.icpt + c.slope * r.x), 2)) / count(*) AS fold_mse
        |  FROM r JOIN c ON r.fold = c.fold GROUP BY c.lambda, c.fold),
        |sc AS (SELECT lambda, round(avg(fold_mse), 4) AS mean_val_mse FROM fe GROUP BY lambda)
        |SELECT lambda, mean_val_mse,
        |  row_number() OVER (ORDER BY mean_val_mse, lambda) = 1 AS best
        |FROM sc ORDER BY lambda""".stripMargin,
    "robust_scale" ->
      """WITH r AS (SELECT l_quantity AS v, row_number() OVER (ORDER BY l_quantity) AS rn,
        |    count(*) OVER () AS n FROM lineitem),
        |st AS (SELECT max(CASE WHEN rn = ceil(n * 0.25) THEN v END) AS q1,
        |    max(CASE WHEN rn = ceil(n * 0.5) THEN v END) AS med,
        |    max(CASE WHEN rn = ceil(n * 0.75) THEN v END) AS q3 FROM r)
        |SELECT l_returnflag, count(*)::BIGINT AS n,
        |  round(avg((l_quantity - med) / (q3 - q1)), 4) AS mean_z,
        |  round(min((l_quantity - med) / (q3 - q1)), 4) AS min_z,
        |  round(max((l_quantity - med) / (q3 - q1)), 4) AS max_z
        |FROM lineitem, st GROUP BY l_returnflag, med, q1, q3
        |ORDER BY l_returnflag""".stripMargin,
    "target_encode" ->
      """WITH j AS (SELECT o.o_totalprice AS y, c.c_mktsegment AS segment
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT avg(y) AS mu FROM j)
        |SELECT segment, count(*)::BIGINT AS n,
        |  round((sum(y) + 50.0 * mu) / (count(*) + 50.0), 2) AS enc,
        |  round(avg(y), 2) AS raw_mean
        |FROM j, g GROUP BY segment, mu ORDER BY segment""".stripMargin,
    "poly_features" ->
      """SELECT
        |  round(avg(l_quantity*l_quantity), 4) AS mean_q2,
        |  round(avg(l_quantity*l_discount), 4) AS mean_qd,
        |  round(avg(l_discount*l_discount), 6) AS mean_d2,
        |  round(corr(l_quantity*l_quantity, l_extendedprice), 6) AS corr_q2_y,
        |  round(corr(l_quantity*l_discount, l_extendedprice), 6) AS corr_qd_y,
        |  round(corr(l_discount*l_discount, l_extendedprice), 6) AS corr_d2_y
        |FROM lineitem""".stripMargin
  )
}
