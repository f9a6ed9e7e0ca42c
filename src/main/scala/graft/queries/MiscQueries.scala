package graft.queries

import graft.cluster.DBSCANGrid
import graft.core.Tables
import graft.core.Num.{r4, r6}
import graft.decomposition.RandomProjection
import graft.metrics.Trustworthiness
import graft.neighbors.IVF
import graft.preprocessing.{Datasets, Preprocessing}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2-planned operators delivered in round 1: 2-D DBSCAN, IVF ANN,
  * trustworthiness, deterministic dataset generators. */
object MiscQueries {
  type Q = (SparkSession, String) => DataFrame

  val BlobCenters: Seq[(Double, Double)] = Seq((0.0, 0.0), (10.0, 10.0), (-10.0, 10.0))

  val queries: Map[String, Q] = Map(
    "hbos_outlier" -> { (s, d) =>
      // Histogram-Based Outlier Score over three lineitem features —
      // the linear-time density outlier detector: the 10-bin histograms
      // ARE the model (O(features·bins), corpus-independent), scoring is
      // one broadcast-join scan. Full hash gate: every occupied bin's
      // mass/term plus the corpus outlier count replay exactly in SQL
      graft.stats.Outliers.hbos(Tables.lineitem(s, d),
        Seq("qty" -> col("l_quantity"), "price" -> col("l_extendedprice"),
          "disc" -> col("l_discount")),
        bins = 10, threshold = 9.0)
    },
    "conformal_interval" -> { (s, d) =>
      // split conformal regression (price ~ quantity): md5 train/calib/
      // test split, closed-form OLS, q̂ = the ⌈(n+1)(1−α)⌉-th smallest
      // calibration |residual| by DISTRIBUTED rank-select, coverage on
      // the held-out slice — the distribution-free interval with the
      // finite-sample ≥ 1−α guarantee. Full hash gate
      graft.stats.Conformal.splitConformal(Tables.lineitem(s, d),
        concat_ws("_", col("l_orderkey"), col("l_linenumber")),
        col("l_quantity"), col("l_extendedprice"), alpha = 0.1)
    },
    "bloom_join" -> { (s, d) =>
      // Bloom-filter runtime join filter: high-value orders' key set as a
      // constant-size (2^18-slot) broadcast bit table; lineitem probes
      // pass through k=3 chained broadcast semi-joins (zero pre-join
      // shuffle), survivors verified exactly. Full hash gate incl. the
      // realized FP rate
      val hi = Tables.orders(s, d).filter(col("o_totalprice") > 150000)
      graft.joins.RuntimeFilter.bloomJoinAudit(
        hi, col("o_orderkey"), Tables.lineitem(s, d), col("l_orderkey"))
    },
    "dbscan" -> { (s, d) =>
      // 2-D DBSCAN over (value, scaled user bucket) on events. PARTIAL
      // HASH GATE (r11): clustered/noise/core counts replay exactly in
      // DuckDB (the coreSummary machinery); the CC's cluster count is
      // gated to its exact bounds, labels stay parity-spec-gated
      val pts = Tables.events(s, d).select(col("event_id"),
        col("value").as("x"), (col("user_id") % 97).cast("double").as("y"))
      DBSCANGrid.summaryGate(pts, "event_id", Seq("x", "y"), eps = 1.0, minPts = 4)
    },
    "dbscan_core" -> { (s, d) =>
      // the family's hash gate: core/border/noise classification and the
      // eps-pair count are closed-form (no CC), so the same coarse-cell
      // candidate machinery replays exactly in DuckDB
      val pts = Tables.events(s, d).select(col("event_id"),
        col("value").as("x"), (col("user_id") % 97).cast("double").as("y"))
      DBSCANGrid.coreSummary(pts, "event_id", Seq("x", "y"), eps = 1.0, minPts = 4)
    },
    "dbscan_3d" -> { (s, d) =>
      // 3-D DBSCAN over (value, scaled user bucket, hour-of-day) on
      // events. PARTIAL HASH GATE (r11): same structure-slice gate as
      // dbscan — the oracle re-derives the exact 3-D eps-pair set with
      // 1-axis blocking (any exact blocking yields the same verified
      // pairs), so core/clustered/noise counts hash-match
      val pts = Tables.events(s, d).select(col("event_id"),
        col("value").as("x"), (col("user_id") % 97).cast("double").as("y"),
        (hour(col("ts")) / lit(2.0)).as("z"))
      DBSCANGrid.summaryGate(pts, "event_id", Seq("x", "y", "z"),
        eps = 1.0, minPts = 4)
    },
    "range_join" -> { (s, d) =>
      // band join: customers matched to supplier account-balance bands
      // (±50) via the bucketized equi-join — summary row
      val supp = Tables.supplier(s, d).select(col("s_suppkey"),
        (col("s_acctbal") - 50).as("lo"), (col("s_acctbal") + 50).as("hi"))
      graft.events.RangeJoin.pointInInterval(Tables.customer(s, d), supp,
          "c_custkey", "c_acctbal", "s_suppkey", "lo", "hi", bucketWidth = 100.0)
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          countDistinct(col("id")).cast("long").as("n_points"),
          countDistinct(col("rid")).cast("long").as("n_intervals"),
          r4(avg(col("point"))).as("avg_point"))
    },
    "cem_att" -> { (s, d) =>
      // coarsened exact matching ATT (the causal estimate after binning
      // confounders and matching treated to control INSIDE each bin —
      // Iacus/King/Porro): strata = (priority, price decile-by-width),
      // treatment = the md5 arm; ATT = treated-count-weighted mean of
      // within-stratum outcome differences over strata with BOTH groups;
      // two grouped aggregates, no row-level matching join
      val o = Tables.orders(s, d)
      val treat = Preprocessing.splitColumn(col("o_orderkey"), 500, 42L) === "train"
      val y = (col("o_orderstatus") === "F").cast("double")
      val bin = least(floor(col("o_totalprice") / 50000.0), lit(9.0)).cast("long")
      val strata = o.groupBy(col("o_orderpriority").as("_p"), bin.as("_b"))
        .agg(sum(when(treat, 1.0).otherwise(0.0)).as("_nt"),
          sum(when(treat, y).otherwise(0.0)).as("_st"),
          sum(when(!treat, 1.0).otherwise(0.0)).as("_nc"),
          sum(when(!treat, y).otherwise(0.0)).as("_sc"))
        .filter(col("_nt") > 0.0 && col("_nc") > 0.0)
      strata.agg(count(lit(1)).cast("long").as("n_strata"),
          sum(col("_nt")).cast("long").as("n_treated_matched"),
          r4(sum(col("_nt") * (col("_st") / col("_nt") - col("_sc") / col("_nc"))) /
            sum(col("_nt"))).as("att"))
    },
    "reg_discontinuity" -> { (s, d) =>
      // sharp regression discontinuity at a totalprice cutoff: local
      // linear fits on each side within the bandwidth (closed-form OLS
      // from ONE conditional-sums aggregate), effect = right-limit −
      // left-limit at the cutoff — the quasi-experimental readout when
      // assignment is a threshold rule
      val o = Tables.orders(s, d)
      val cut = 200000.0; val bw = 100000.0
      val x = col("o_totalprice") - cut
      val y = (col("o_orderstatus") === "F").cast("double")
      val inL = x >= -bw && x < 0.0
      val inR = x >= 0.0 && x <= bw
      def side(f: Column, tag: String) = Seq(
        sum(when(f, 1.0).otherwise(0.0)).as(s"_n$tag"),
        sum(when(f, x).otherwise(0.0)).as(s"_sx$tag"),
        sum(when(f, y).otherwise(0.0)).as(s"_sy$tag"),
        sum(when(f, x * x).otherwise(0.0)).as(s"_sxx$tag"),
        sum(when(f, x * y).otherwise(0.0)).as(s"_sxy$tag"))
      val g = o.agg((side(inL, "l") ++ side(inR, "r")).head,
        (side(inL, "l") ++ side(inR, "r")).tail: _*)
      def icept(tag: String): Column = {
        val (n, sx, sy, sxx, sxy) = (col(s"_n$tag"), col(s"_sx$tag"),
          col(s"_sy$tag"), col(s"_sxx$tag"), col(s"_sxy$tag"))
        val b1 = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        sy / n - b1 * (sx / n)
      }
      g.select(col("_nl").cast("long").as("n_left"), col("_nr").cast("long").as("n_right"),
        r4(icept("l")).as("left_limit"), r4(icept("r")).as("right_limit"),
        r4(icept("r") - icept("l")).as("rd_effect"))
    },
    "huber_reg" -> { (s, d) =>
      // Huber robust regression (the M-estimator production fits use when
      // label noise would own an OLS): fixed 8-round IRLS, OLS init, one
      // weighted-sums aggregate + 2×2 Cramer per round — chained-CTE
      // replayable like poisson_reg
      graft.linear.GLM.huberFrame(Tables.lineitem(s, d),
        col("l_extendedprice") / 100000.0, col("l_quantity") / 10.0, delta = 0.5)
    },
    "tweedie_reg" -> { (s, d) =>
      // Tweedie GLM (log link, variance power 1.5 — the compound
      // Poisson-gamma family for zero-inflated positive targets):
      // fixed-round IRLS with w = √μ, same replay discipline
      graft.linear.GLM.tweedieFrame(Tables.lineitem(s, d),
        col("l_quantity"), col("l_discount"))
    },
    "tost_equivalence" -> { (s, d) =>
      // TOST equivalence test (the A/B gate that PROVES "no meaningful
      // difference" instead of failing to find one): two one-sided Welch
      // t's against a ±1% margin; both must clear 1.645
      val o = Tables.orders(s, d)
      val isRef = Preprocessing.splitColumn(col("o_orderkey"), 500, 42L) === "train"
      val y = col("o_totalprice")
      val g = o.agg(
        sum(when(isRef, 1.0).otherwise(0.0)).as("_na"),
        sum(when(isRef, y).otherwise(0.0)).as("_sa"),
        sum(when(isRef, y * y).otherwise(0.0)).as("_qa"),
        sum(when(!isRef, 1.0).otherwise(0.0)).as("_nb"),
        sum(when(!isRef, y).otherwise(0.0)).as("_sb"),
        sum(when(!isRef, y * y).otherwise(0.0)).as("_qb"))
      val va = (col("_qa") - col("_sa") * col("_sa") / col("_na")) / (col("_na") - 1)
      val vb = (col("_qb") - col("_sb") * col("_sb") / col("_nb")) / (col("_nb") - 1)
      val se = sqrt(va / col("_na") + vb / col("_nb"))
      val diff = col("_sa") / col("_na") - col("_sb") / col("_nb")
      val margin = lit(0.01) * ((col("_sa") + col("_sb")) / (col("_na") + col("_nb")))
      val tL = (diff + margin) / se
      val tU = (margin - diff) / se
      g.select(col("_na").cast("long").as("n_a"), col("_nb").cast("long").as("n_b"),
        r4(diff).as("diff"), r4(margin).as("margin"),
        r4(tL).as("t_lower"), r4(tU).as("t_upper"),
        (r4(tL) > 1.645 && r4(tU) > 1.645).as("equivalent"))
    },
    "fleiss_kappa" -> { (s, d) =>
      // Fleiss' kappa multi-rater agreement of three literal binary
      // raters (the SVM sign rule, the tax rule, the discount rule) —
      // the labeling-quality audit for model-ensemble or annotator
      // pipelines; one codegen aggregate
      val margin = lit(-0.1) + lit(0.004) * col("l_quantity") +
        lit(1.5) * col("l_discount") + lit(-2.0) * col("l_tax")
      val k = (margin > 0).cast("double") + (col("l_tax") >= 0.04).cast("double") +
        (col("l_discount") >= 0.05).cast("double")
      val pI = (k * k + (lit(3.0) - k) * (lit(3.0) - k) - 3.0) / 6.0
      val g = Tables.lineitem(s, d).agg(count(lit(1)).cast("double").as("_n"),
        sum(k).as("_sk"), avg(pI).as("_pb"))
      val p1 = col("_sk") / (col("_n") * 3.0)
      val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
      g.select(col("_n").cast("long").as("n"), r4(p1).as("p_positive"),
        r4(col("_pb")).as("p_agree"),
        r4((col("_pb") - pe) / (lit(1.0) - pe)).as("kappa"))
    },
    "uplift_by_segment" -> { (s, d) =>
      // two-model uplift readout per segment: treatment-vs-control
      // conversion difference by order priority (the heterogeneous
      // treatment-effect slice an experimentation readout reports)
      val o = Tables.orders(s, d)
      val isA = Preprocessing.splitColumn(col("o_orderkey"), 500, 42L) === "train"
      val conv = (col("o_orderstatus") === "F").cast("double")
      o.groupBy(col("o_orderpriority").as("segment")).agg(
          sum(when(isA, 1.0).otherwise(0.0)).as("_na"),
          sum(when(isA, conv).otherwise(0.0)).as("_ca"),
          sum(when(!isA, 1.0).otherwise(0.0)).as("_nb"),
          sum(when(!isA, conv).otherwise(0.0)).as("_cb"))
        .select(col("segment"), col("_na").cast("long").as("n_a"),
          col("_nb").cast("long").as("n_b"),
          r4(col("_ca") / col("_na")).as("rate_a"),
          r4(col("_cb") / col("_nb")).as("rate_b"),
          r4(col("_cb") / col("_nb") - col("_ca") / col("_na")).as("uplift"))
        .orderBy("segment")
    },
    "scd2_history" -> { (s, d) =>
      // slowly-changing-dimension type-2 history build (the warehouse
      // merge every dimension pipeline runs): per-user attribute change
      // rows with validity intervals — two lag/lead windows INSIDE the
      // user partition (the shuffle key; no global ordering anywhere);
      // open intervals carry valid_to = -1
      val ev = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("event_type"), unix_micros(col("ts")).as("_tsu"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("_tsu"), col("event_id"))
      val changes = ev.withColumn("_prev", lag(col("event_type"), 1).over(w))
        .filter(col("_prev").isNull || col("_prev") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id")).orderBy(col("_tsu"), col("event_id"))
      changes.withColumn("_vt", lead(col("_tsu"), 1).over(w2))
        .select(col("user_id"), col("event_type"), col("_tsu").as("valid_from"),
          coalesce(col("_vt"), lit(-1L)).as("valid_to"))
        .orderBy("user_id", "valid_from", "event_type")
    },
    "yuen_ttest" -> { (s, d) =>
      // Yuen's 20%-trimmed robust two-sample t over the SAME md5 split
      // as welch_ttest: exact order-statistics trimming from the
      // per-group distinct-value cumsum (no sort, no per-group
      // single-partition window), winsorized variances, Satterthwaite
      // df. FULL hash gate — the whole order-statistics arithmetic
      // replays on the same distinct frame in SQL
      val o = Tables.orders(s, d)
      val isRef = Preprocessing.splitColumn(col("o_orderkey"), 250, 42L) === "train"
      graft.stats.Yuen.trimmedTest(o, col("o_totalprice"), isRef)
    },
    "welch_ttest" -> { (s, d) =>
      // A/B mean comparison (Welch's unequal-variance t): both sides'
      // moments from ONE aggregate over the md5 split; t, Satterthwaite
      // df, and the ±1.96 large-sample reject all replay in SQL on
      // rounded values
      val o = Tables.orders(s, d)
      val isRef = Preprocessing.splitColumn(col("o_orderkey"), 250, 42L) === "train"
      val y = col("o_totalprice")
      val g = o.agg(
        sum(when(isRef, 1.0).otherwise(0.0)).as("_na"),
        sum(when(isRef, y).otherwise(0.0)).as("_sa"),
        sum(when(isRef, y * y).otherwise(0.0)).as("_qa"),
        sum(when(!isRef, 1.0).otherwise(0.0)).as("_nb"),
        sum(when(!isRef, y).otherwise(0.0)).as("_sb"),
        sum(when(!isRef, y * y).otherwise(0.0)).as("_qb"))
      val va = (col("_qa") - col("_sa") * col("_sa") / col("_na")) / (col("_na") - 1)
      val vb = (col("_qb") - col("_sb") * col("_sb") / col("_nb")) / (col("_nb") - 1)
      val se2 = va / col("_na") + vb / col("_nb")
      val t = (col("_sa") / col("_na") - col("_sb") / col("_nb")) / sqrt(se2)
      val dfW = se2 * se2 / (
        (va / col("_na")) * (va / col("_na")) / (col("_na") - 1) +
          (vb / col("_nb")) * (vb / col("_nb")) / (col("_nb") - 1))
      g.select(col("_na").cast("long").as("n_a"), col("_nb").cast("long").as("n_b"),
        r4(t).as("t_stat"), round(dfW, 1).as("df"),
        (abs(r4(t)) > 1.96).as("reject"))
    },
    "chi2_test" -> { (s, d) =>
      // chi-square independence of lang × source: expected counts from
      // the marginals of ONE contingency groupBy; stat + dof (both
      // engine-exact integers/rounded doubles)
      val cont = Tables.documents(s, d)
        .groupBy(col("lang"), col("source")).agg(count(lit(1)).cast("double").as("_n"))
      val tot = cont.agg(sum(col("_n")).as("_tot"),
        countDistinct(col("lang")).as("_r"), countDistinct(col("source")).as("_c"))
      val byL = cont.groupBy("lang").agg(sum(col("_n")).as("_nl"))
      val byS = cont.groupBy("source").agg(sum(col("_n")).as("_ns"))
      cont.join(byL, "lang").join(byS, "source").crossJoin(tot)
        .select((pow(col("_n") - col("_nl") * col("_ns") / col("_tot"), 2) /
          (col("_nl") * col("_ns") / col("_tot"))).as("_term"),
          col("_r"), col("_c"))
        .agg(r4(sum(col("_term"))).as("chi2"),
          ((max(col("_r")) - 1) * (max(col("_c")) - 1)).cast("long").as("dof"))
    },
    "lift_table" -> { (s, d) =>
      // decile lift/gain of the literal SVM score for the R class:
      // ntile(10) by (score desc, id) — exact audit twin, ntile
      // DISTRIBUTED via Ranks (r12; the raw-row global-sort window was a
      // single-partition sort of lineitem); cumulative gain via a second
      // window over the 10-row decile frame
      val li = Tables.lineitem(s, d)
      val margin = round(lit(-0.1) + lit(0.004) * col("l_quantity") +
        lit(1.5) * col("l_discount") + lit(-2.0) * col("l_tax"), 6)
      val rowId = concat_ws("_", col("l_orderkey"), col("l_linenumber"))
      val deciles = graft.core.Ranks.withGlobalNtile(
          li.select(margin.as("_s"), rowId.as("_id"),
            when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("_y")),
          Seq(col("_s").desc, col("_id")), 10, "decile")
        .groupBy("decile")
        .agg(count(lit(1)).cast("long").as("n"), sum(col("_y")).as("_pos"))
      val wc = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      deciles
        .withColumn("_cpos", sum(col("_pos")).over(wc))
        .withColumn("_tpos", sum(col("_pos")).over(Window.partitionBy()))
        .select(col("decile").cast("long").as("decile"), col("n"),
          col("_pos").cast("long").as("n_pos"),
          r4(col("_cpos") / col("_tpos")).as("cum_gain"))
        .orderBy("decile")
    },
    "word_entropy" -> { (s, d) =>
      // per-doc Shannon word entropy (vocabulary-diversity quality
      // signal next to gopher_filters): one (doc, token) groupBy, the
      // entropy an aggregate over each doc's bounded term set; per-lang
      // summary
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      val tf = toks.groupBy("doc_id", "lang", "tok").agg(count(lit(1)).cast("double").as("_c"))
      val withTot = tf.withColumn("_tot",
        sum(col("_c")).over(Window.partitionBy(col("doc_id"))))
      val ent = withTot.groupBy("doc_id", "lang")
        .agg((-sum(col("_c") / col("_tot") * log(col("_c") / col("_tot")))).as("_h"))
      ent.groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          r4(avg(col("_h"))).as("avg_entropy"), r4(max(col("_h"))).as("max_entropy"))
        .orderBy("lang")
    },
    "kl_divergence" -> { (s, d) =>
      // KL + Jensen-Shannon between the A/B-split totalprice histograms:
      // 10 fixed-width bins (pure codegen), Laplace-smoothed so empty
      // bins stay finite — the generated 10-row bin frame left-joins the
      // counts so missing bins contribute their smoothed mass in BOTH
      // engines
      val o = Tables.orders(s, d)
      val isRef = Preprocessing.splitColumn(col("o_orderkey"), 250, 42L) === "train"
      val bin = least(floor(col("o_totalprice") / 50000.0), lit(9.0)).cast("long")
      val counts = o.select(bin.as("bin"), isRef.as("_r"))
        .groupBy("bin").agg(
          sum(when(col("_r"), 1.0).otherwise(0.0)).as("_ca"),
          sum(when(!col("_r"), 1.0).otherwise(0.0)).as("_cb"))
      val full = s.range(10).select(col("id").as("bin"))
        .join(counts, Seq("bin"), "left")
        .select(coalesce(col("_ca"), lit(0.0)).as("ca"),
          coalesce(col("_cb"), lit(0.0)).as("cb"))
      val tot = full.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val m = (col("p") + col("q")) / 2.0
      full.crossJoin(broadcast(tot))
        .select(col("na"), col("nb"),
          ((col("ca") + 1.0) / (col("na") + 10.0)).as("p"),
          ((col("cb") + 1.0) / (col("nb") + 10.0)).as("q"))
        .agg(max(col("na")).cast("long").as("n_a"),
          max(col("nb")).cast("long").as("n_b"),
          r6(sum(col("p") * log(col("p") / col("q")))).as("kl_ab"),
          r6(sum(col("q") * log(col("q") / col("p")))).as("kl_ba"),
          r6(sum(lit(0.5) * col("p") * log(col("p") / m) +
            lit(0.5) * col("q") * log(col("q") / m))).as("js"))
    },
    "kernel_density" -> { (s, d) =>
      // Gaussian KDE of totalprice at 9 fixed grid points (h = 25000):
      // corpus × broadcast-grid map then ONE bounded-key aggregate;
      // density scaled ×1e6 so the 1e-6 oracle grid keeps ~6 significant
      // digits
      val h = 25000.0
      val grid = s.range(1, 10).select((col("id") * 50000.0).as("g"))
      Tables.orders(s, d).select(col("o_totalprice").as("y"))
        .crossJoin(broadcast(grid))
        .groupBy("g")
        .agg(count(lit(1)).cast("long").as("n"),
          r6(avg(exp(-(col("y") - col("g")) * (col("y") - col("g")) /
            lit(2.0 * h * h))) * lit(1e6 / (h * math.sqrt(2.0 * math.Pi))))
            .as("density_1e6"))
        .orderBy("g")
    },
    "dbscan_predict" -> { (s, d) =>
      // fit/predict separation for the DBSCAN family: fit on 6/7 of the
      // points, assign the held-out 1/7 to the nearest core within eps.
      // PARTIAL HASH GATE (r11): assignment EXISTENCE is closed-form —
      // a query is assigned iff some train core sits within eps, and
      // train-core classification replays in SQL — so the
      // assigned/unassigned counts hash-match; cluster ids derive from
      // the iterative fit and stay parity-spec'd in DbscanNdSpec
      val pts = Tables.events(s, d).select(col("event_id"),
        col("value").as("x"), (col("user_id") % 97).cast("double").as("y"))
      val train = pts.filter(col("event_id") % 7 =!= 0)
      val qs = pts.filter(col("event_id") % 7 === 0)
      val fitted = DBSCANGrid.fit(train, "event_id", "x", "y", eps = 1.0, minPts = 4)
      DBSCANGrid.predictND(train, fitted, "event_id", Seq("x", "y"), qs, "event_id", 1.0)
        .groupBy((col("cluster") >= 0).as("assigned"))
        .agg(count(lit(1)).cast("long").as("n")).orderBy("assigned")
    },
    "psi" -> { (s, d) =>
      // feature-drift monitoring: PSI of o_totalprice between the md5
      // train (reference) and test (current) slices over 10 exact
      // reference-decile bins (rank-select audit twin; production swaps
      // in percentile_approx boundaries)
      val o = Tables.orders(s, d)
      val isRef = Preprocessing.splitColumn(col("o_orderkey"), 250, 42L) === "train"
      graft.stats.Drift.psi(o, col("o_totalprice"), isRef, bins = 10)
    },
    "psi_approx" -> { (s, d) =>
      // the PRODUCTION drift gate: percentile_approx boundaries (one
      // aggregate, no global sort at any scale) feeding the same PSI
      // terms. PARTIAL HASH GATE (quantile_buckets_approx discipline):
      // bin ids + exact slice totals hashed; sketch-dependent per-bin
      // values stay engine-internal behind invariant booleans —
      // reference bins within 10%+2 of N_ref/k (the sketch IS a decile
      // sketch), each PSI term ≥ 0 (exact algebra), total in [0, 0.1]
      // (twin-identical split ⇒ near-zero drift; |approx − exact| is
      // additionally spec-bounded)
      val o = Tables.orders(s, d)
      val isRef = Preprocessing.splitColumn(col("o_orderkey"), 250, 42L) === "train"
      val a = graft.stats.Drift.psiApprox(o, col("o_totalprice"), isRef, bins = 10)
      val tot = a.agg(sum(col("n_ref")).cast("double").as("_tr"),
        sum(col("n_cur")).cast("double").as("_tc"))
      a.crossJoin(broadcast(tot))
        .select(col("bin"),
          col("_tr").cast("long").as("n_ref_total"),
          col("_tc").cast("long").as("n_cur_total"),
          (abs(col("n_ref") - col("_tr") / 10) <= col("_tr") / 10 * 0.10 + 2)
            .as("ref_share_close"),
          (col("psi_term") >= 0.0).as("term_nonneg"),
          (col("psi_total") >= 0.0 && col("psi_total") <= 0.1).as("psi_bounded"))
        .orderBy("bin")
    },
    "ks_test" -> { (s, d) =>
      // two-sample KS drift gate on the same slices — exact over the
      // quantized pooled support (the roc_auc distinct-value discipline)
      val o = Tables.orders(s, d)
      val isRef = Preprocessing.splitColumn(col("o_orderkey"), 250, 42L) === "train"
      graft.stats.Drift.ksTest(o, col("o_totalprice"), isRef)
    },
    "pagerank" -> { (s, d) =>
      // source-importance over the customer↔supplier order graph (the
      // crawl-prioritization shape): bidirectional edges ⇒ no dangling
      // mass, 8 fixed power-iteration rounds, ranks rounded BEFORE the
      // top-15 selection so the cross-engine ordering is exact
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), concat(lit("c"), col("o_custkey")).as("src"))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o_orderkey"), concat(lit("s"), col("l_suppkey")).as("dst"))
      val e0 = o.join(li, "o_orderkey").select("src", "dst").distinct()
      val e = e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.graph.PageRank.run(e, "src", "dst", rounds = 8)
        .orderBy(col("rank").desc, col("node")).limit(15)
    },
    "range_join_overlap" -> { (s, d) =>
      // interval × interval overlap join: supplier bands (±50) × customer
      // bands (±30); bucketized fan-out with responsibility-bucket dedup,
      // verified against the raw theta-join semantics in the oracle
      val supp = Tables.supplier(s, d).select(col("s_suppkey"),
        (col("s_acctbal") - 50).as("slo"), (col("s_acctbal") + 50).as("shi"))
      val cust = Tables.customer(s, d).select(col("c_custkey"),
        (col("c_acctbal") - 30).as("clo"), (col("c_acctbal") + 30).as("chi"))
      graft.events.RangeJoin.intervalOverlap(supp, cust,
          "s_suppkey", "slo", "shi", "c_custkey", "clo", "chi", bucketWidth = 100.0)
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          countDistinct(col("id")).cast("long").as("n_supp"),
          countDistinct(col("rid")).cast("long").as("n_cust"),
          r4(avg(least(col("hi"), col("rhi")) - greatest(col("lo"), col("rlo")))).as("avg_overlap"))
    },
    "cardinality_stats" -> { (s, d) =>
      // distinct users per event type — the exact audit twin
      graft.stats.Cardinality.exact(Tables.events(s, d), "event_type", "user_id")
        .orderBy("event_type")
    },
    "cardinality_stats_approx" -> { (s, d) =>
      // the HLL++ production path (one sketch-sized aggregate). PARTIAL
      // HASH GATE (r11): key set + exact row/audit counts + the
      // within-10% boolean (5σ of the 2% rsd) hashed; the sketch estimate
      // itself stays engine-internal
      val ex = graft.stats.Cardinality.exact(Tables.events(s, d), "event_type", "user_id")
      val ap = graft.stats.Cardinality.approx(Tables.events(s, d), "event_type", "user_id")
        .select(col("event_type"), col("n_distinct_approx"))
      ex.join(ap, Seq("event_type"))
        .select(col("event_type"), col("n_rows"), col("n_distinct"),
          (abs(col("n_distinct_approx") - col("n_distinct")) <=
            col("n_distinct") * 0.10).as("within_10pct"))
        .orderBy("event_type")
    },
    "asof_join" -> { (s, d) =>
      // state-at-event lookup: every purchase joined to the user's most
      // recent prior-or-equal click (the feature-snapshot join shape)
      val e = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      graft.events.AsOf.asofJoin(
          e.filter(col("event_type") === "purchase"),
          e.filter(col("event_type") === "click"),
          "user_id", "us", "event_id", "event_id", "value")
        .select(col("lid").as("event_id"), col("key").as("user_id"),
          col("rid").as("click_id"), col("rval").as("click_value"), col("lag_us"))
        .orderBy("event_id")
    },
    "sessionize" -> { (s, d) =>
      // 4-hour idle gap: the sf events land ~7 h apart per user at the
      // median, so the corpus genuinely mixes multi-event sessions and
      // singletons
      graft.events.Sessionize.userSessions(Tables.events(s, d),
          gapUs = 4L * 3600 * 1000000)
        .orderBy("user_id")
    },
    "streaming_sessions" -> { (s, d) =>
      // the FIRST oracle-visible streaming query: the events parquet
      // flows through a REAL Structured Streaming session_window
      // aggregation (state store, watermark, Trigger.AvailableNow), the
      // closed sessions land in a memory sink, and the final table is
      // hash-gated against the batch gap-scan replay in DuckDB — so the
      // streaming semantics themselves (>= gap splits, end = last+gap)
      // are inside the correctness gate, not just spec-gated parity.
      // The memory sink is the gate harness; a production run writes
      // kafka/parquet and never holds sessions on the driver.
      val sink = "graft_stream_sessions"
      val q = graft.streaming.StreamingOps
        .streamingSessions(Tables.eventsStream(s, d), gap = "4 hours")
      graft.streaming.StreamingOps.runToMemory(s, q, sink, "complete")
        .select(col("user_id").cast("long").as("user_id"),
          unix_micros(col("sess_start")).as("sess_start_us"),
          col("window_us"), col("n_events"))
        .orderBy("user_id", "sess_start_us")
    },
    "streaming_funnel" -> { (s, d) =>
      // third oracle-visible streaming query and the first STATEFUL
      // custom-state one: the signup→view→purchase funnel runs through
      // the REAL flatMapGroupsWithState fold (per-user 3-register
      // state, exactly-once conversion emission) under Trigger
      // .AvailableNow, and the emitted (user, t1, t2, t3) conversion
      // rows hash-gate against the closed-form per-user min-chain
      // replay in DuckDB — the running-min chaining is order-equivalent
      // to the fold because events process in (us, event_id) order
      val sink = "graft_stream_funnel"
      val q = graft.streaming.StreamingOps
        .streamingFunnel(Tables.eventsStream(s, d), "signup", "view", "purchase")
      graft.streaming.StreamingOps.runToMemory(s, q, sink, "append")
        .select(col("user_id").cast("long").as("user_id"),
          col("t1"), col("t2"), col("t3"))
        .orderBy("user_id")
    },
    "streaming_drift" -> { (s, d) =>
      // the live drift alarm oracle-visible: the batch profiler computes
      // exact reference-decile bounds (quantized values, distributed
      // rank-select via core.Ranks) and smoothed shares from the full
      // events history; the stream assigns bins against those literals
      // and ONE watermarked window aggregate emits per-hour PSI. Every
      // number is an identical IEEE expression in both engines — the
      // shares stay raw (n+1)/(tot+10) divisions of exact integers,
      // never rounded, so the SQL replay recomputes them bit-exactly
      val evB = Tables.events(s, d).select(round(col("value"), 4).as("_v"))
      val bounds = graft.core.Ranks.exactQuantilesByValue(
        evB, col("_v"), (1 to 9).map(_ / 10.0))
      val bin = bounds.foldLeft(lit(1L): org.apache.spark.sql.Column) { (acc, b) =>
        acc + when(col("_v") > b, 1L).otherwise(0L)
      }
      val cnts = evB.groupBy(bin.as("_bin")).agg(count(lit(1)).as("_n"))
        .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      val tot = cnts.values.sum
      val shares = (1 to 10).map(k => (cnts.getOrElse(k, 0L) + 1.0) / (tot + 10.0))
      val st = Tables.eventsStream(s, d)
        .select(round(col("value"), 4).as("_v"), col("ts"))
      val sink = "graft_stream_drift"
      val q = graft.streaming.StreamingOps
        .streamingDriftGate(st, "_v", "ts", bounds, shares)
      graft.streaming.StreamingOps.runToMemory(s, q, sink, "complete")
        .select(unix_micros(col("win_start")).as("win_start_us"),
          col("n"), col("psi"))
        .orderBy("win_start_us")
    },
    "streaming_sample" -> { (s, d) =>
      // the streaming uniform sample oracle-visible: reservoir-equivalent
      // bottom-32 by md5 priority, folded as per-bucket bounded state
      // under AvailableNow; the final exact bottom-k runs over the
      // bounded candidate superset. FULL hash gate — md5 priorities are
      // engine-neutral, so DuckDB replays the identical sample (the
      // thing no RNG reservoir could gate)
      val sink = "graft_stream_sample"
      val q = graft.streaming.StreamingOps
        .streamingSampleCandidates(
          Tables.eventsStream(s, d).select(col("event_id")), "event_id", k = 32)
      val cands = graft.streaming.StreamingOps.runToMemory(s, q, sink, "append")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("prio"), col("id")) // bounded candidate frame
      cands
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 32)
        .select(col("rank"), col("id").as("event_id"), col("prio").as("priority"))
        .orderBy("rank")
    },
    "streaming_quantile" -> { (s, d) =>
      // the windowed percentile monitor oracle-visible (pairs with the
      // psi_approx/streaming_drift production gates): per-hour approx
      // p10/p50/p90 from the mergeable percentile_approx sketch inside
      // watermarked state; n/min/max per window are EXACT (hash-gated vs
      // the hour-bucket replay); each approx quantile gates as an
      // EXACT-RANK invariant — the batch side recomputes the value's
      // true rank in its window and checks |rank − p·n| ≤ n/100 + 2
      // (the sketch's contract is n/accuracy = n/1000)
      val sink = "graft_stream_quantile"
      val q = graft.streaming.StreamingOps
        .streamingQuantiles(Tables.eventsStream(s, d), "value", "ts")
      val res = graft.streaming.StreamingOps.runToMemory(s, q, sink, "complete")
        .withColumn("_hr", (unix_micros(col("win_start")) / 3600000000L).cast("long"))
      val ev = Tables.events(s, d)
        .select(floor(unix_micros(col("ts")) / 3600000000L).cast("long").as("_hr"),
          col("value").cast("double").as("_v"))
      // the returned value occupies the RANK INTERVAL
      // [count(v < q), count(v ≤ q)] — with heavy ties at a quantile
      // boundary the upper rank alone can exceed the tolerance even when
      // the sketch meets its n/1000 contract (advice r13), so the gate
      // checks the interval INTERSECTS [p·n − tol, p·n + tol]
      val ranks = ev.join(broadcast(res.select(col("_hr"), col("q10"), col("q50"), col("q90"))), "_hr")
        .groupBy(col("_hr"))
        .agg(sum(when(col("_v") <= col("q10"), 1L).otherwise(0L)).as("_r10"),
          sum(when(col("_v") <= col("q50"), 1L).otherwise(0L)).as("_r50"),
          sum(when(col("_v") <= col("q90"), 1L).otherwise(0L)).as("_r90"),
          sum(when(col("_v") < col("q10"), 1L).otherwise(0L)).as("_l10"),
          sum(when(col("_v") < col("q50"), 1L).otherwise(0L)).as("_l50"),
          sum(when(col("_v") < col("q90"), 1L).otherwise(0L)).as("_l90"))
      val tol = col("n") / 100.0 + 2.0
      def ok(rLo: org.apache.spark.sql.Column, rHi: org.apache.spark.sql.Column,
             p: Double) =
        rLo <= col("n") * p + tol && rHi >= col("n") * p - tol
      res.join(ranks, "_hr")
        .select(unix_micros(col("win_start")).as("win_start_us"),
          col("n"), r4(col("vmin")).as("min_v"), r4(col("vmax")).as("max_v"),
          (col("q10") <= col("q50") && col("q50") <= col("q90") &&
            col("q10") >= col("vmin") && col("q90") <= col("vmax")).as("q_ordered"),
          ok(col("_l10"), col("_r10"), 0.1).as("q10_rank_ok"),
          ok(col("_l50"), col("_r50"), 0.5).as("q50_rank_ok"),
          ok(col("_l90"), col("_r90"), 0.9).as("q90_rank_ok"))
        .orderBy("win_start_us")
    },
    "streaming_outlier" -> { (s, d) =>
      // the live Hampel outlier gate oracle-visible: batch-profiled
      // median/MAD (quantized values, distributed rank-select), the
      // stream classifies statelessly against the literal threshold
      // k·1.4826·MAD and every fired event hash-gates against the SQL
      // replay of the same rank-selects + the identical float product
      val evB = Tables.events(s, d).select(round(col("value"), 4).as("_v"))
      val Seq(med) = graft.core.Ranks.exactQuantilesByValue(evB, col("_v"), Seq(0.5))
      val Seq(mad) = graft.core.Ranks.exactQuantilesByValue(
        evB.select(abs(col("_v") - med).as("_d")), col("_d"), Seq(0.5))
      val st = Tables.eventsStream(s, d)
        .select(col("event_id").cast("long").as("event_id"),
          round(col("value"), 4).as("_v"))
      val sink = "graft_stream_outlier"
      val q = graft.streaming.StreamingOps
        .streamingOutlierGate(st, "_v", med, mad)
      graft.streaming.StreamingOps.runToMemory(s, q, sink, "append")
        .select(col("event_id"), col("deviation"))
        .orderBy("event_id")
    },
    "streaming_asof" -> { (s, d) =>
      // the stateful as-of carry-forward oracle-visible: clicks update
      // the per-user (t, value) register, purchases read it —
      // flatMapGroupsWithState under AvailableNow; the fold's tie order
      // (state first at equal t, ascending id, last overwrite wins) is
      // EXACTLY the batch window's (t, side, rid) last_value rule, so
      // the same SQL replays it
      val sink = "graft_stream_asof"
      val ev = Tables.eventsStream(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id").as("key"), col("event_id"),
          unix_micros(col("ts")).as("t"),
          (col("event_type") === "click").as("is_state"), col("value"))
      val q = graft.streaming.StreamingOps.streamingAsOf(ev)
      graft.streaming.StreamingOps.runToMemory(s, q, sink, "append")
        .select(col("key").cast("long").as("key"), col("event_id"),
          col("t"), col("state_t"), col("state_v"))
        .orderBy("event_id")
    },
    "streaming_profile" -> { (s, d) =>
      // the windowed ingest profile oracle-visible: n/min/max/mean/
      // stddev per hour window are EXACT (hash-gated vs the hour-bucket
      // replay); the HLL++ distinct — the only part exact batch SQL
      // cannot maintain incrementally — gates as a within-10%+2
      // invariant against the batch-exact distinct (the
      // cardinality_stats_approx discipline)
      val sink = "graft_stream_profile"
      val q = graft.streaming.StreamingOps
        .streamingProfile(Tables.eventsStream(s, d), "value")
      val prof = graft.streaming.StreamingOps.runToMemory(s, q, sink, "complete")
      val exact = Tables.events(s, d)
        .groupBy(floor(unix_micros(col("ts")) / 3600000000L).cast("long").as("_hr"))
        .agg(countDistinct(col("value")).cast("long").as("_nd"))
      prof
        .withColumn("_hr", (unix_micros(col("win_start")) / 3600000000L).cast("long"))
        .join(exact, "_hr")
        .select(unix_micros(col("win_start")).as("win_start_us"),
          col("n").cast("long").as("n"),
          r4(col("min")).as("min_v"), r4(col("max")).as("max_v"),
          col("mean"), col("stddev"),
          (abs(col("approx_distinct") - col("_nd")) <=
            col("_nd") * 0.10 + lit(2)).as("approx_within"))
        .orderBy("win_start_us")
    },
    "streaming_top_event" -> { (s, d) =>
      // the windowed top-event monitor oracle-visible: known types are
      // conditional sums in ONE watermarked window aggregate, winner a
      // post-aggregate CASE chain (ties → smallest type); complete mode
      // so end-of-stream windows land in the sink (the
      // streaming_window_stats discipline)
      val sink = "graft_stream_topevent"
      val q = graft.streaming.StreamingOps
        .streamingTopEvent(Tables.eventsStream(s, d),
          Seq("click", "purchase", "signup", "view"))
      graft.streaming.StreamingOps.runToMemory(s, q, sink, "complete")
        .select(unix_micros(col("win_start")).as("win_start_us"),
          col("n_events").cast("long").as("n_events"), col("top_type"),
          col("top_n").cast("long").as("top_n"))
        .orderBy("win_start_us")
    },
    "streaming_dedup" -> { (s, d) =>
      // stateful streaming exact-dedup oracle-visible: the per-hash
      // flatMapGroupsWithState seen-marker emits each content hash once
      // with its min doc id; hash-gated against the batch normalize +
      // groupBy replay
      val sink = "graft_stream_dedup"
      val q = graft.streaming.StreamingOps
        .streamingDedup(Tables.documentsStream(s, d))
      graft.streaming.StreamingOps.runToMemory(s, q, sink, "append")
        .agg(count(lit(1)).cast("long").as("n_distinct"),
          sum(col("doc_id")).cast("long").as("sum_first_ids"),
          md5(array_join(array_sort(collect_list(col("content_hash"))), ","))
            .as("hash_set_md5"))
    },
    "streaming_window_stats" -> { (s, d) =>
      // second oracle-visible streaming query (streaming_sessions
      // pattern): the watermarked 1-hour tumbling-window aggregation
      // runs as a REAL stream under Trigger.AvailableNow and the final
      // memory-sink table hash-gates against the batch hour-bucket
      // replay in DuckDB
      val sink = "graft_stream_winstats"
      val q = graft.streaming.StreamingOps
        .windowedEventStats(Tables.eventsStream(s, d))
      graft.streaming.StreamingOps.runToMemory(s, q, sink, "complete")
        .select(col("event_type"),
          unix_micros(col("win_start")).as("win_start_us"),
          col("n").cast("long").as("n"), r4(col("mean_value")).as("mean_value"))
        .orderBy("event_type", "win_start_us")
    },
    "active_users" -> { (s, d) =>
      // weekly actives split into new (first-ever week) vs returning,
      // plus DAU/WAU stickiness: three aggregates all keyed on
      // user/week/day (uniform), joined on the bounded week frame
      val ev = Tables.events(s, d).select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("_day"))
        .withColumn("_wk", floor(col("_day") / 7).cast("long"))
      val firstWk = ev.groupBy("user_id").agg(min(col("_wk")).as("_fw"))
      val weekly = ev.select("user_id", "_wk").distinct()
        .join(firstWk, "user_id")
        .groupBy(col("_wk").as("week"))
        .agg(countDistinct(col("user_id")).cast("long").as("wau"),
          sum(when(col("_fw") === col("_wk"), 1L).otherwise(0L)).as("n_new"))
      val daily = ev.select("user_id", "_wk", "_day").distinct()
        .groupBy(col("_wk").as("week"), col("_day"))
        .agg(count(lit(1)).cast("double").as("_dau"))
        .groupBy("week").agg(avg(col("_dau")).as("_avg_dau"))
      weekly.join(daily, "week")
        .select(col("week"), col("wau"), col("n_new"),
          (col("wau") - col("n_new")).as("n_returning"),
          r4(col("_avg_dau") / col("wau")).as("stickiness"))
        .orderBy("week")
    },
    "attribution" -> { (s, d) =>
      // last-touch attribution: each purchase credits the immediately
      // preceding event type for the same user (lag over the one
      // user_id-shuffled window); per-channel conversion credit shares
      val w = Window.partitionBy(col("user_id")).orderBy(col("_us"), col("event_id"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type").as("_t"),
          unix_micros(col("ts")).as("_us"))
        .withColumn("_prev", lag(col("_t"), 1).over(w))
      val credits = ev.filter(col("_t") === "purchase" && col("_prev").isNotNull)
        .groupBy(col("_prev").as("channel"))
        .agg(count(lit(1)).cast("double").as("_n"))
      credits.crossJoin(broadcast(credits.agg(sum(col("_n")).as("_tot"))))
        .select(col("channel"), col("_n").cast("long").as("n_conversions"),
          r4(col("_n") / col("_tot")).as("share"))
        .orderBy("channel")
    },
    "markov_transitions" -> { (s, d) =>
      // first-order event-type transition matrix: one lead() hop on the
      // user window, (from, to) counts, row-normalized probabilities —
      // the sequence-model summary of the event log (bounded types² rows)
      val w = Window.partitionBy(col("user_id")).orderBy(col("_us"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type").as("_f"),
          unix_micros(col("ts")).as("_us"))
        .withColumn("_to", lead(col("_f"), 1).over(w))
        .filter(col("_to").isNotNull)
        .groupBy(col("_f").as("from_type"), col("_to").as("to_type"))
        .agg(count(lit(1)).cast("double").as("_n"))
      val rowTot = pairs.groupBy("from_type").agg(sum(col("_n")).as("_rt"))
      pairs.join(rowTot, "from_type")
        .select(col("from_type"), col("to_type"), col("_n").cast("long").as("n"),
          r4(col("_n") / col("_rt")).as("p"))
        .orderBy("from_type", "to_type")
    },
    "lorenz_curve" -> { (s, d) =>
      // decile Lorenz curve of customer revenue (gini's graphical twin):
      // ntile(10) by (revenue, custkey), DISTRIBUTED via Ranks (r12 — the
      // per-customer frame is data-scale, not a summary) — then
      // cumulative share over the 10-row decile frame
      val per = Tables.orders(s, d).groupBy(col("o_custkey").as("cust"))
        .agg(round(sum(col("o_totalprice")), 2).as("_y"))
      val dec = graft.core.Ranks.withGlobalNtile(per,
          Seq(col("_y"), col("cust")), 10, "decile")
        .groupBy("decile")
        .agg(count(lit(1)).cast("long").as("n"), sum(col("_y")).as("_rev"))
      val wc = Window.orderBy(col("decile")).rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      dec.withColumn("_cum", sum(col("_rev")).over(wc))
        .withColumn("_tot", sum(col("_rev")).over(wAll))
        .select(col("decile").cast("long").as("decile"), col("n"),
          r4(col("_rev") / col("_tot")).as("rev_share"),
          r4(col("_cum") / col("_tot")).as("cum_share"))
        .orderBy("decile")
    },
    "gini" -> { (s, d) =>
      // Gini coefficient of revenue concentration across customers, in
      // the midrank/distinct-value discipline (mann_whitney's): with
      // midranks r̄(v), G = (2·Σ r̄ᵢyᵢ)/(n·Σy) − (n+1)/n is exact under
      // ties — never a raw-row sort
      val per = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("_y"))
      val g = per.groupBy(col("_y")).agg(count(lit(1)).cast("double").as("_c"))
      // midranks from the DISTRIBUTED cumulative count (r12): the revenue
      // grid is data-scale, so the unpartitioned window was a
      // single-partition sort; counts are integer-valued doubles, so the
      // exclusive prefix (cum − c) is bit-identical to the lag window
      val ranks = graft.core.Ranks.withGlobalCumSums(g, Seq(col("_y")),
          Seq((col("_c"), "_cs")))
        .select(col("_y"),
          ((col("_cs") - col("_c")) + (col("_c") + 1.0) / 2.0).as("_r"))
      per.join(ranks, "_y")
        .agg(count(lit(1)).cast("double").as("_n"),
          sum(col("_y")).as("_sy"), sum(col("_r") * col("_y")).as("_sry"))
        .select(col("_n").cast("long").as("n_customers"),
          r4(lit(2.0) * col("_sry") / (col("_n") * col("_sy")) -
            (col("_n") + 1.0) / col("_n")).as("gini"))
    },
    "diff_in_diff" -> { (s, d) =>
      // difference-in-differences over the md5 user split × first/second
      // half of the event window: all four cell means from ONE
      // conditional aggregate; integer epoch-day period cut
      val ev = Tables.events(s, d)
      val day = floor(unix_micros(col("ts")) / lit(86400000000L))
      val mid = lit(19737L) // 2024-01-15 as epoch day — a fixed literal cut
      val isB = graft.core.Num.md5Long(
        concat(col("user_id").cast("string"), lit("_did_7"))) % 1000L < 500L
      def cell(b: Boolean, post: Boolean) = {
        val cond = (if (b) isB else !isB) &&
          (if (post) day >= mid else day < mid)
        (sum(when(cond, col("value")).otherwise(0.0)), sum(when(cond, 1.0).otherwise(0.0)))
      }
      val ((sbPre, nbPre), (sbPost, nbPost)) = (cell(b = true, post = false), cell(b = true, post = true))
      val ((saPre, naPre), (saPost, naPost)) = (cell(b = false, post = false), cell(b = false, post = true))
      ev.agg(sbPre.as("_sbpre"), nbPre.as("_nbpre"), sbPost.as("_sbpost"), nbPost.as("_nbpost"),
          saPre.as("_sapre"), naPre.as("_napre"), saPost.as("_sapost"), naPost.as("_napost"))
        .select(
          r4(col("_sapre") / col("_napre")).as("mean_a_pre"),
          r4(col("_sapost") / col("_napost")).as("mean_a_post"),
          r4(col("_sbpre") / col("_nbpre")).as("mean_b_pre"),
          r4(col("_sbpost") / col("_nbpost")).as("mean_b_post"),
          r4((col("_sbpost") / col("_nbpost") - col("_sbpre") / col("_nbpre")) -
            (col("_sapost") / col("_napost") - col("_sapre") / col("_napre"))).as("did"))
    },
    "cuped" -> { (s, d) =>
      // CUPED variance reduction: per-user pre/post value totals (one
      // user-key aggregate), θ = cov(x,y)/var(x) from one stats pass,
      // adjusted variance + reduction from a final pass over the same
      // per-user frame
      val ev = Tables.events(s, d)
      val day = floor(unix_micros(col("ts")) / lit(86400000000L))
      val mid = lit(19737L)
      val per = ev.groupBy(col("user_id"))
        .agg(sum(when(day < mid, col("value")).otherwise(0.0)).as("x"),
          sum(when(day >= mid, col("value")).otherwise(0.0)).as("y"))
      val st = per.agg(count(lit(1)).cast("double").as("_n"),
        avg(col("x")).as("_mx"), avg(col("y")).as("_my"),
        covar_samp(col("x"), col("y")).as("_cxy"), var_samp(col("x")).as("_vx"),
        var_samp(col("y")).as("_vy"))
      val joined = per.crossJoin(broadcast(st))
      val adj = col("y") - (col("_cxy") / col("_vx")) * (col("x") - col("_mx"))
      joined.agg(max(col("_n")).cast("long").as("n_users"),
          r6(max(col("_cxy") / col("_vx"))).as("theta"),
          r4(max(col("_vy"))).as("var_y"),
          r4(var_samp(adj)).as("var_adj"))
        .select(col("n_users"), col("theta"), col("var_y"), col("var_adj"),
          r4(lit(1.0) - col("var_adj") / col("var_y")).as("reduction"))
    },
    "topk_per_group" -> { (s, d) =>
      // top-3 parts by revenue within each return flag: the canonical
      // grouped top-k — rank window PARTITIONED by the bounded group key
      // (never a global sort), revenue ROUNDED before ranking
      val li = Tables.lineitem(s, d)
      val rev = li.groupBy(col("l_returnflag").as("flag"), col("l_partkey").as("part"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("_rev"))
      val w = Window.partitionBy(col("flag")).orderBy(col("_rev").desc, col("part"))
      rev.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= 3)
        .select(col("flag"), col("_rk").cast("long").as("rank"),
          col("part").cast("long").as("part"), r4(col("_rev")).as("revenue"))
        .orderBy("flag", "rank")
    },
    "sales_rollup" -> { (s, d) =>
      // ROLLUP over (priority, status): subtotals + grand total in one
      // pass (Spark's rollup ≡ grouping-sets partial aggregation —
      // map-side combined at every level); null grouping keys mark the
      // subtotal rows in both engines
      Tables.orders(s, d)
        .rollup(col("o_orderpriority").as("priority"), col("o_orderstatus").as("status"))
        .agg(count(lit(1)).cast("long").as("n"), r4(sum(col("o_totalprice"))).as("revenue"))
        .orderBy(col("priority").asc_nulls_first, col("status").asc_nulls_first)
    },
    "weekly_growth" -> { (s, d) =>
      // week-over-week revenue growth: integer epoch-week buckets, ONE
      // bounded-frame lag window over the per-week aggregate
      val o = Tables.orders(s, d)
      val wk = floor(unix_micros(col("o_orderdate").cast("timestamp")) /
        lit(86400000000L * 7)).cast("long")
      val per = o.groupBy(wk.as("week"))
        .agg(round(sum(col("o_totalprice")), 2).as("_rev"))
      val w = Window.orderBy(col("week"))
      per.withColumn("_prev", lag(col("_rev"), 1).over(w))
        .select(col("week"), r4(col("_rev")).as("revenue"),
          r4(when(col("_prev").isNotNull,
            (col("_rev") - col("_prev")) / col("_prev"))).as("wow_growth"))
        .orderBy("week")
    },
    "kaplan_meier" -> { (s, d) =>
      // Kaplan-Meier survival of user activity spans (days between first
      // and last event, all spans observed — the uncensored special
      // case): product-limit via exp(cumsum ln(1 − d/n)) over the
      // bounded distinct-duration frame; at-risk counts from one
      // cumulative window
      val ev = Tables.events(s, d).select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).as("_day"))
      val dur = ev.groupBy("user_id")
        .agg((max(col("_day")) - min(col("_day")) + 1).cast("long").as("d"))
      val g = dur.groupBy("d").agg(count(lit(1)).cast("double").as("_dd"))
      val wPrior = Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      g.withColumn("_risk",
          sum(col("_dd")).over(wAll) - coalesce(sum(col("_dd")).over(wPrior), lit(0.0)))
        // the last duration has deaths = at-risk → ln(0); a −1e300 term
        // underflows exp to exactly 0 in both engines (Spark's log would
        // return null, DuckDB's would error)
        .withColumn("_lnS", sum(when(col("_dd") < col("_risk"),
          log(lit(1.0) - col("_dd") / col("_risk"))).otherwise(lit(-1e300))).over(wCum))
        .select(col("d").as("duration"), col("_risk").cast("long").as("n_risk"),
          col("_dd").cast("long").as("n_events"), r6(exp(col("_lnS"))).as("survival"))
        .orderBy("duration")
    },
    "poisson_reg" -> { (s, d) =>
      // Poisson GLM of quantity on discount: fixed 8-round IRLS (one
      // weighted-sums aggregate per round, 2×2 Cramer on the driver) —
      // replays as chained CTEs
      graft.linear.GLM.poissonFrame(Tables.lineitem(s, d),
        col("l_quantity"), col("l_discount"), rounds = 8)
    },
    "quantile_reg" -> { (s, d) =>
      // quantile regression (median + p90 lines of price vs quantity) by
      // Schlossmacher IRLS on the pinball loss: BOTH quantiles' weighted
      // sums ride the same scan each round; 30 fixed rounds (the p90 line
      // converges slowly from the mean start — 0.90 coverage needs ~30)
      // replay as chained CTEs
      graft.linear.GLM.quantileFrame(Tables.lineitem(s, d),
        col("l_extendedprice") / 1000.0, col("l_quantity"),
        taus = Seq(0.5, 0.9), rounds = 30)
    },
    "wasserstein_1d" -> { (s, d) =>
      // 1-D earth-mover distance between the A/B-split totalprice
      // distributions: W₁ = Σ |F_A − F_B|·Δv over the merged support —
      // quantize, ONE groupBy to the distinct-value frame, then the
      // DISTRIBUTED CDFs and successor values over it (r12,
      // core.Ranks — the price grid is data-scale, so the unpartitioned
      // cum/lead windows were single-partition sorts); the CDF ratios
      // are exact integer-sum quotients, bit-identical to the windows
      val o = Tables.orders(s, d)
      val isRef = Preprocessing.splitColumn(col("o_orderkey"), 250, 42L) === "train"
      val g = o.select(round(col("o_totalprice"), 2).as("_v"), isRef.as("_a"))
        .groupBy("_v")
        .agg(sum(when(col("_a"), 1.0).otherwise(0.0)).as("_ca"),
          sum(when(!col("_a"), 1.0).otherwise(0.0)).as("_cb"))
      val cum = graft.core.Ranks.withGlobalCumSums(g, Seq(col("_v")),
          Seq((col("_ca"), "_cca"), (col("_cb"), "_ccb")))
        .withColumn("_fa", col("_cca") / col("_cca_tot"))
        .withColumn("_fb", col("_ccb") / col("_ccb_tot"))
      val stepped = graft.core.Ranks.withGlobalLead(cum, Seq(col("_v")),
        col("_v"), "_nextv")
      stepped.filter(col("_nextv").isNotNull)
        .agg(sum(col("_ca") + col("_cb")).cast("long").as("n_support"),
          r4(sum(abs(col("_fa") - col("_fb")) * (col("_nextv") - col("_v"))))
            .as("wasserstein"))
    },
    "hhi_concentration" -> { (s, d) =>
      // Herfindahl–Hirschman concentration of the document mix per
      // dimension (source and lang): Σ share² from one bounded groupBy
      // each — the crawl-balance monitoring twin of domain_cap
      val docs = Tables.documents(s, d)
      def hhi(c: String) = {
        val g = docs.groupBy(col(c)).agg(count(lit(1)).cast("double").as("_n"))
        g.agg((lit(c)).as("dim"), count(lit(1)).cast("long").as("n_groups"),
          r6(sum(col("_n") * col("_n")) /
            (sum(col("_n")) * sum(col("_n")))).as("hhi"))
      }
      hhi("source").unionAll(hhi("lang")).orderBy("dim")
    },
    "rfm_segments" -> { (s, d) =>
      // RFM customer segmentation: recency (days before the corpus max
      // order day, integer epoch-day math), frequency, monetary per
      // customer from ONE groupBy; quintile codes via ntile over
      // (metric, custkey) — the declared global-sort audit twin (the
      // lift_table/quantile_buckets pattern); output = the bounded
      // (r, f) segment grid
      val o = Tables.orders(s, d)
      // o_orderdate is TIMESTAMP_NTZ; the UTC session zone makes the
      // cast interpret it as UTC — matching DuckDB's epoch_us on the
      // naive timestamp
      val day = floor(unix_micros(col("o_orderdate").cast("timestamp")) / lit(86400000000L))
      val per = o.groupBy(col("o_custkey").as("cust"))
        .agg(max(day).as("_last"), count(lit(1)).cast("long").as("_f"),
          sum(col("o_totalprice")).as("_m"))
      // r17 opt: the corpus max day equals the max over per-customer
      // maxes — taking it from the base scan (independent aggregate)
      // instead of from `per` stops the customer groupBy running twice
      // (exact integer-day max, same value)
      val maxDay = o.agg(max(day).as("_maxd"))
      val base = per.crossJoin(broadcast(maxDay))
        .select(col("cust"), (col("_maxd") - col("_last")).cast("long").as("_r"),
          col("_f"), col("_m"))
      // both quintile codes via the distributed ntile (r12): two range
      // exchanges over the per-customer frame instead of two
      // single-partition sort windows
      val withR = graft.core.Ranks.withGlobalNtile(base,
        Seq(col("_r"), col("cust")), 5, "r_code")
      val withRF = graft.core.Ranks.withGlobalNtile(withR,
        Seq(col("_f").desc, col("cust")), 5, "f_code")
      withRF.select(col("cust"), col("r_code").cast("int").as("r_code"),
          col("f_code").cast("int").as("f_code"), col("_m"))
        .groupBy("r_code", "f_code")
        .agg(count(lit(1)).cast("long").as("n_customers"),
          r4(avg(col("_m"))).as("avg_monetary"))
        .orderBy("r_code", "f_code")
    },
    "anova_f" -> { (s, d) =>
      // one-way ANOVA across order priorities: between/within sums of
      // squares from ONE group aggregate + one bounded reduce; F on
      // ROUNDED values
      val g = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("_n"), sum(col("o_totalprice")).as("_s"),
          sum(col("o_totalprice") * col("o_totalprice")).as("_q"))
      g.agg(sum(col("_n")).as("_nt"), sum(col("_s")).as("_st"),
          sum(col("_q")).as("_qt"), count(lit(1)).cast("double").as("_k"),
          sum(col("_s") * col("_s") / col("_n")).as("_ssb_raw"))
        .select(col("_nt").cast("long").as("n"), col("_k").cast("long").as("k"),
          r4((col("_ssb_raw") - col("_st") * col("_st") / col("_nt")) / (col("_k") - 1) /
            ((col("_qt") - col("_ssb_raw")) / (col("_nt") - col("_k")))).as("f_stat"))
    },
    "mann_whitney" -> { (s, d) =>
      // Mann-Whitney U over the md5 A/B split (the rank-based companion
      // of welch_ttest): midranks from the distinct-value frame (the
      // spearman discipline), U and the tie-corrected normal
      // approximation z from one sufficient-stats pass
      val o = Tables.orders(s, d).select(col("o_totalprice").as("_v"),
        (Preprocessing.splitColumn(col("o_orderkey"), 250, 42L) === "train").as("_a"))
      val g = o.groupBy(col("_v")).agg(count(lit(1)).cast("double").as("_c"))
      // distributed midranks — same r12 discipline as gini (the price
      // grid is data-scale; cum − c reproduces the lag-window prefix
      // exactly on integer-valued counts)
      val ranks = graft.core.Ranks.withGlobalCumSums(g, Seq(col("_v")),
          Seq((col("_c"), "_cs")))
        .select(col("_v"),
          ((col("_cs") - col("_c")) + (col("_c") + 1.0) / 2.0).as("_r"),
          col("_c"))
      val joined = o.join(ranks, "_v")
      val st = joined.agg(
        sum(when(col("_a"), 1.0).otherwise(0.0)).as("_na"),
        sum(when(!col("_a"), 1.0).otherwise(0.0)).as("_nb"),
        sum(when(col("_a"), col("_r")).otherwise(0.0)).as("_ra"))
      val ties = g.agg(sum(col("_c") * col("_c") * col("_c") - col("_c")).as("_t3"))
      val n = col("_na") + col("_nb")
      val u = col("_ra") - col("_na") * (col("_na") + 1.0) / 2.0
      val mu = col("_na") * col("_nb") / 2.0
      val sig = sqrt(col("_na") * col("_nb") / 12.0 *
        ((n + 1.0) - col("_t3") / (n * (n - 1.0))))
      st.crossJoin(broadcast(ties))
        .select(col("_na").cast("long").as("n_a"), col("_nb").cast("long").as("n_b"),
          r4(u).as("u_stat"), r4((u - mu) / sig).as("z"),
          (abs(r4((u - mu) / sig)) > 1.96).as("reject"))
    },
    "basket_lift" -> { (s, d) =>
      // market-basket lift: top co-purchased part pairs by
      // lift = P(a,b)·N / (P(a)·P(b)) with min support — pair fan-out is
      // bounded by lines-per-order, generated IN-ROW from the shared
      // basket frame (r12: was an order-key self-join shuffling the pair
      // frame per leg); marginals from the exploded basket; lift ROUNDED
      // before the top-15 selection. The basket frame feeds THREE
      // consumers → checkpointed (scan-count certainty, r10 discipline)
      val b = AnalyticsQueries.baskets(Tables.lineitem(s, d)).localCheckpoint()
      val nOrders = b.agg(count(lit(1)).cast("double").as("_no"))
      val perPart = b.select(explode(col("ps")).as("p"))
        .groupBy(col("p")).agg(count(lit(1)).cast("double").as("_np"))
      val pairs = AnalyticsQueries.basketPairs(b)
        .groupBy(col("p1"), col("p2"))
        .agg(count(lit(1)).cast("double").as("_npair"))
        .filter(col("_npair") >= 2.0)
      pairs
        .join(perPart.select(col("p").as("p1"), col("_np").as("_n1")), "p1")
        .join(perPart.select(col("p").as("p2"), col("_np").as("_n2")), "p2")
        .crossJoin(broadcast(nOrders))
        .select(col("p1").cast("long").as("p1"), col("p2").cast("long").as("p2"),
          col("_npair").cast("long").as("n_pair"),
          r4(col("_npair") * col("_no") / (col("_n1") * col("_n2"))).as("lift"))
        .orderBy(col("lift").desc, col("p1"), col("p2")).limit(15)
    },
    "gmm_em" -> { (s, d) =>
      // 2-component 1-D Gaussian mixture on scaled totalprice: fixed
      // 10-round EM (one map-side-combined aggregate per round, driver
      // holds only the 5 parameters) — the whole fit replays in SQL as
      // 10 chained CTEs
      graft.cluster.GMM.fit1dFrame(Tables.orders(s, d),
        col("o_totalprice") / 100000.0, rounds = 10)
    },
    "gmm_assign" -> { (s, d) =>
      // fit/predict separation for the mixture: refit (same fixed-round
      // EM), then hard-assign on the ROUNDED posterior — a pure codegen
      // scan against the 5 literal parameters
      val o = Tables.orders(s, d)
      val y = col("o_totalprice") / 100000.0
      graft.cluster.GMM.assign1d(o, y, graft.cluster.GMM.fit1d(o, y, rounds = 10))
    },
    "corr_matrix" -> { (s, d) =>
      // pairwise Pearson correlation + sample covariance of the lineitem
      // numerics: ALL sufficient stats from ONE codegen aggregate; the 6
      // pair rows explode from structs over that single row (the
      // aggregate never re-executes per pair)
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = (count(lit(1)).cast("double").as("_n") +:
        cs.map(c => sum(col(c)).as(s"_s_$c"))) ++
        (for { i <- cs.indices; j <- i until cs.length }
          yield sum(col(cs(i)) * col(cs(j))).as(s"_q_${i}_$j"))
      val g = Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      def covOf(i: Int, j: Int) = {
        val (a, b) = (math.min(i, j), math.max(i, j))
        (col(s"_q_${a}_$b") - col(s"_s_${cs(i)}") * col(s"_s_${cs(j)}") / col("_n")) /
          (col("_n") - 1)
      }
      val pairs = for { i <- cs.indices; j <- (i + 1) until cs.length } yield
        struct(lit(cs(i)).as("c1"), lit(cs(j)).as("c2"),
          r6(covOf(i, j)).as("cov"),
          r6(covOf(i, j) / sqrt(covOf(i, i) * covOf(j, j))).as("corr"))
      g.select(explode(array(pairs: _*)).as("p")).select(col("p.*")).orderBy("c1", "c2")
    },
    "rolling_features" -> { (s, d) =>
      // per-event 3-day rolling count/sum (the feature-engineering shape
      // behind fraud/engagement models): RANGE frame on integer
      // microseconds over ONE user_id shuffle; per-user summary bounds
      // the output
      val w = Window.partitionBy(col("user_id")).orderBy(col("_us"))
        .rangeBetween(-3L * 86400000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id").cast("long").as("user_id"),
          unix_micros(col("ts")).as("_us"), col("value"))
        .withColumn("_rc", count(lit(1)).over(w))
        .withColumn("_rs", sum(col("value")).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_events"),
          max(col("_rc")).cast("long").as("max_3d_events"),
          r4(max(col("_rs"))).as("max_3d_value"),
          r4(avg(col("_rc"))).as("avg_3d_events"))
        .orderBy("user_id")
    },
    "event_paths" -> { (s, d) =>
      // top-10 3-step event-type paths (the user-journey n-gram): two
      // lead() hops on the same user window, one path-key groupBy,
      // TakeOrdered top-N with (n desc, path) tie-break
      val w = Window.partitionBy(col("user_id")).orderBy(col("_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type").as("_t"),
          unix_micros(col("ts")).as("_us"))
        .withColumn("_t2", lead(col("_t"), 1).over(w))
        .withColumn("_t3", lead(col("_t"), 2).over(w))
        .filter(col("_t3").isNotNull)
        .select(concat_ws(">", col("_t"), col("_t2"), col("_t3")).as("path"))
        .groupBy("path").agg(count(lit(1)).cast("long").as("n"))
        .orderBy(col("n").desc, col("path")).limit(10)
    },
    "bootstrap_ci" -> { (s, d) =>
      // 95% CI of mean(o_totalprice) by POISSON bootstrap (the one-pass
      // distributed bootstrap: per-replicate weight ~ Poisson(1) via an
      // md5-uniform inverse-CDF CASE chain — deterministic in both
      // engines); B=100 replicate means from ONE map-side-combined
      // aggregate, CI bounds by rank select on the 100-row frame
      val b = broadcast(s.range(100).select(col("id").as("b")))
      val u = graft.core.Num.md5Long(
        concat(col("o_orderkey").cast("string"), lit("_bs_"), col("b"))) % 1000000L / lit(1000000.0)
      // cumulative Poisson(1) pmf thresholds (9-decimal literals)
      val pw = when(u < 0.367879441, 0.0).when(u < 0.735758882, 1.0)
        .when(u < 0.919698603, 2.0).when(u < 0.980983510, 3.0)
        .when(u < 0.996304736, 4.0).when(u < 0.999368981, 5.0)
        .when(u < 0.999879690, 6.0).otherwise(7.0)
      // the ×100 expansion multiplies work per input split — re-spread the
      // (typically single-file) orders scan so the md5 weight map runs on
      // every core instead of one task
      val means = Tables.ensureParallelism(
          Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")))
        .crossJoin(b)
        .select(col("b"), pw.as("_w"), col("o_totalprice").as("_x"))
        .groupBy("b")
        .agg((sum(col("_w") * col("_x")) / sum(col("_w"))).as("_mb"))
      val wr = Window.orderBy(round(col("_mb"), 4), col("b"))
      means.withColumn("_rn", row_number().over(wr))
        .agg(count(lit(1)).cast("long").as("n_replicates"),
          r4(avg(col("_mb"))).as("boot_mean"),
          r4(max(when(col("_rn") === 3, col("_mb")))).as("ci_lo"),
          r4(max(when(col("_rn") === 98, col("_mb")))).as("ci_hi"))
    },
    "funnel" -> { (s, d) =>
      // ordered signup → view → purchase funnel: running-min window
      // chaining on ONE user_id shuffle (no per-step self-join)
      graft.events.Funnel.funnel3(Tables.events(s, d), "signup", "view", "purchase")
    },
    "retention" -> { (s, d) =>
      // weekly cohort retention; integer epoch-week buckets
      graft.events.Funnel.retentionWeekly(Tables.events(s, d))
    },
    "ann_ivf" -> { (s, d) =>
      // PARTIAL HASH GATE (hw_fit_opt/als precedent): the query count is
      // deterministic SQL and the recall floor is a ≥-invariant of the
      // seeded index build; the continuous recall stays on the library
      // recallSummary surface, spec-gated in OperatorSpec
      // floors tightened r12 to observed−margin (measured 0.69/0.83/0.69
      // across sf0.001/0.01/0.1): a floor nobody can hit by accident
      val e = Tables.embeddings(s, d)
      IVF.recallSummary(e, e.filter(col("vec_id") < 20), "vec_id", "embedding",
          nCells = 16, k = 5, nprobe = 4)
        .select(col("n_queries"), (col("avg_recall") >= 0.6).as("recall_floor"))
    },
    "ann_pq" -> { (s, d) =>
      // r13: production configuration — 64-code ADC shortlist (50) +
      // exact rerank over the bounded shortlist (PQ.topKRefined, the
      // FAISS IndexRefine shape). Floor raised 0.28 → 0.6: observed
      // 0.82/0.94/0.91 across sf0.1/0.01/0.001 (r12 floors were the
      // unrefined ADC's 0.32–0.39)
      val e = Tables.embeddings(s, d)
      graft.neighbors.PQ.recallSummary(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", m = 8, kCodes = 64, k = 5, shortlist = 50)
        .select(col("n_queries"), col("compression_x"),
          (col("avg_recall") >= 0.6).as("recall_floor"))
    },
    "ann_ivfpq" -> { (s, d) =>
      // r13: IVFADC+R — residual-ADC shortlist + exact rerank. Floor
      // raised 0.28 → 0.5: observed 0.63/0.81/0.73 across the SFs
      // (ceiling is the nprobe=4/16 cell recall, cf ann_ivf's 0.69)
      val e = Tables.embeddings(s, d)
      graft.neighbors.IVFPQ.recallSummary(e, e.filter(col("vec_id") < 20),
          "vec_id", "embedding", nCells = 16, m = 8, kCodes = 64, k = 5,
          nprobe = 4, shortlist = 50)
        .select(col("n_queries"), col("compression_x"), col("probed_frac"),
          (col("avg_recall") >= 0.5).as("recall_floor"))
    },
    "trustworthiness" -> { (s, d) =>
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 200)
      val proj = RandomProjection.project(e, "vec_id", "embedding",
          RandomProjection.gaussianMatrix(64, 8, 42L))
        .select(col("id").as("vec_id"),
          array((0 until 8).map(j => col(s"rp_$j")): _*).as("emb8"))
      Trustworthiness.compute(e, proj, "vec_id", "embedding", "emb8", 5)
    },
    "make_blobs" -> { (s, _) =>
      Datasets.makeBlobs(s, 3000L, BlobCenters, 1.0)
        .groupBy("cluster")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg("x")).as("mean_x"), r4(avg("y")).as("mean_y"),
          r4(stddev_samp(col("x"))).as("sd_x"))
        .orderBy("cluster")
    },
    "make_regression" -> { (s, _) =>
      val df = Datasets.makeRegression(s, 3000L, Seq(3.5, -2.0), 7.0, 0.1)
      val m = graft.linear.OLS.fit(df, Seq("x0", "x1"), "y")
      import s.implicits._
      m.terms.zip(m.coefs).map { case (t, c) => (t, math.rint(c * 10000) / 10000) }
        .toDF("term", "coef").orderBy("term")
    }
  )

  private def mdSql(arg: String) = s"('0x' || substr(md5($arg), 1, 15))::BIGINT"
  // fully parenthesized: the fragment is spliced inside products (2·π·u)
  private def uSql(tag: String, suffix: String) =
    s"((${mdSql(s"'$tag' || id::VARCHAR || '$suffix'")} % 1000000)::DOUBLE / 1000000.0 + 5e-7)"
  private def gaussSql(tag: String, dim: String) =
    s"sqrt(-2.0 * ln(${uSql(tag, s"_${dim}_a")})) * cos(2.0 * pi() * ${uSql(tag, s"_${dim}_b")})"

  /** Trustworthiness replayed in SQL: original-space ranks by window, the
    * 8-dim embedding regenerated from the md5-seeded projection (rounded
    * exactly as RandomProjection.project rounds), penalty sum, T formula. */
  private def trustOracle: String = {
    def hp(b: Int, s: String) =
      s"('0x' || substr(md5('p_42_' || $b || '_' || i || '_$s'), 1, 15))::BIGINT"
    def entry(b: Int) = {
      val u1 = s"(((${hp(b, "a")} % 1000000 + 1000000) % 1000000) / 1000000.0 + 5e-7)"
      val u2 = s"(((${hp(b, "b")} % 1000000 + 1000000) % 1000000) / 1000000.0)"
      s"(sqrt(-2.0 * ln($u1)) * cos(2.0 * pi() * $u2) / sqrt(8.0))"
    }
    val wlist = (0 until 8).map { b =>
      s"round(list_sum(list_transform(range(0, 64), i -> v[i+1] * ${entry(b)})), 4)"
    }.mkString("[", ", ", "]")
    s"""WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200),
       |proj AS (SELECT id, $wlist AS w FROM e),
       |orank AS (SELECT a.id AS qid, b.id AS id,
       |    row_number() OVER (PARTITION BY a.id ORDER BY list_distance(a.v, b.v) ASC, b.id) AS r
       |  FROM e a JOIN e b ON a.id <> b.id),
       |ep AS (SELECT a.id AS qid, b.id AS id, list_distance(a.w, b.w) AS s
       |  FROM proj a JOIN proj b ON a.id <> b.id),
       |ek AS (SELECT qid, id FROM (
       |    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY s ASC, id) AS rank FROM ep)
       |  WHERE rank <= 5),
       |pen AS (SELECT coalesce(sum(greatest(orank.r - 5, 0)), 0)::DOUBLE AS p
       |  FROM ek JOIN orank ON ek.qid = orank.qid AND ek.id = orank.id),
       |nn AS (SELECT count(*)::DOUBLE AS n FROM e)
       |SELECT n::BIGINT AS n, 5::BIGINT AS k,
       |  round(1.0 - 2.0 / (n * 5 * (2.0 * n - 3.0 * 5 - 1.0)) * p, 4) AS trustworthiness
       |FROM pen, nn""".stripMargin
  }

  /** The gmm_em chained-CTE replay (p0 = moment init; each pK = one
    * aggregate over yv × p{K-1} — round-for-round GMM.fit1d's loop),
    * shared by the fit and assign oracles. */
  private lazy val gmmCtes: String = {
    val rounds = (1 to 10).map { k =>
      s"""p$k AS MATERIALIZED (SELECT n, sy, syy,
         |    sw / n AS pi1, swy / sw AS mu1,
         |    sqrt(swyy / sw - (swy / sw) * (swy / sw)) AS s1,
         |    (sy - swy) / (n - sw) AS mu2,
         |    sqrt((syy - swyy) / (n - sw) - ((sy - swy) / (n - sw)) * ((sy - swy) / (n - sw))) AS s2,
         |    sll / n - ln(sqrt(2 * pi())) AS ll
         |  FROM (SELECT max(n) AS n, max(sy) AS sy, max(syy) AS syy,
         |      sum(f1 / (f1 + f2)) AS sw, sum(f1 / (f1 + f2) * y) AS swy,
         |      sum(f1 / (f1 + f2) * y * y) AS swyy, sum(ln(f1 + f2)) AS sll
         |    FROM (SELECT yv.y, p.n, p.sy, p.syy,
         |        p.pi1 * exp(-(yv.y - p.mu1) * (yv.y - p.mu1) / (2 * p.s1 * p.s1)) / p.s1 AS f1,
         |        (1 - p.pi1) * exp(-(yv.y - p.mu2) * (yv.y - p.mu2) / (2 * p.s2 * p.s2)) / p.s2 AS f2
         |      FROM yv, p${k - 1} p)))""".stripMargin
    }.mkString(",\n")
    s"""yv AS MATERIALIZED (SELECT o_totalprice / 100000.0 AS y FROM orders),
       |p0 AS (SELECT count(*)::DOUBLE AS n, sum(y) AS sy, sum(y * y) AS syy,
       |    0.5 AS pi1, avg(y) - stddev_samp(y) AS mu1, stddev_samp(y) AS s1,
       |    avg(y) + stddev_samp(y) AS mu2, stddev_samp(y) AS s2, 0.0 AS ll
       |  FROM yv),
       |$rounds""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "hbos_outlier" ->
      """WITH lg AS (
        |  SELECT 'qty' AS f, l_quantity::DOUBLE AS v FROM lineitem
        |  UNION ALL SELECT 'price', l_extendedprice::DOUBLE FROM lineitem
        |  UNION ALL SELECT 'disc', l_discount::DOUBLE FROM lineitem),
        |st AS (SELECT f, min(v) AS lo, max(v) AS hi, count(*)::DOUBLE AS nf
        |  FROM lg GROUP BY f),
        |bn AS (SELECT f, v, CASE WHEN hi = lo THEN 0
        |    ELSE least(floor((v - lo) / ((hi - lo) / 10)), 9.0)::BIGINT END AS bin
        |  FROM lg JOIN st USING (f)),
        |hist AS (SELECT f, bin, count(*)::BIGINT AS n,
        |    round(count(*) / max(nf), 6) AS p,
        |    round(-ln(count(*) / max(nf)), 6) AS score_term
        |  FROM bn JOIN st USING (f) GROUP BY f, bin),
        |rows_scored AS (SELECT
        |    (SELECT score_term FROM hist h JOIN st s ON h.f = s.f WHERE h.f = 'qty'
        |      AND h.bin = CASE WHEN s.hi = s.lo THEN 0 ELSE least(floor((l.l_quantity - s.lo) / ((s.hi - s.lo) / 10)), 9.0)::BIGINT END) +
        |    (SELECT score_term FROM hist h JOIN st s ON h.f = s.f WHERE h.f = 'price'
        |      AND h.bin = CASE WHEN s.hi = s.lo THEN 0 ELSE least(floor((l.l_extendedprice - s.lo) / ((s.hi - s.lo) / 10)), 9.0)::BIGINT END) +
        |    (SELECT score_term FROM hist h JOIN st s ON h.f = s.f WHERE h.f = 'disc'
        |      AND h.bin = CASE WHEN s.hi = s.lo THEN 0 ELSE least(floor((l.l_discount - s.lo) / ((s.hi - s.lo) / 10)), 9.0)::BIGINT END)
        |    AS sc FROM lineitem l),
        |summary AS (SELECT count(*)::BIGINT AS n_rows,
        |    sum(CASE WHEN round(sc, 6) >= 9.0 THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        |    round(max(round(sc, 6)), 4) AS max_score FROM rows_scored)
        |SELECT f, bin, n, p, score_term, n_rows, n_outliers, max_score
        |FROM hist CROSS JOIN summary ORDER BY f, bin""".stripMargin,
    "conformal_interval" ->
      """WITH t AS (SELECT l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR AS id,
        |    l_quantity::DOUBLE AS x, l_extendedprice::DOUBLE AS y FROM lineitem),
        |s AS (SELECT x, y,
        |    ('0x' || substr(md5(id || '_conf'), 1, 15))::BIGINT % 10 AS sp FROM t),
        |fit AS (SELECT count(*)::DOUBLE AS ntr,
        |    round((count(*) * sum(x*y) - sum(x) * sum(y)) /
        |      (count(*) * sum(x*x) - sum(x) * sum(x)), 6) AS b1,
        |    sum(x) AS sx, sum(y) AS sy FROM s WHERE sp < 6),
        |fit2 AS (SELECT ntr, b1, round(sy / ntr - b1 * (sx / ntr), 6) AS b0 FROM fit),
        |sc AS (SELECT sp, round(abs(y - (b0 + b1 * x)), 4) AS r FROM s, fit2),
        |cal AS (SELECT r, count(*) AS c FROM sc WHERE sp IN (6, 7) GROUP BY r),
        |cum AS (SELECT r, sum(c) OVER (ORDER BY r) AS cum,
        |    sum(c) OVER () AS tot FROM cal),
        |q AS (SELECT min(CASE WHEN cum >= least(ceil((tot + 1) * 0.9), tot)
        |      THEN r END) AS qhat,
        |    max(tot)::BIGINT AS n_calib FROM cum),
        |tst AS (SELECT count(*)::BIGINT AS n_test,
        |    round(avg(CASE WHEN r <= qhat THEN 1.0 ELSE 0.0 END), 4) AS coverage,
        |    max(qhat) AS qh, max(n_calib) AS nc FROM sc, q WHERE sp >= 8)
        |SELECT ntr::BIGINT AS n_train, nc AS n_calib, n_test, b1 AS slope,
        |  b0 AS intercept, round(qh, 4) AS qhat, round(qh * 2, 4) AS interval_width,
        |  coverage, coverage >= 0.85 AS coverage_floor
        |FROM fit2, tst""".stripMargin,
    "bloom_join" ->
      """WITH bk AS (SELECT DISTINCT o_orderkey::BIGINT AS k FROM orders
        |  WHERE o_totalprice > 150000),
        |bits AS (SELECT DISTINCT pos FROM (
        |  SELECT unnest([
        |    ('0x' || substr(md5(k::VARCHAR || '_bj_0'), 1, 15))::BIGINT % 262144,
        |    ('0x' || substr(md5(k::VARCHAR || '_bj_1'), 1, 15))::BIGINT % 262144,
        |    ('0x' || substr(md5(k::VARCHAR || '_bj_2'), 1, 15))::BIGINT % 262144]) AS pos
        |  FROM bk)),
        |pr AS (SELECT l_orderkey::BIGINT AS k,
        |    ('0x' || substr(md5(l_orderkey::VARCHAR || '_bj_0'), 1, 15))::BIGINT % 262144 AS p0,
        |    ('0x' || substr(md5(l_orderkey::VARCHAR || '_bj_1'), 1, 15))::BIGINT % 262144 AS p1,
        |    ('0x' || substr(md5(l_orderkey::VARCHAR || '_bj_2'), 1, 15))::BIGINT % 262144 AS p2
        |  FROM lineitem),
        |pass AS (SELECT k FROM pr
        |  WHERE p0 IN (SELECT pos FROM bits) AND p1 IN (SELECT pos FROM bits)
        |    AND p2 IN (SELECT pos FROM bits)),
        |agg AS (SELECT
        |  (SELECT count(*) FROM bk)::BIGINT AS n_build_keys,
        |  (SELECT count(*) FROM pr)::BIGINT AS n_probe,
        |  (SELECT count(*) FROM pass)::BIGINT AS n_pass_bloom,
        |  (SELECT count(*) FROM pass WHERE k IN (SELECT k FROM bk))::BIGINT AS n_true_match)
        |SELECT n_build_keys, n_probe, n_pass_bloom, n_true_match,
        |  n_pass_bloom - n_true_match AS n_false_pos,
        |  CASE WHEN n_probe > n_true_match THEN
        |    round((n_pass_bloom - n_true_match) / (n_probe - n_true_match)::DOUBLE, 6)
        |  ELSE 0.0 END AS fp_rate
        |FROM agg""".stripMargin,
    "trustworthiness" -> trustOracle,
    // ANN partial gates: deterministic query-set count (+ literal
    // compression/probe parameters) hashed, recall floors as invariants
    "ann_ivf" ->
      """SELECT count(*)::BIGINT AS n_queries, TRUE AS recall_floor
        |FROM embeddings WHERE vec_id < 20""".stripMargin,
    "ann_pq" ->
      """SELECT count(*)::BIGINT AS n_queries,
        |  (max(len(embedding)) * 4 / 8)::BIGINT AS compression_x,
        |  TRUE AS recall_floor
        |FROM embeddings WHERE vec_id < 20""".stripMargin,
    "ann_ivfpq" ->
      """SELECT count(*)::BIGINT AS n_queries,
        |  (max(len(embedding)) * 4 / 8)::BIGINT AS compression_x,
        |  0.25::DOUBLE AS probed_frac,
        |  TRUE AS recall_floor
        |FROM embeddings WHERE vec_id < 20""".stripMargin,
    // the oracle states the SEMANTICS as the raw theta join (DuckDB's
    // IEJoin handles it at oracle scale); the Spark side must produce the
    // identical pair set through the bucketized equi-join
    "range_join" ->
      """WITH j AS (SELECT c.c_custkey AS id, c.c_acctbal AS p, s.s_suppkey AS rid
        |  FROM customer c JOIN supplier s
        |    ON s.s_acctbal - 50 <= c.c_acctbal AND c.c_acctbal <= s.s_acctbal + 50)
        |SELECT count(*)::BIGINT AS n_pairs, count(DISTINCT id)::BIGINT AS n_points,
        |  count(DISTINCT rid)::BIGINT AS n_intervals, round(avg(p), 4) AS avg_point
        |FROM j""".stripMargin,
    "cem_att" ->
      """WITH b AS (SELECT o_orderpriority AS p,
        |    least(floor(o_totalprice / 50000.0), 9.0)::BIGINT AS bn,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 >= 500
        |      THEN 1 ELSE 0 END AS t,
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y FROM orders),
        |s AS (SELECT p, bn,
        |    sum(CASE WHEN t = 1 THEN 1.0 ELSE 0.0 END) AS nt,
        |    sum(CASE WHEN t = 1 THEN y ELSE 0.0 END) AS st,
        |    sum(CASE WHEN t = 0 THEN 1.0 ELSE 0.0 END) AS nc,
        |    sum(CASE WHEN t = 0 THEN y ELSE 0.0 END) AS sc
        |  FROM b GROUP BY p, bn),
        |f AS (SELECT * FROM s WHERE nt > 0.0 AND nc > 0.0)
        |SELECT count(*)::BIGINT AS n_strata, sum(nt)::BIGINT AS n_treated_matched,
        |  round(sum(nt * (st / nt - sc / nc)) / sum(nt), 4) AS att
        |FROM f""".stripMargin,
    "reg_discontinuity" ->
      """WITH b AS (SELECT o_totalprice - 200000.0 AS x,
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y FROM orders),
        |g AS (SELECT
        |    sum(CASE WHEN x >= -100000.0 AND x < 0.0 THEN 1.0 ELSE 0.0 END) AS nl,
        |    sum(CASE WHEN x >= -100000.0 AND x < 0.0 THEN x ELSE 0.0 END) AS sxl,
        |    sum(CASE WHEN x >= -100000.0 AND x < 0.0 THEN y ELSE 0.0 END) AS syl,
        |    sum(CASE WHEN x >= -100000.0 AND x < 0.0 THEN x * x ELSE 0.0 END) AS sxxl,
        |    sum(CASE WHEN x >= -100000.0 AND x < 0.0 THEN x * y ELSE 0.0 END) AS sxyl,
        |    sum(CASE WHEN x >= 0.0 AND x <= 100000.0 THEN 1.0 ELSE 0.0 END) AS nr,
        |    sum(CASE WHEN x >= 0.0 AND x <= 100000.0 THEN x ELSE 0.0 END) AS sxr,
        |    sum(CASE WHEN x >= 0.0 AND x <= 100000.0 THEN y ELSE 0.0 END) AS syr,
        |    sum(CASE WHEN x >= 0.0 AND x <= 100000.0 THEN x * x ELSE 0.0 END) AS sxxr,
        |    sum(CASE WHEN x >= 0.0 AND x <= 100000.0 THEN x * y ELSE 0.0 END) AS sxyr
        |  FROM b),
        |f AS (SELECT nl, nr,
        |    syl / nl - (sxyl - sxl * syl / nl) / (sxxl - sxl * sxl / nl) * (sxl / nl) AS il,
        |    syr / nr - (sxyr - sxr * syr / nr) / (sxxr - sxr * sxr / nr) * (sxr / nr) AS ir
        |  FROM g)
        |SELECT nl::BIGINT AS n_left, nr::BIGINT AS n_right,
        |  round(il, 4) AS left_limit, round(ir, 4) AS right_limit,
        |  round(ir - il, 4) AS rd_effect
        |FROM f""".stripMargin,
    "huber_reg" -> {
      val rounds = (1 to 8).map { k =>
        s"""p$k AS MATERIALIZED (SELECT
           |    (swy * swxx - swx * swxy) / (sw * swxx - swx * swx) AS b0,
           |    (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS b1
           |  FROM (SELECT sum(w) AS sw, sum(w * x) AS swx, sum(w * x * x) AS swxx,
           |      sum(w * y) AS swy, sum(w * x * y) AS swxy
           |    FROM (SELECT x, y, CASE WHEN abs(e) <= 0.5 THEN 1.0 ELSE 0.5 / abs(e) END AS w
           |      FROM (SELECT v.x, v.y, v.y - (p.b0 + p.b1 * v.x) AS e
           |        FROM xv v, p${k - 1} p))))""".stripMargin
      }.mkString(",\n")
      s"""WITH xv AS MATERIALIZED (SELECT l_extendedprice / 100000.0 AS y,
         |    l_quantity / 10.0 AS x FROM lineitem),
         |g0 AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx, sum(y) AS sy,
         |    sum(x * x) AS sxx, sum(x * y) AS sxy FROM xv),
         |p0 AS (SELECT sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * (sx / n) AS b0,
         |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b1 FROM g0),
         |$rounds,
         |mar AS (SELECT avg(abs(v.y - (p.b0 + p.b1 * v.x))) AS m, count(*)::BIGINT AS n
         |  FROM xv v, p8 p)
         |SELECT mar.n, round(p8.b0, 6) AS b0, round(p8.b1, 6) AS b1,
         |  round(mar.m, 4) AS mean_abs_resid
         |FROM p8, mar""".stripMargin
    },
    "tweedie_reg" -> {
      val rounds = (1 to 8).map { k =>
        s"""p$k AS MATERIALIZED (SELECT
           |    (swz * swxx - swx * swxz) / (sw * swxx - swx * swx) AS b0,
           |    (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
           |  FROM (SELECT sum(w) AS sw, sum(w * x) AS swx, sum(w * x * x) AS swxx,
           |      sum(w * z) AS swz, sum(w * x * z) AS swxz
           |    FROM (SELECT x, y, mu, sqrt(mu) AS w, (b0 + b1 * x) + (y - mu) / mu AS z
           |      FROM (SELECT v.x, v.y, p.b0, p.b1, exp(p.b0 + p.b1 * v.x) AS mu
           |        FROM xv v, p${k - 1} p))))""".stripMargin
      }.mkString(",\n")
      s"""WITH xv AS MATERIALIZED (SELECT l_quantity::DOUBLE AS y, l_discount::DOUBLE AS x FROM lineitem),
         |p0 AS (SELECT ln(avg(y)) AS b0, 0.0 AS b1 FROM xv),
         |$rounds,
         |mm AS (SELECT avg(exp(p.b0 + p.b1 * v.x)) AS m, count(*)::BIGINT AS n
         |  FROM xv v, p8 p)
         |SELECT mm.n, round(p8.b0, 6) AS b0, round(p8.b1, 6) AS b1,
         |  round(mm.m, 4) AS mean_mu
         |FROM p8, mm""".stripMargin
    },
    "tost_equivalence" ->
      """WITH b AS (SELECT o_totalprice AS y,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 >= 500
        |      THEN 1 ELSE 0 END AS ref FROM orders),
        |g AS (SELECT sum(CASE WHEN ref = 1 THEN 1.0 ELSE 0.0 END) AS na,
        |    sum(CASE WHEN ref = 1 THEN y ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN ref = 1 THEN y * y ELSE 0.0 END) AS qa,
        |    sum(CASE WHEN ref = 0 THEN 1.0 ELSE 0.0 END) AS nb,
        |    sum(CASE WHEN ref = 0 THEN y ELSE 0.0 END) AS sb,
        |    sum(CASE WHEN ref = 0 THEN y * y ELSE 0.0 END) AS qb FROM b),
        |v AS (SELECT na, nb, sa, sb,
        |    (qa - sa * sa / na) / (na - 1) AS va,
        |    (qb - sb * sb / nb) / (nb - 1) AS vb FROM g),
        |f AS (SELECT na, nb,
        |    sa / na - sb / nb AS diff,
        |    0.01 * ((sa + sb) / (na + nb)) AS margin,
        |    sqrt(va / na + vb / nb) AS se FROM v)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(diff, 4) AS diff,
        |  round(margin, 4) AS margin,
        |  round((diff + margin) / se, 4) AS t_lower,
        |  round((margin - diff) / se, 4) AS t_upper,
        |  round((diff + margin) / se, 4) > 1.645 AND round((margin - diff) / se, 4) > 1.645 AS equivalent
        |FROM f""".stripMargin,
    "fleiss_kappa" ->
      """WITH t AS (SELECT
        |    (CASE WHEN (-0.1 + 0.004 * l_quantity + 1.5 * l_discount + -2.0 * l_tax) > 0
        |      THEN 1.0 ELSE 0.0 END)
        |    + (CASE WHEN l_tax >= 0.04 THEN 1.0 ELSE 0.0 END)
        |    + (CASE WHEN l_discount >= 0.05 THEN 1.0 ELSE 0.0 END) AS k
        |  FROM lineitem),
        |g AS (SELECT count(*)::DOUBLE AS n, sum(k) AS sk,
        |    avg((k * k + (3.0 - k) * (3.0 - k) - 3.0) / 6.0) AS pb FROM t),
        |f AS (SELECT n, sk / (n * 3.0) AS p1, pb FROM g)
        |SELECT n::BIGINT AS n, round(p1, 4) AS p_positive, round(pb, 4) AS p_agree,
        |  round((pb - (p1 * p1 + (1.0 - p1) * (1.0 - p1))) /
        |    (1.0 - (p1 * p1 + (1.0 - p1) * (1.0 - p1))), 4) AS kappa
        |FROM f""".stripMargin,
    "uplift_by_segment" ->
      """WITH b AS (SELECT o_orderpriority AS segment,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 >= 500
        |      THEN 1 ELSE 0 END AS a,
        |    CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS conv FROM orders),
        |g AS (SELECT segment,
        |    sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) AS na,
        |    sum(CASE WHEN a = 1 THEN conv ELSE 0.0 END) AS ca,
        |    sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) AS nb,
        |    sum(CASE WHEN a = 0 THEN conv ELSE 0.0 END) AS cb
        |  FROM b GROUP BY segment)
        |SELECT segment, na::BIGINT AS n_a, nb::BIGINT AS n_b,
        |  round(ca / na, 4) AS rate_a, round(cb / nb, 4) AS rate_b,
        |  round(cb / nb - ca / na, 4) AS uplift
        |FROM g ORDER BY segment""".stripMargin,
    "scd2_history" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
        |p AS (SELECT user_id, event_id, event_type, tsu,
        |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY tsu, event_id) AS prev
        |  FROM e),
        |c AS (SELECT user_id, event_id, event_type, tsu
        |  FROM p WHERE prev IS NULL OR prev <> event_type),
        |f AS (SELECT user_id, event_type, tsu AS valid_from,
        |    coalesce(lead(tsu, 1) OVER (PARTITION BY user_id ORDER BY tsu, event_id), -1) AS valid_to
        |  FROM c)
        |SELECT user_id, event_type, valid_from, valid_to
        |FROM f ORDER BY user_id, valid_from, event_type""".stripMargin,
    // Yuen: the order-statistics trimming replayed on the per-group
    // distinct-value cumsum — kept copies of value v are
    // max(0, min(cs, n−g) − max(cs−c, g)); winsorized moments add the
    // boundary order statistics v_(g+1)/v_(n−g) back g times each
    "yuen_ttest" ->
      """WITH b AS (SELECT o_totalprice::DOUBLE AS v,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
        |      THEN 1 ELSE 0 END AS g FROM orders),
        |dv AS (SELECT g, v, count(*)::BIGINT AS c FROM b GROUP BY g, v),
        |cum AS (SELECT g, v, c, sum(c) OVER (PARTITION BY g ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcs,
        |  sum(c) OVER (PARTITION BY g) AS n FROM dv),
        |k AS (SELECT g, v, c, gcs, n, ceil(n * 0.2)::BIGINT AS gq,
        |    greatest(0, least(gcs, n - ceil(n * 0.2)::BIGINT)
        |      - greatest(gcs - c, ceil(n * 0.2)::BIGINT)) AS kept
        |  FROM cum),
        |per AS (SELECT g, max(n) AS n, max(gq) AS gq,
        |    sum(v * kept) AS ts, sum(v * v * kept) AS tss,
        |    min(CASE WHEN gcs >= gq + 1 THEN v END) AS vlo,
        |    min(CASE WHEN gcs >= n - gq THEN v END) AS vhi
        |  FROM k GROUP BY g),
        |one AS (SELECT
        |    max(CASE WHEN g = 0 THEN n END) AS na, max(CASE WHEN g = 1 THEN n END) AS nb,
        |    max(CASE WHEN g = 0 THEN gq END) AS ga, max(CASE WHEN g = 1 THEN gq END) AS gb,
        |    max(CASE WHEN g = 0 THEN ts END) AS tsa, max(CASE WHEN g = 1 THEN ts END) AS tsb,
        |    max(CASE WHEN g = 0 THEN tss END) AS tssa, max(CASE WHEN g = 1 THEN tss END) AS tssb,
        |    max(CASE WHEN g = 0 THEN vlo END) AS loa, max(CASE WHEN g = 1 THEN vlo END) AS lob,
        |    max(CASE WHEN g = 0 THEN vhi END) AS hia, max(CASE WHEN g = 1 THEN vhi END) AS hib
        |  FROM per),
        |f AS (SELECT na, nb, ga, gb,
        |    tsa / (na - 2 * ga)::DOUBLE AS tma, tsb / (nb - 2 * gb)::DOUBLE AS tmb,
        |    ((tssa + ga * (loa * loa + hia * hia)) - na * ((tsa + ga * (loa + hia)) / na) * ((tsa + ga * (loa + hia)) / na)) / (na - 1)::DOUBLE
        |      * (na - 1)::DOUBLE / ((na - 2 * ga)::DOUBLE * ((na - 2 * ga) - 1)) AS da,
        |    ((tssb + gb * (lob * lob + hib * hib)) - nb * ((tsb + gb * (lob + hib)) / nb) * ((tsb + gb * (lob + hib)) / nb)) / (nb - 1)::DOUBLE
        |      * (nb - 1)::DOUBLE / ((nb - 2 * gb)::DOUBLE * ((nb - 2 * gb) - 1)) AS db
        |  FROM one)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, ga::BIGINT AS g_a, gb::BIGINT AS g_b,
        |  round(tma, 4) AS trim_mean_a, round(tmb, 4) AS trim_mean_b,
        |  round((tma - tmb) / sqrt(da + db), 4) AS t_yuen,
        |  round((da + db) * (da + db) / (da * da / ((na - 2 * ga) - 1) + db * db / ((nb - 2 * gb) - 1)), 2) AS df,
        |  abs(round((tma - tmb) / sqrt(da + db), 4)) > 1.96 AS reject
        |FROM f""".stripMargin,
    "welch_ttest" ->
      """WITH b AS (SELECT o_totalprice AS y,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
        |      THEN 0 ELSE 1 END AS ref FROM orders),
        |g AS (SELECT sum(CASE WHEN ref = 1 THEN 1.0 ELSE 0.0 END) AS na,
        |    sum(CASE WHEN ref = 1 THEN y ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN ref = 1 THEN y * y ELSE 0.0 END) AS qa,
        |    sum(CASE WHEN ref = 0 THEN 1.0 ELSE 0.0 END) AS nb,
        |    sum(CASE WHEN ref = 0 THEN y ELSE 0.0 END) AS sb,
        |    sum(CASE WHEN ref = 0 THEN y * y ELSE 0.0 END) AS qb FROM b),
        |v AS (SELECT na, nb, sa, sb,
        |    (qa - sa * sa / na) / (na - 1) AS va,
        |    (qb - sb * sb / nb) / (nb - 1) AS vb FROM g),
        |w AS (SELECT na, nb, va, vb,
        |    (sa / na - sb / nb) / sqrt(va / na + vb / nb) AS t,
        |    (va / na + vb / nb) * (va / na + vb / nb) /
        |      ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1)) AS dfw
        |  FROM v)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(t, 4) AS t_stat,
        |  round(dfw, 1) AS df, abs(round(t, 4)) > 1.96 AS reject
        |FROM w""".stripMargin,
    "chi2_test" ->
      """WITH cont AS (SELECT lang, source, count(*)::DOUBLE AS n FROM documents GROUP BY 1, 2),
        |t AS (SELECT sum(n) AS tot, count(DISTINCT lang) AS r, count(DISTINCT source) AS c FROM cont),
        |byl AS (SELECT lang, sum(n) AS nl FROM cont GROUP BY 1),
        |bys AS (SELECT source, sum(n) AS ns FROM cont GROUP BY 1),
        |terms AS (SELECT
        |    power(cont.n - byl.nl * bys.ns / t.tot, 2) / (byl.nl * bys.ns / t.tot) AS term,
        |    t.r AS r, t.c AS c
        |  FROM cont JOIN byl USING (lang) JOIN bys USING (source), t)
        |SELECT round(sum(term), 4) AS chi2, ((max(r) - 1) * (max(c) - 1))::BIGINT AS dof
        |FROM terms""".stripMargin,
    "lift_table" ->
      """WITH s AS (SELECT round(-0.1 + 0.004 * l_quantity + 1.5 * l_discount + -2.0 * l_tax, 6) AS sc,
        |    l_orderkey::VARCHAR || '_' || l_linenumber::VARCHAR AS id,
        |    CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y FROM lineitem),
        |d AS (SELECT ntile(10) OVER (ORDER BY sc DESC, id) AS decile, y FROM s),
        |g AS (SELECT decile, count(*)::BIGINT AS n, sum(y) AS pos FROM d GROUP BY decile),
        |c AS (SELECT decile, n, pos,
        |    sum(pos) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos,
        |    sum(pos) OVER () AS tpos FROM g)
        |SELECT decile::BIGINT AS decile, n, pos::BIGINT AS n_pos,
        |  round(cpos / tpos, 4) AS cum_gain
        |FROM c ORDER BY decile""".stripMargin,
    "word_entropy" ->
      """WITH toks AS (SELECT doc_id, lang,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok FROM documents),
        |t2 AS (SELECT * FROM toks WHERE length(tok) > 0),
        |tf AS (SELECT doc_id, lang, tok, count(*)::DOUBLE AS c FROM t2 GROUP BY 1, 2, 3),
        |wt AS (SELECT doc_id, lang, c, sum(c) OVER (PARTITION BY doc_id) AS tot FROM tf),
        |ent AS (SELECT doc_id, lang, -sum(c / tot * ln(c / tot)) AS h FROM wt GROUP BY 1, 2)
        |SELECT lang, count(*)::BIGINT AS n_docs, round(avg(h), 4) AS avg_entropy,
        |  round(max(h), 4) AS max_entropy
        |FROM ent GROUP BY lang ORDER BY lang""".stripMargin,
    "kl_divergence" ->
      """WITH b AS (SELECT least(floor(o_totalprice / 50000.0), 9)::BIGINT AS bin,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
        |      THEN 0 ELSE 1 END AS ref FROM orders),
        |c AS (SELECT bin, sum(CASE WHEN ref = 1 THEN 1.0 ELSE 0.0 END) AS ca,
        |    sum(CASE WHEN ref = 0 THEN 1.0 ELSE 0.0 END) AS cb FROM b GROUP BY bin),
        |f AS (SELECT coalesce(c.ca, 0.0) AS ca, coalesce(c.cb, 0.0) AS cb
        |  FROM range(10) r(bin) LEFT JOIN c ON c.bin = r.bin),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM f),
        |pq AS (SELECT na, nb, (ca + 1.0) / (na + 10.0) AS p, (cb + 1.0) / (nb + 10.0) AS q
        |  FROM f, t)
        |SELECT max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
        |  round(sum(p * ln(p / q)), 6) AS kl_ab,
        |  round(sum(q * ln(q / p)), 6) AS kl_ba,
        |  round(sum(0.5 * p * ln(p / ((p + q) / 2.0)) + 0.5 * q * ln(q / ((p + q) / 2.0))), 6) AS js
        |FROM pq""".stripMargin,
    "kernel_density" ->
      """WITH g AS (SELECT (i + 1) * 50000.0 AS g FROM range(9) r(i))
        |SELECT g, count(*)::BIGINT AS n,
        |  round(avg(exp(-(o_totalprice - g) * (o_totalprice - g) / (2.0 * 25000.0 * 25000.0)))
        |    * 1e6 / (25000.0 * sqrt(2.0 * pi())), 6) AS density_1e6
        |FROM orders, g GROUP BY g ORDER BY g""".stripMargin,
    // production-sketch partial gate: bin ids + exact slice totals
    // hashed; sketch-dependent bin counts stay engine-internal behind
    // the share/nonneg/bounded invariants (see psi for the exact twin)
    "psi_approx" ->
      """WITH s AS (SELECT CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
        |    THEN 0 ELSE 1 END AS ref FROM orders)
        |SELECT g.i::BIGINT AS bin,
        |  (SELECT sum(ref) FROM s)::BIGINT AS n_ref_total,
        |  (SELECT sum(1 - ref) FROM s)::BIGINT AS n_cur_total,
        |  TRUE AS ref_share_close, TRUE AS term_nonneg, TRUE AS psi_bounded
        |FROM generate_series(1, 10) g(i) ORDER BY bin""".stripMargin,
    "psi" -> {
      val boundCols = (1 to 9).map(k =>
        s"    max(CASE WHEN rn = ceil(n * 0.$k) THEN v END) AS b$k").mkString(",\n")
      val binExpr = "1 + " + (1 to 9).map(k =>
        s"(CASE WHEN v > b$k THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH r0 AS (SELECT round(o_totalprice, 4) AS v,
         |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
         |      THEN 0 ELSE 1 END AS ref
         |  FROM orders),
         |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n
         |  FROM r0 WHERE ref = 1),
         |bd AS (SELECT
         |$boundCols
         |  FROM rk),
         |b AS (SELECT ref, ($binExpr)::BIGINT AS bin FROM r0, bd),
         |c AS (SELECT bin, sum(ref)::DOUBLE AS nr, sum(1 - ref)::DOUBLE AS nc FROM b GROUP BY bin),
         |t AS (SELECT sum(nr) AS tr, sum(nc) AS tc FROM c),
         |tm AS (SELECT bin, nr::BIGINT AS n_ref, nc::BIGINT AS n_cur,
         |    round((nr + 1.0) / (tr + 10.0), 6) AS p_ref,
         |    round((nc + 1.0) / (tc + 10.0), 6) AS p_cur,
         |    round(((nc + 1.0) / (tc + 10.0) - (nr + 1.0) / (tr + 10.0))
         |      * ln(((nc + 1.0) / (tc + 10.0)) / ((nr + 1.0) / (tr + 10.0))), 6) AS psi_term
         |  FROM c, t)
         |SELECT bin, n_ref, n_cur, p_ref, p_cur, psi_term,
         |  round(sum(psi_term) OVER (), 6) AS psi_total
         |FROM tm ORDER BY bin""".stripMargin
    },
    "ks_test" ->
      """WITH r0 AS (SELECT round(o_totalprice, 4) AS v,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
        |      THEN 0 ELSE 1 END AS ref
        |  FROM orders),
        |g AS (SELECT v, sum(ref)::DOUBLE AS nr, sum(1 - ref)::DOUBLE AS nc FROM r0 GROUP BY v),
        |t AS (SELECT sum(nr) AS tr, sum(nc) AS tc FROM g),
        |c AS (SELECT v,
        |    sum(nr) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
        |    sum(nc) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
        |  FROM g),
        |d AS (SELECT max(t.tr)::BIGINT AS n_ref, max(t.tc)::BIGINT AS n_cur,
        |    round(max(abs(c.cr / t.tr - c.cc / t.tc)), 6) AS d_stat FROM c, t)
        |SELECT n_ref, n_cur, d_stat,
        |  round(1.358 * sqrt((n_ref + n_cur) / (n_ref::DOUBLE * n_cur)), 6) AS crit,
        |  d_stat > round(1.358 * sqrt((n_ref + n_cur) / (n_ref::DOUBLE * n_cur)), 6) AS reject
        |FROM d""".stripMargin,
    "pagerank" -> {
      // 8 chained CTE rounds replay the fixed power iteration; the
      // bidirectional edge set has no dangling nodes, so the Spark side's
      // dangling term is exactly 0.0 and both engines compute
      // r' = 0.15/N + 0.85·Σ r/deg
      val rounds = (1 to 8).map { i =>
        val prev = s"r${i - 1}"
        s"""r$i AS (SELECT n2.node, 0.15 / nn.n + 0.85 * coalesce(c.inr, 0) AS rank
           |  FROM nodes n2 LEFT JOIN (
           |    SELECT e.dst AS node, sum($prev.rank / deg.dg) AS inr
           |    FROM e JOIN $prev ON e.src = $prev.node JOIN deg ON e.src = deg.src
           |    GROUP BY e.dst) c ON n2.node = c.node, nn)""".stripMargin
      }.mkString(",\n")
      s"""WITH e0 AS (SELECT DISTINCT 'c' || o.o_custkey::VARCHAR AS src,
         |    's' || l.l_suppkey::VARCHAR AS dst
         |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |deg AS (SELECT src, count(*)::DOUBLE AS dg FROM e GROUP BY src),
         |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
         |$rounds
         |SELECT node, round(rank, 6) AS rank FROM r8
         |ORDER BY round(rank, 6) DESC, node LIMIT 15""".stripMargin
    },
    "range_join_overlap" ->
      """SELECT count(*)::BIGINT AS n_pairs,
        |  count(DISTINCT s.s_suppkey)::BIGINT AS n_supp,
        |  count(DISTINCT c.c_custkey)::BIGINT AS n_cust,
        |  round(avg(least(s.s_acctbal + 50, c.c_acctbal + 30)
        |    - greatest(s.s_acctbal - 50, c.c_acctbal - 30)), 4) AS avg_overlap
        |FROM supplier s JOIN customer c
        |  ON s.s_acctbal - 50 <= c.c_acctbal + 30 AND c.c_acctbal - 30 <= s.s_acctbal + 50""".stripMargin,
    "cardinality_stats" ->
      """SELECT event_type, count(*)::BIGINT AS n_rows,
        |  count(DISTINCT user_id)::BIGINT AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // HLL++ partial gate: exact audit counts + within-10% boolean hashed
    "cardinality_stats_approx" ->
      """SELECT event_type, count(*)::BIGINT AS n_rows,
        |  count(DISTINCT user_id)::BIGINT AS n_distinct, TRUE AS within_10pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // the union-trick as-of join replayed verbatim: right rows sort before
    // left at equal time (side 0 < 1), same-time right rows resolve to the
    // max id via the rid sort key, carry-forward = last_value IGNORE NULLS
    "asof_join" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
        |    event_type, epoch_us(ts) AS us, value::DOUBLE AS value FROM events),
        |u AS (
        |  SELECT user_id AS key, us AS t, 0 AS side, event_id AS rid,
        |      value AS rval, us AS rt, NULL::BIGINT AS lid
        |    FROM e WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, us, 1, NULL::BIGINT, NULL::DOUBLE, NULL::BIGINT, event_id
        |    FROM e WHERE event_type = 'purchase'),
        |w AS (SELECT *,
        |    last_value(rid IGNORE NULLS) OVER win AS a_rid,
        |    last_value(rval IGNORE NULLS) OVER win AS a_rval,
        |    last_value(rt IGNORE NULLS) OVER win AS a_rt
        |  FROM u WINDOW win AS (PARTITION BY key ORDER BY t, side, rid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT lid AS event_id, key AS user_id, a_rid AS click_id,
        |  a_rval AS click_value, t - a_rt AS lag_us
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin,
    // replay of DBSCANGrid.coreSummary at d=2, eps=1, minPts=4: the same
    // 31-bit packed coarse cells, the same 5-offset half-space window
    // (o = ox*2^31 + oy for (0,0),(0,1),(1,-1),(1,0),(1,1)), the same
    // axis-prune + distance verify, degrees off the normalized pair set
    // r11 structure-slice gates for the full DBSCAN family: the eps-pair
    // machinery replays with generic 1-axis blocking (every candidate is
    // distance-verified, so any exact blocking yields the same pair set)
    "dbscan" ->
      """WITH p AS (SELECT event_id::BIGINT AS id, value::DOUBLE AS x,
        |    (user_id % 97)::DOUBLE AS y FROM events),
        |c AS (SELECT id, x, y, floor(x / 1.0)::BIGINT AS bx FROM p),
        |off AS (SELECT unnest([-1, 0, 1]) AS o),
        |pr AS (SELECT a.id AS id, b.id AS bid FROM c a, off, c b
        |  WHERE b.bx = a.bx + off.o AND a.id < b.id
        |    AND abs(a.x - b.x) <= 1.0 AND abs(a.y - b.y) <= 1.0
        |    AND (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) <= 1.0),
        |bd AS (SELECT id, bid FROM pr UNION ALL SELECT bid, id FROM pr),
        |deg AS (SELECT id, count(*) AS dg FROM bd GROUP BY id),
        |fl AS (SELECT p.id, coalesce(deg.dg, 0) >= 3 AS is_core
        |  FROM p LEFT JOIN deg ON p.id = deg.id),
        |nbr AS (SELECT DISTINCT bd.id FROM bd
        |  JOIN fl ON bd.bid = fl.id AND fl.is_core),
        |cls AS (SELECT fl.id, fl.is_core, nbr.id IS NOT NULL AS has_nbr
        |  FROM fl LEFT JOIN nbr ON fl.id = nbr.id)
        |SELECT (is_core OR has_nbr) AS clustered, count(*)::BIGINT AS n,
        |  sum(CASE WHEN is_core THEN 1 ELSE 0 END)::BIGINT AS n_core,
        |  TRUE AS n_clusters_bounded
        |FROM cls GROUP BY 1 ORDER BY clustered""".stripMargin,
    "dbscan_3d" ->
      """WITH p AS (SELECT event_id::BIGINT AS id, value::DOUBLE AS x,
        |    (user_id % 97)::DOUBLE AS y,
        |    ((epoch_us(ts) // 3600000000) % 24) / 2.0 AS z FROM events),
        |c AS (SELECT id, x, y, z, floor(x / 1.0)::BIGINT AS bx FROM p),
        |off AS (SELECT unnest([-1, 0, 1]) AS o),
        |pr AS (SELECT a.id AS id, b.id AS bid FROM c a, off, c b
        |  WHERE b.bx = a.bx + off.o AND a.id < b.id
        |    AND abs(a.x - b.x) <= 1.0 AND abs(a.y - b.y) <= 1.0
        |    AND abs(a.z - b.z) <= 1.0
        |    AND (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y)
        |      + (a.z - b.z)*(a.z - b.z) <= 1.0),
        |bd AS (SELECT id, bid FROM pr UNION ALL SELECT bid, id FROM pr),
        |deg AS (SELECT id, count(*) AS dg FROM bd GROUP BY id),
        |fl AS (SELECT p.id, coalesce(deg.dg, 0) >= 3 AS is_core
        |  FROM p LEFT JOIN deg ON p.id = deg.id),
        |nbr AS (SELECT DISTINCT bd.id FROM bd
        |  JOIN fl ON bd.bid = fl.id AND fl.is_core),
        |cls AS (SELECT fl.id, fl.is_core, nbr.id IS NOT NULL AS has_nbr
        |  FROM fl LEFT JOIN nbr ON fl.id = nbr.id)
        |SELECT (is_core OR has_nbr) AS clustered, count(*)::BIGINT AS n,
        |  sum(CASE WHEN is_core THEN 1 ELSE 0 END)::BIGINT AS n_core,
        |  TRUE AS n_clusters_bounded
        |FROM cls GROUP BY 1 ORDER BY clustered""".stripMargin,
    "dbscan_predict" ->
      """WITH p AS (SELECT event_id::BIGINT AS id, value::DOUBLE AS x,
        |    (user_id % 97)::DOUBLE AS y FROM events),
        |tr AS (SELECT * FROM p WHERE id % 7 <> 0),
        |q AS (SELECT * FROM p WHERE id % 7 = 0),
        |c AS (SELECT id, x, y, floor(x / 1.0)::BIGINT AS bx FROM tr),
        |off AS (SELECT unnest([-1, 0, 1]) AS o),
        |pr AS (SELECT a.id AS id, b.id AS bid FROM c a, off, c b
        |  WHERE b.bx = a.bx + off.o AND a.id < b.id
        |    AND abs(a.x - b.x) <= 1.0 AND abs(a.y - b.y) <= 1.0
        |    AND (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) <= 1.0),
        |bd AS (SELECT id, bid FROM pr UNION ALL SELECT bid, id FROM pr),
        |deg AS (SELECT id, count(*) AS dg FROM bd GROUP BY id),
        |core AS (SELECT c.id, c.x, c.y, c.bx FROM c
        |  JOIN deg ON c.id = deg.id WHERE deg.dg >= 3),
        |qc AS (SELECT id, x, y, floor(x / 1.0)::BIGINT AS bx FROM q),
        |hit AS (SELECT DISTINCT qc.id FROM qc, off, core
        |  WHERE core.bx = qc.bx + off.o
        |    AND (qc.x - core.x)*(qc.x - core.x)
        |      + (qc.y - core.y)*(qc.y - core.y) <= 1.0)
        |SELECT (hit.id IS NOT NULL) AS assigned, count(*)::BIGINT AS n
        |FROM q LEFT JOIN hit ON q.id = hit.id
        |GROUP BY 1 ORDER BY assigned""".stripMargin,
    "dbscan_core" ->
      """WITH p AS (SELECT event_id::BIGINT AS id, value::DOUBLE AS x,
        |    (user_id % 97)::DOUBLE AS y FROM events),
        |c AS (SELECT id, x, y,
        |    (floor(x / 1.0)::BIGINT + 1073741824) * 2147483648
        |      + (floor(y / 1.0)::BIGINT + 1073741824) AS cell FROM p),
        |off AS (SELECT unnest([0, 1, 2147483647, 2147483648, 2147483649]) AS o),
        |b AS (SELECT c.id AS bid, c.x AS bx, c.y AS by_, c.cell AS bcell,
        |    c.cell + off.o AS cell FROM c, off),
        |pr AS (SELECT least(c.id, b.bid) AS id, greatest(c.id, b.bid) AS bid
        |  FROM c JOIN b ON c.cell = b.cell
        |  WHERE (c.cell <> b.bcell OR c.id < b.bid)
        |    AND abs(c.x - b.bx) <= 1.0 AND abs(c.y - b.by_) <= 1.0
        |    AND (c.x - b.bx)*(c.x - b.bx) + (c.y - b.by_)*(c.y - b.by_) <= 1.0),
        |bd AS (SELECT id, bid FROM pr UNION ALL SELECT bid, id FROM pr),
        |deg AS (SELECT id, count(*) AS dg FROM bd GROUP BY id),
        |fl AS (SELECT p.id, coalesce(deg.dg, 0) >= 3 AS is_core
        |  FROM p LEFT JOIN deg ON p.id = deg.id),
        |nbr AS (SELECT DISTINCT bd.id FROM bd
        |  JOIN fl ON bd.bid = fl.id AND fl.is_core),
        |cls AS (SELECT fl.id, fl.is_core, nbr.id IS NOT NULL AS has_nbr
        |  FROM fl LEFT JOIN nbr ON fl.id = nbr.id)
        |SELECT count(*)::BIGINT AS n_points,
        |  (SELECT count(*) FROM pr)::BIGINT AS n_eps_pairs,
        |  sum(CASE WHEN is_core THEN 1 ELSE 0 END)::BIGINT AS n_core,
        |  sum(CASE WHEN NOT is_core AND has_nbr THEN 1 ELSE 0 END)::BIGINT AS n_border,
        |  sum(CASE WHEN NOT is_core AND NOT has_nbr THEN 1 ELSE 0 END)::BIGINT AS n_noise
        |FROM cls""".stripMargin,
    "active_users" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    (epoch_us(ts) // 86400000000) // 7 AS wk FROM events),
        |fw AS (SELECT user_id, min(wk) AS fwk FROM e GROUP BY user_id),
        |wu AS (SELECT DISTINCT user_id, wk FROM e),
        |weekly AS (SELECT wu.wk AS week, count(DISTINCT wu.user_id)::BIGINT AS wau,
        |    sum(CASE WHEN fw.fwk = wu.wk THEN 1 ELSE 0 END)::BIGINT AS n_new
        |  FROM wu JOIN fw USING (user_id) GROUP BY wu.wk),
        |du AS (SELECT DISTINCT user_id, wk, day FROM e),
        |daily AS (SELECT wk AS week, avg(dau) AS avg_dau FROM (
        |    SELECT wk, day, count(*)::DOUBLE AS dau FROM du GROUP BY wk, day)
        |  GROUP BY wk)
        |SELECT w.week::BIGINT AS week, w.wau, w.n_new, (w.wau - w.n_new)::BIGINT AS n_returning,
        |  round(d.avg_dau / w.wau, 4) AS stickiness
        |FROM weekly w JOIN daily d USING (week) ORDER BY week""".stripMargin,
    "attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type AS t, epoch_us(ts) AS us FROM events),
        |l AS (SELECT t, lag(t, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev FROM e),
        |c AS (SELECT prev AS channel, count(*)::DOUBLE AS n FROM l
        |  WHERE t = 'purchase' AND prev IS NOT NULL GROUP BY prev),
        |t AS (SELECT sum(n) AS tot FROM c)
        |SELECT channel, n::BIGINT AS n_conversions, round(n / t.tot, 4) AS share
        |FROM c, t ORDER BY channel""".stripMargin,
    "markov_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type AS f, epoch_us(ts) AS us FROM events),
        |l AS (SELECT f, lead(f, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t FROM e),
        |p AS (SELECT f AS from_type, t AS to_type, count(*)::DOUBLE AS n FROM l
        |  WHERE t IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT from_type, sum(n) AS rt FROM p GROUP BY from_type)
        |SELECT p.from_type, p.to_type, p.n::BIGINT AS n, round(p.n / rt.rt, 4) AS p
        |FROM p JOIN rt USING (from_type) ORDER BY from_type, to_type""".stripMargin,
    "lorenz_curve" ->
      """WITH per AS (SELECT o_custkey AS cust, round(sum(o_totalprice), 2) AS y
        |  FROM orders GROUP BY 1),
        |d AS (SELECT ntile(10) OVER (ORDER BY y, cust) AS decile, y FROM per),
        |g AS (SELECT decile, count(*)::BIGINT AS n, sum(y) AS rev FROM d GROUP BY decile),
        |c AS (SELECT decile, n, rev,
        |    sum(rev) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(rev) OVER () AS tot
        |  FROM g)
        |SELECT decile::BIGINT AS decile, n, round(rev / tot, 4) AS rev_share,
        |  round(cum / tot, 4) AS cum_share
        |FROM c ORDER BY decile""".stripMargin,
    "gini" ->
      """WITH per AS (SELECT o_custkey, round(sum(o_totalprice), 2) AS y FROM orders GROUP BY 1),
        |g AS (SELECT y, count(*)::DOUBLE AS c FROM per GROUP BY y),
        |r AS (SELECT y, coalesce(sum(c) OVER (ORDER BY y
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (c + 1.0) / 2.0 AS rk
        |  FROM g),
        |j AS (SELECT per.y, r.rk FROM per JOIN r USING (y)),
        |st AS (SELECT count(*)::DOUBLE AS n, sum(y) AS sy, sum(rk * y) AS sry FROM j)
        |SELECT n::BIGINT AS n_customers,
        |  round(2.0 * sry / (n * sy) - (n + 1.0) / n, 4) AS gini
        |FROM st""".stripMargin,
    "diff_in_diff" ->
      """WITH e AS (SELECT value, epoch_us(ts) // 86400000000 AS day,
        |    ('0x' || substr(md5(user_id::VARCHAR || '_did_7'), 1, 15))::BIGINT % 1000 < 500 AS b
        |  FROM events),
        |c AS (SELECT
        |    sum(CASE WHEN NOT b AND day < 19737 THEN value ELSE 0.0 END) AS sapre,
        |    sum(CASE WHEN NOT b AND day < 19737 THEN 1.0 ELSE 0.0 END) AS napre,
        |    sum(CASE WHEN NOT b AND day >= 19737 THEN value ELSE 0.0 END) AS sapost,
        |    sum(CASE WHEN NOT b AND day >= 19737 THEN 1.0 ELSE 0.0 END) AS napost,
        |    sum(CASE WHEN b AND day < 19737 THEN value ELSE 0.0 END) AS sbpre,
        |    sum(CASE WHEN b AND day < 19737 THEN 1.0 ELSE 0.0 END) AS nbpre,
        |    sum(CASE WHEN b AND day >= 19737 THEN value ELSE 0.0 END) AS sbpost,
        |    sum(CASE WHEN b AND day >= 19737 THEN 1.0 ELSE 0.0 END) AS nbpost
        |  FROM e)
        |SELECT round(sapre / napre, 4) AS mean_a_pre,
        |  round(sapost / napost, 4) AS mean_a_post,
        |  round(sbpre / nbpre, 4) AS mean_b_pre,
        |  round(sbpost / nbpost, 4) AS mean_b_post,
        |  round((sbpost / nbpost - sbpre / nbpre) - (sapost / napost - sapre / napre), 4) AS did
        |FROM c""".stripMargin,
    "cuped" ->
      """WITH e AS (SELECT user_id, value, epoch_us(ts) // 86400000000 AS day FROM events),
        |per AS (SELECT user_id,
        |    sum(CASE WHEN day < 19737 THEN value ELSE 0.0 END) AS x,
        |    sum(CASE WHEN day >= 19737 THEN value ELSE 0.0 END) AS y
        |  FROM e GROUP BY user_id),
        |st AS (SELECT count(*)::DOUBLE AS n, avg(x) AS mx, avg(y) AS my,
        |    covar_samp(x, y) AS cxy, var_samp(x) AS vx, var_samp(y) AS vy FROM per),
        |adj AS (SELECT st.n, st.cxy / st.vx AS theta, st.vy,
        |    var_samp(per.y - (st.cxy / st.vx) * (per.x - st.mx)) AS vadj
        |  FROM per, st GROUP BY st.n, st.cxy, st.vx, st.vy)
        |SELECT n::BIGINT AS n_users, round(theta, 6) AS theta, round(vy, 4) AS var_y,
        |  round(vadj, 4) AS var_adj, round(1.0 - vadj / vy, 4) AS reduction
        |FROM adj""".stripMargin,
    "topk_per_group" ->
      """WITH rev AS (SELECT l_returnflag AS flag, l_partkey AS part,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT flag, part, rev,
        |    row_number() OVER (PARTITION BY flag ORDER BY rev DESC, part) AS rk
        |  FROM rev)
        |SELECT flag, rk::BIGINT AS rank, part::BIGINT AS part, round(rev, 4) AS revenue
        |FROM r WHERE rk <= 3 ORDER BY flag, rank""".stripMargin,
    "sales_rollup" ->
      """SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |  count(*)::BIGINT AS n, round(sum(o_totalprice), 4) AS revenue
        |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
        |ORDER BY priority NULLS FIRST, status NULLS FIRST""".stripMargin,
    "weekly_growth" ->
      """WITH per AS (SELECT (epoch_us(o_orderdate) // 604800000000)::BIGINT AS week,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT week, round(rev, 4) AS revenue,
        |  round((rev - lag(rev, 1) OVER (ORDER BY week)) / lag(rev, 1) OVER (ORDER BY week), 4) AS wow_growth
        |FROM per ORDER BY week""".stripMargin,
    "kaplan_meier" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |dur AS (SELECT user_id, (max(day) - min(day) + 1)::BIGINT AS d FROM e GROUP BY user_id),
        |g AS (SELECT d, count(*)::DOUBLE AS dd FROM dur GROUP BY d),
        |c AS (SELECT d, dd,
        |    sum(dd) OVER () - coalesce(sum(dd) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS risk
        |  FROM g),
        |s AS (SELECT d, dd, risk,
        |    sum(CASE WHEN dd < risk THEN ln(1.0 - dd / risk) ELSE -1e300 END)
        |      OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lns
        |  FROM c)
        |SELECT d AS duration, risk::BIGINT AS n_risk, dd::BIGINT AS n_events,
        |  round(exp(lns), 6) AS survival
        |FROM s ORDER BY duration""".stripMargin,
    "quantile_reg" -> {
      // p0 = (ȳ, 0) init per tau; each round = the joint 10-sum aggregate
      // + two Cramer 2×2 solves, round-for-round GLM.quantileIrls
      val taus = Seq(0.5, 0.9)
      def res(b0: String, b1: String) = s"y - ($b0 + $b1 * x)"
      def w(t: Double, b0: String, b1: String) =
        s"CASE WHEN ${res(b0, b1)} > 0 THEN $t / greatest(0.1, ${res(b0, b1)}) " +
          s"ELSE ${1.0 - t} / greatest(0.1, -(${res(b0, b1)})) END"
      val rounds = (1 to 30).map { k =>
        val ws = taus.zipWithIndex.map { case (t, i) =>
          s"${w(t, s"b0_$i", s"b1_$i")} AS w$i"
        }.mkString(",\n      ")
        val sums = taus.indices.map(i =>
          s"sum(w$i) AS sw$i, sum(w$i * x) AS swx$i, sum(w$i * x * x) AS swxx$i, " +
            s"sum(w$i * y) AS swy$i, sum(w$i * x * y) AS swxy$i").mkString(",\n    ")
        val coefs = taus.indices.map(i =>
          s"(swy$i * swxx$i - swx$i * swxy$i) / (sw$i * swxx$i - swx$i * swx$i) AS b0_$i,\n" +
            s"    (sw$i * swxy$i - swx$i * swy$i) / (sw$i * swxx$i - swx$i * swx$i) AS b1_$i")
          .mkString(",\n    ")
        s"""r$k AS MATERIALIZED (SELECT
           |    $sums
           |  FROM (SELECT y, x,
           |      $ws
           |    FROM b, p${k - 1})),
           |p$k AS MATERIALIZED (SELECT
           |    $coefs
           |  FROM r$k)""".stripMargin
      }.mkString(",\n")
      val pinballs = taus.zipWithIndex.map { case (t, i) =>
        val r = res(s"p30.b0_$i", s"p30.b1_$i")
        s"avg(CASE WHEN $r >= 0 THEN $t * ($r) ELSE ${t - 1.0} * ($r) END) AS pb$i"
      }.mkString(",\n    ")
      val out = taus.zipWithIndex.map { case (t, i) =>
        s"""SELECT $t AS tau, round(p30.b0_$i, 4) AS b0, round(p30.b1_$i, 6) AS b1,
           |  round(pb.pb$i, 4) AS pinball FROM p30, pb""".stripMargin
      }.mkString("\nUNION ALL ")
      s"""WITH b AS MATERIALIZED (SELECT l_extendedprice / 1000.0 AS y,
         |    l_quantity::DOUBLE AS x FROM lineitem),
         |p0 AS (SELECT avg(y) AS b0_0, 0.0 AS b1_0, avg(y) AS b0_1, 0.0 AS b1_1 FROM b),
         |$rounds,
         |pb AS (SELECT
         |    $pinballs
         |  FROM b, p30)
         |$out ORDER BY tau""".stripMargin
    },
    "poisson_reg" -> {
      // p0 = ln(mean) init; each round = weighted sums + Cramer 2×2,
      // round-for-round GLM.poissonIrls
      val rounds = (1 to 8).map { k =>
        s"""p$k AS MATERIALIZED (SELECT
           |    (swz * swxx - swx * swxz) / (sw * swxx - swx * swx) AS b0,
           |    (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
           |  FROM (SELECT sum(mu) AS sw, sum(mu * x) AS swx, sum(mu * x * x) AS swxx,
           |      sum(mu * z) AS swz, sum(mu * x * z) AS swxz
           |    FROM (SELECT x, y, mu, (b0 + b1 * x) + (y - mu) / mu AS z
           |      FROM (SELECT v.x, v.y, p.b0, p.b1, exp(p.b0 + p.b1 * v.x) AS mu
           |        FROM xv v, p${k - 1} p))))""".stripMargin
      }.mkString(",\n")
      s"""WITH xv AS MATERIALIZED (SELECT l_quantity::DOUBLE AS y, l_discount::DOUBLE AS x FROM lineitem),
         |p0 AS (SELECT ln(avg(y)) AS b0, 0.0 AS b1 FROM xv),
         |$rounds,
         |dev AS (SELECT sum(2.0 * (CASE WHEN y > 0 THEN y * ln(y / mu) ELSE 0.0 END - (y - mu))) AS dv,
         |    count(*)::BIGINT AS n
         |  FROM (SELECT v.y, exp(p.b0 + p.b1 * v.x) AS mu FROM xv v, p8 p))
         |SELECT n, round(p8.b0, 6) AS b0, round(p8.b1, 6) AS b1, round(dv, 4) AS deviance
         |FROM p8, dev""".stripMargin
    },
    "wasserstein_1d" ->
      """WITH o AS (SELECT round(o_totalprice, 2) AS v,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
        |      THEN 0 ELSE 1 END AS a FROM orders),
        |g AS (SELECT v, sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) AS ca,
        |    sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) AS cb FROM o GROUP BY v),
        |c AS (SELECT v, ca, cb,
        |    sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / sum(ca) OVER () AS fa,
        |    sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / sum(cb) OVER () AS fb,
        |    lead(v, 1) OVER (ORDER BY v) AS nextv
        |  FROM g)
        |SELECT sum(ca + cb)::BIGINT AS n_support,
        |  round(sum(abs(fa - fb) * (nextv - v)), 4) AS wasserstein
        |FROM c WHERE nextv IS NOT NULL""".stripMargin,
    "hhi_concentration" ->
      """WITH s AS (SELECT 'source' AS dim, count(*)::DOUBLE AS n FROM documents GROUP BY source),
        |l AS (SELECT 'lang' AS dim, count(*)::DOUBLE AS n FROM documents GROUP BY lang),
        |u AS (SELECT * FROM s UNION ALL SELECT * FROM l)
        |SELECT dim, count(*)::BIGINT AS n_groups,
        |  round(sum(n * n) / (sum(n) * sum(n)), 6) AS hhi
        |FROM u GROUP BY dim ORDER BY dim""".stripMargin,
    "rfm_segments" ->
      """WITH per AS (SELECT o_custkey AS cust,
        |    max(epoch_us(o_orderdate) // 86400000000) AS last_d,
        |    count(*)::BIGINT AS f, sum(o_totalprice) AS m
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(last_d) AS maxd FROM per),
        |b AS (SELECT cust, (mx.maxd - per.last_d)::BIGINT AS r, f, m FROM per, mx),
        |c AS (SELECT cust, m,
        |    ntile(5) OVER (ORDER BY r, cust) AS r_code,
        |    ntile(5) OVER (ORDER BY f DESC, cust) AS f_code
        |  FROM b)
        |SELECT r_code::INT AS r_code, f_code::INT AS f_code,
        |  count(*)::BIGINT AS n_customers, round(avg(m), 4) AS avg_monetary
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "anova_f" ->
      """WITH g AS (SELECT o_orderpriority, count(*)::DOUBLE AS n, sum(o_totalprice) AS s,
        |    sum(o_totalprice * o_totalprice) AS q FROM orders GROUP BY 1),
        |t AS (SELECT sum(n) AS nt, sum(s) AS st, sum(q) AS qt, count(*)::DOUBLE AS k,
        |    sum(s * s / n) AS ssb_raw FROM g)
        |SELECT nt::BIGINT AS n, k::BIGINT AS k,
        |  round((ssb_raw - st * st / nt) / (k - 1) / ((qt - ssb_raw) / (nt - k)), 4) AS f_stat
        |FROM t""".stripMargin,
    "mann_whitney" ->
      """WITH o AS (SELECT o_totalprice AS v,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 < 250
        |      THEN 0 ELSE 1 END AS a FROM orders),
        |g AS (SELECT v, count(*)::DOUBLE AS c FROM o GROUP BY v),
        |r AS (SELECT v, c, coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (c + 1.0) / 2.0 AS rk
        |  FROM g),
        |j AS (SELECT o.a, r.rk FROM o JOIN r ON o.v = r.v),
        |st AS (SELECT sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) AS na,
        |    sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) AS nb,
        |    sum(CASE WHEN a = 1 THEN rk ELSE 0.0 END) AS ra FROM j),
        |tt AS (SELECT sum(c * c * c - c) AS t3 FROM g),
        |f AS (SELECT na, nb, ra - na * (na + 1.0) / 2.0 AS u,
        |    na * nb / 2.0 AS mu,
        |    sqrt(na * nb / 12.0 * ((na + nb + 1.0) - t3 / ((na + nb) * (na + nb - 1.0)))) AS sig
        |  FROM st, tt)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(u, 4) AS u_stat,
        |  round((u - mu) / sig, 4) AS z, abs(round((u - mu) / sig, 4)) > 1.96 AS reject
        |FROM f""".stripMargin,
    "basket_lift" ->
      """WITH a AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |no AS (SELECT count(DISTINCT o)::DOUBLE AS nord FROM a),
        |pp AS (SELECT p, count(*)::DOUBLE AS np FROM a GROUP BY p),
        |pr AS (SELECT x.p AS p1, y.p AS p2, count(*)::DOUBLE AS npair
        |  FROM a x JOIN a y ON x.o = y.o AND x.p < y.p GROUP BY 1, 2),
        |f AS (SELECT p1, p2, npair,
        |    round(npair * no.nord / (n1.np * n2.np), 4) AS lift
        |  FROM pr JOIN pp n1 ON pr.p1 = n1.p JOIN pp n2 ON pr.p2 = n2.p, no
        |  WHERE npair >= 2.0)
        |SELECT p1::BIGINT AS p1, p2::BIGINT AS p2, npair::BIGINT AS n_pair, lift
        |FROM f ORDER BY lift DESC, p1, p2 LIMIT 15""".stripMargin,
    "gmm_em" ->
      s"""WITH $gmmCtes
         |SELECT n::BIGINT AS n, round(pi1, 6) AS pi1,
         |  round(mu1, 4) AS mu1, round(s1, 4) AS sigma1,
         |  round(mu2, 4) AS mu2, round(s2, 4) AS sigma2,
         |  round(ll, 4) AS avg_loglik
         |FROM p10""".stripMargin,
    "gmm_assign" ->
      s"""WITH $gmmCtes
         |SELECT CASE WHEN round(f1 / (f1 + f2), 6) >= 0.5 THEN 0 ELSE 1 END::BIGINT AS component,
         |  count(*)::BIGINT AS n, round(avg(y), 4) AS mean_y
         |FROM (SELECT yv.y,
         |    p.pi1 * exp(-(yv.y - p.mu1) * (yv.y - p.mu1) / (2 * p.s1 * p.s1)) / p.s1 AS f1,
         |    (1 - p.pi1) * exp(-(yv.y - p.mu2) * (yv.y - p.mu2) / (2 * p.s2 * p.s2)) / p.s2 AS f2
         |  FROM yv, p10 p)
         |GROUP BY 1 ORDER BY component""".stripMargin,
    "corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val sums = cs.map(c => s"sum($c) AS s_$c").mkString(", ")
      val qs = (for { i <- cs.indices; j <- i until cs.length }
        yield s"sum(${cs(i)} * ${cs(j)}) AS q_${i}_$j").mkString(", ")
      def cov(i: Int, j: Int) = {
        val (a, b) = (math.min(i, j), math.max(i, j))
        s"((q_${a}_$b - s_${cs(i)} * s_${cs(j)} / n) / (n - 1))"
      }
      val rows = (for { i <- cs.indices; j <- (i + 1) until cs.length } yield
        s"SELECT '${cs(i)}' AS c1, '${cs(j)}' AS c2, round(${cov(i, j)}, 6) AS cov, " +
          s"round(${cov(i, j)} / sqrt(${cov(i, i)} * ${cov(j, j)}), 6) AS corr FROM g")
        .mkString("\n|UNION ALL ")
      s"""WITH g AS (SELECT count(*)::DOUBLE AS n, $sums, $qs FROM lineitem)
         |$rows
         |ORDER BY c1, c2""".stripMargin
    },
    "rolling_features" ->
      """WITH e AS (SELECT user_id::BIGINT AS user_id, epoch_us(ts) AS us, value FROM events),
        |r AS (SELECT user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW) AS rc,
        |    sum(value) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW) AS rs
        |  FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_events, max(rc)::BIGINT AS max_3d_events,
        |  round(max(rs), 4) AS max_3d_value, round(avg(rc), 4) AS avg_3d_events
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "event_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type AS t, epoch_us(ts) AS us FROM events),
        |l AS (SELECT t,
        |    lead(t, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t2,
        |    lead(t, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS t3
        |  FROM e),
        |p AS (SELECT t || '>' || t2 || '>' || t3 AS path FROM l WHERE t3 IS NOT NULL)
        |SELECT path, count(*)::BIGINT AS n FROM p
        |GROUP BY path ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "bootstrap_ci" ->
      """WITH bs AS (SELECT i AS b FROM range(100) r(i)),
        |u AS (SELECT bs.b, o_totalprice AS x,
        |    ('0x' || substr(md5(o_orderkey::VARCHAR || '_bs_' || bs.b::VARCHAR), 1, 15))::BIGINT
        |      % 1000000 / 1000000.0 AS u
        |  FROM orders, bs),
        |pw AS (SELECT b, x,
        |    CASE WHEN u < 0.367879441 THEN 0.0 WHEN u < 0.735758882 THEN 1.0
        |         WHEN u < 0.919698603 THEN 2.0 WHEN u < 0.980983510 THEN 3.0
        |         WHEN u < 0.996304736 THEN 4.0 WHEN u < 0.999368981 THEN 5.0
        |         WHEN u < 0.999879690 THEN 6.0 ELSE 7.0 END AS w
        |  FROM u),
        |m AS (SELECT b, sum(w * x) / sum(w) AS mb FROM pw GROUP BY b),
        |r AS (SELECT b, mb, row_number() OVER (ORDER BY round(mb, 4), b) AS rn FROM m)
        |SELECT count(*)::BIGINT AS n_replicates, round(avg(mb), 4) AS boot_mean,
        |  round(max(CASE WHEN rn = 3 THEN mb END), 4) AS ci_lo,
        |  round(max(CASE WHEN rn = 98 THEN mb END), 4) AS ci_hi
        |FROM r""".stripMargin,
    "funnel" ->
      """WITH e AS (SELECT user_id, event_id, event_type AS t, epoch_us(ts) AS us FROM events),
        |w1 AS (SELECT user_id, event_id, t, us,
        |    min(CASE WHEN t = 'signup' THEN us END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t1
        |  FROM e),
        |w2 AS (SELECT user_id, event_id, t, us, t1,
        |    CASE WHEN t = 'view' AND t1 IS NOT NULL AND us > t1 THEN us END AS q2
        |  FROM w1),
        |w3 AS (SELECT user_id, t, us, t1, q2,
        |    min(q2) OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t2
        |  FROM w2),
        |pu AS (SELECT user_id, bool_or(t1 IS NOT NULL) AS s1x, bool_or(q2 IS NOT NULL) AS s2x,
        |    bool_or(t = 'purchase' AND t2 IS NOT NULL AND us > t2) AS s3x
        |  FROM w3 GROUP BY user_id),
        |f AS (SELECT count(*)::BIGINT AS n_users,
        |    sum(CASE WHEN s1x THEN 1 ELSE 0 END)::BIGINT AS n_step1,
        |    sum(CASE WHEN s2x THEN 1 ELSE 0 END)::BIGINT AS n_step2,
        |    sum(CASE WHEN s3x THEN 1 ELSE 0 END)::BIGINT AS n_step3
        |  FROM pu)
        |SELECT n_users, n_step1, n_step2, n_step3,
        |  round(n_step2 / n_step1::DOUBLE, 4) AS conv12,
        |  round(n_step3 / n_step2::DOUBLE, 4) AS conv23
        |FROM f""".stripMargin,
    // the live drift alarm replayed end-to-end: reference decile bounds
    // by rank-select over the quantized value, reference shares as the
    // SAME raw (n+1)/(tot+10) divisions the Scala profiler hands the
    // stream (exact integers in, bit-identical doubles out), per-hour
    // bins + the PSI sum in the gate's exact term order
    "streaming_drift" -> {
      val boundCols = (1 to 9).map(k =>
        s"    max(CASE WHEN rn = ceil(n * 0.$k) THEN v END) AS b$k").mkString(",\n")
      val binExpr = "1 + " + (1 to 9).map(k =>
        s"(CASE WHEN v > b$k THEN 1 ELSE 0 END)").mkString(" + ")
      val refCols = (1 to 10).map(k =>
        s"    sum(CASE WHEN bin = $k THEN 1 ELSE 0 END)::BIGINT AS m$k").mkString(",\n")
      val curCols = (1 to 10).map(k =>
        s"    sum(CASE WHEN bin = $k THEN 1 ELSE 0 END)::BIGINT AS n$k").mkString(",\n")
      val terms = (1 to 10).map { k =>
        val pc = s"((n$k + 1.0) / (tot + 10.0))"
        val pr = s"((m$k + 1.0) / (mt + 10.0))"
        s"($pc - $pr) * ln($pc / $pr)"
      }.mkString("\n    + ")
      s"""WITH e AS (SELECT round(value, 4) AS v, (epoch_us(ts) // 3600000000) AS hr FROM events),
         |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n
         |  FROM e),
         |bd AS (SELECT
         |$boundCols
         |  FROM rk),
         |bb AS (SELECT hr, ($binExpr)::BIGINT AS bin FROM e, bd),
         |rc AS (SELECT count(*)::BIGINT AS mt,
         |$refCols
         |  FROM bb),
         |wc AS (SELECT hr, count(*)::BIGINT AS tot,
         |$curCols
         |  FROM bb GROUP BY hr)
         |SELECT (hr * 3600000000)::BIGINT AS win_start_us, tot AS n,
         |  round($terms, 6) AS psi
         |FROM wc, rc ORDER BY win_start_us""".stripMargin
    },
    // the live Hampel gate replayed: median and MAD by the same two
    // rank-selects over quantized values, the identical left-assoc
    // 3.0·1.4826·MAD float product, fired rows' deviations rounded
    "streaming_outlier" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id, round(value, 4) AS v FROM events),
        |rk AS (SELECT v, row_number() OVER (ORDER BY v) AS rn, count(*) OVER () AS n FROM e),
        |md AS (SELECT max(CASE WHEN rn = ceil(n * 0.5) THEN v END) AS med FROM rk),
        |dv AS (SELECT abs(v - med) AS dev FROM e, md),
        |rk2 AS (SELECT dev, row_number() OVER (ORDER BY dev) AS rn, count(*) OVER () AS n FROM dv),
        |ma AS (SELECT max(CASE WHEN rn = ceil(n * 0.5) THEN dev END) AS mad FROM rk2)
        |SELECT e.event_id, round(abs(e.v - md.med), 4) AS deviation
        |FROM e, md, ma
        |WHERE abs(e.v - md.med) > 3.0 * 1.4826 * ma.mad
        |ORDER BY event_id""".stripMargin,
    // the streamed carry-forward register replayed by the SAME
    // (t, side, rid) last_value window as the batch asof_join oracle —
    // output reshaped to the fold's (key, event_id, t, state) columns
    "streaming_asof" ->
      """WITH e AS (SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id,
        |    event_type, epoch_us(ts) AS us, value::DOUBLE AS value FROM events),
        |u AS (
        |  SELECT user_id AS key, us AS t, 0 AS side, event_id AS rid,
        |      value AS rval, us AS rt, NULL::BIGINT AS lid
        |    FROM e WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, us, 1, NULL::BIGINT, NULL::DOUBLE, NULL::BIGINT, event_id
        |    FROM e WHERE event_type = 'purchase'),
        |w AS (SELECT *,
        |    last_value(rval IGNORE NULLS) OVER win AS a_rval,
        |    last_value(rt IGNORE NULLS) OVER win AS a_rt
        |  FROM u WINDOW win AS (PARTITION BY key ORDER BY t, side, rid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT key, lid AS event_id, t, a_rt AS state_t, a_rval AS state_v
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin,
    // the windowed profile's exact columns replayed as hour buckets;
    // the HLL distinct is engine-internal behind the within-10%+2
    // invariant (TRUE in the oracle)
    // uniform sample = exact bottom-32 by md5 priority — full replay
    "streaming_sample" ->
      """WITH p AS (SELECT event_id, md5(event_id::VARCHAR) AS prio FROM events),
        |r AS (SELECT row_number() OVER (ORDER BY prio, event_id)::BIGINT AS rank,
        |    event_id, prio AS priority
        |  FROM p)
        |SELECT rank, event_id, priority FROM r WHERE rank <= 32 ORDER BY rank""".stripMargin,
    // windowed percentile monitor: n/min/max exact per hour bucket; the
    // sketch quantiles gate as exact-rank invariant booleans (TRUE here)
    "streaming_quantile" ->
      """WITH e AS (SELECT (epoch_us(ts) // 3600000000) AS hr, value::DOUBLE AS v FROM events),
        |c AS (SELECT hr, count(*)::BIGINT AS n, round(min(v), 4) AS min_v,
        |    round(max(v), 4) AS max_v
        |  FROM e GROUP BY hr)
        |SELECT (hr * 3600000000)::BIGINT AS win_start_us, n, min_v, max_v,
        |  TRUE AS q_ordered, TRUE AS q10_rank_ok, TRUE AS q50_rank_ok,
        |  TRUE AS q90_rank_ok
        |FROM c ORDER BY win_start_us""".stripMargin,
    "streaming_profile" ->
      """WITH e AS (SELECT (epoch_us(ts) // 3600000000) AS hr, value::DOUBLE AS v FROM events),
        |c AS (SELECT hr, count(*)::BIGINT AS n, round(min(v), 4) AS min_v,
        |    round(max(v), 4) AS max_v, round(avg(v), 4) AS mean,
        |    round(stddev_samp(v), 4) AS stddev
        |  FROM e GROUP BY hr)
        |SELECT (hr * 3600000000)::BIGINT AS win_start_us, n, min_v, max_v,
        |  mean, stddev, TRUE AS approx_within
        |FROM c ORDER BY win_start_us""".stripMargin,
    // the windowed top-event monitor replayed as hour-bucket conditional
    // counts + the SAME first-match CASE chain over the sorted known
    // types (all-zero windows — e.g. only 'error' events — resolve to
    // the first type, exactly like the post-aggregate chain)
    "streaming_top_event" ->
      """WITH e AS (SELECT (epoch_us(ts) // 3600000000) AS hr, event_type AS t FROM events),
        |c AS (SELECT hr,
        |    sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END)::BIGINT AS c0,
        |    sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS c1,
        |    sum(CASE WHEN t = 'signup' THEN 1 ELSE 0 END)::BIGINT AS c2,
        |    sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END)::BIGINT AS c3
        |  FROM e GROUP BY hr)
        |SELECT (hr * 3600000000)::BIGINT AS win_start_us,
        |  (c0 + c1 + c2 + c3)::BIGINT AS n_events,
        |  CASE WHEN c0 = greatest(c0, c1, c2, c3) THEN 'click'
        |       WHEN c1 = greatest(c0, c1, c2, c3) THEN 'purchase'
        |       WHEN c2 = greatest(c0, c1, c2, c3) THEN 'signup'
        |       ELSE 'view' END AS top_type,
        |  greatest(c0, c1, c2, c3)::BIGINT AS top_n
        |FROM c ORDER BY win_start_us""".stripMargin,
    // the streamed per-hash seen-marker replayed as the batch normalize
    // + groupBy: one row per distinct content hash with its min doc id
    "streaming_dedup" ->
      """WITH h AS (SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash,
        |    min(doc_id)::BIGINT AS doc_id
        |  FROM documents GROUP BY 1)
        |SELECT count(*)::BIGINT AS n_distinct, sum(doc_id)::BIGINT AS sum_first_ids,
        |  md5(string_agg(content_hash, ',' ORDER BY content_hash)) AS hash_set_md5
        |FROM h""".stripMargin,
    // the streamed stateful funnel's conversion rows replayed as the
    // closed-form per-user min chain: t1 = first signup, t2 = first view
    // strictly after t1, t3 = first purchase strictly after t2 —
    // equivalent to the fold because per-user processing is time-ordered
    "streaming_funnel" ->
      """WITH e AS (SELECT user_id, event_type AS t, epoch_us(ts) AS us FROM events),
        |u1 AS (SELECT user_id, min(CASE WHEN t = 'signup' THEN us END) AS t1
        |  FROM e GROUP BY user_id),
        |u2 AS (SELECT e.user_id, t1,
        |    min(CASE WHEN t = 'view' AND us > t1 THEN us END) AS t2
        |  FROM e JOIN u1 USING (user_id) GROUP BY e.user_id, t1),
        |u3 AS (SELECT e.user_id, t1, t2,
        |    min(CASE WHEN t = 'purchase' AND us > t2 THEN us END) AS t3
        |  FROM e JOIN u2 USING (user_id) GROUP BY e.user_id, t1, t2)
        |SELECT user_id::BIGINT AS user_id, t1::BIGINT AS t1, t2::BIGINT AS t2,
        |  t3::BIGINT AS t3
        |FROM u3 WHERE t3 IS NOT NULL ORDER BY user_id""".stripMargin,
    "retention" ->
      """WITH e AS (SELECT user_id::BIGINT AS user_id,
        |    (epoch_us(ts) // 604800000000)::BIGINT AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id)
        |SELECT c.cw AS cohort_week, e.wk - c.cw AS offset_weeks,
        |  count(DISTINCT e.user_id)::BIGINT AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the streamed session_window output replayed as a batch gap scan:
    // splits at gap >= 4 h (session_window's [start, last+gap) merge
    // rule; the batch sessionize twin uses > — divergent only on an
    // exactly-equal gap, measure-zero at µs resolution), window end =
    // last event + gap
    "streaming_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, event_id, us,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
        |  FROM e),
        |s AS (SELECT user_id, us,
        |    sum(CASE WHEN gap IS NULL OR gap >= 14400000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM g),
        |per AS (SELECT user_id, sess, count(*) AS n,
        |    min(us) AS start_us, max(us) AS end_us
        |  FROM s GROUP BY user_id, sess)
        |SELECT user_id::BIGINT AS user_id, start_us::BIGINT AS sess_start_us,
        |  (end_us + 14400000000 - start_us)::BIGINT AS window_us,
        |  n::BIGINT AS n_events
        |FROM per ORDER BY user_id, sess_start_us""".stripMargin,
    // the streamed tumbling-window aggregate replayed as hour buckets
    "streaming_window_stats" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us, value FROM events)
        |SELECT event_type,
        |  ((us // 3600000000) * 3600000000)::BIGINT AS win_start_us,
        |  count(*)::BIGINT AS n, round(avg(value), 4) AS mean_value
        |FROM e GROUP BY 1, 2 ORDER BY event_type, win_start_us""".stripMargin,
    "sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |g AS (SELECT user_id, event_id, us,
        |    us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
        |  FROM e),
        |s AS (SELECT user_id, us,
        |    sum(CASE WHEN gap IS NULL OR gap > 14400000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM g),
        |per AS (SELECT user_id, sess, count(*) AS n, (max(us) - min(us)) / 1e6 AS dur
        |  FROM s GROUP BY user_id, sess)
        |SELECT user_id::BIGINT AS user_id, count(*)::BIGINT AS n_sessions,
        |  sum(n)::BIGINT AS n_events, max(n)::BIGINT AS max_session_events,
        |  round(avg(dur), 4) AS avg_session_s, round(max(dur), 4) AS max_session_s
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,
    "make_regression" -> {
      val x0 = uSql("reg_", "x0")
      val x1 = uSql("reg_", "x1")
      s"""WITH g AS (SELECT unnest(range(0, 3000)) AS id),
         |p AS (SELECT ($x0) AS x0, ($x1) AS x1,
         |    ($x0) * 3.5 + ($x1) * -2.0 + 7.0 + ${gaussSql("reg_", "e")} * 0.1 AS y
         |  FROM g),
         |m AS (SELECT count(*)::DOUBLE n, sum(x0) sx1, sum(x1) sx2,
         |    sum(x0*x0) s11, sum(x0*x1) s12, sum(x1*x1) s22,
         |    sum(y) sy, sum(x0*y) s1y, sum(x1*y) s2y FROM p),
         |d AS (SELECT
         |  n*(s11*s22-s12*s12) - sx1*(sx1*s22-s12*sx2) + sx2*(sx1*s12-s11*sx2) AS det,
         |  sy*(s11*s22-s12*s12) - sx1*(s1y*s22-s12*s2y) + sx2*(s1y*s12-s11*s2y) AS det0,
         |  n*(s1y*s22-s12*s2y) - sy*(sx1*s22-s12*sx2) + sx2*(sx1*s2y-s1y*sx2) AS det1,
         |  n*(s11*s2y-s1y*s12) - sx1*(sx1*s2y-s1y*sx2) + sy*(sx1*s12-s11*sx2) AS det2
         |  FROM m)
         |SELECT term, coef FROM (
         |  SELECT 'intercept' AS term, round(det0/det, 4) AS coef FROM d
         |  UNION ALL SELECT 'x0', round(det1/det, 4) FROM d
         |  UNION ALL SELECT 'x1', round(det2/det, 4) FROM d
         |) ORDER BY term""".stripMargin
    },
    "make_blobs" -> {
      val cx = "CASE id % 3 WHEN 0 THEN 0.0 WHEN 1 THEN 10.0 ELSE -10.0 END"
      val cy = "CASE id % 3 WHEN 0 THEN 0.0 WHEN 1 THEN 10.0 ELSE 10.0 END"
      s"""WITH g AS (SELECT unnest(range(0, 3000)) AS id),
         |p AS (SELECT (id % 3)::INT AS cluster,
         |    ($cx) + ${gaussSql("blob_", "x")} * 1.0 AS x,
         |    ($cy) + ${gaussSql("blob_", "y")} * 1.0 AS y
         |  FROM g)
         |SELECT cluster, count(*)::BIGINT AS n, round(avg(x), 4) AS mean_x,
         |  round(avg(y), 4) AS mean_y, round(stddev_samp(x), 4) AS sd_x
         |FROM p GROUP BY cluster ORDER BY cluster""".stripMargin
    }
  )
}
