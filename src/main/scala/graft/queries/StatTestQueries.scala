package graft.queries

import graft.core.Tables
import graft.core.Num.{r4, r6}
import graft.preprocessing.Preprocessing
import graft.tsa.TimeSeries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hypothesis-test operators beyond the welch/mann-whitney/chi2/anova
  * family already shipped — the tests an experimentation or data-quality
  * pipeline reaches for next. Every query is a FULL hash gate: sufficient
  * statistics via map-side-combined aggregates (or the distributed
  * midrank frame), closed-form statistics replayed expression-for-
  * expression in DuckDB.
  *
  * Scale notes (the 100 TB posture): every test here reduces the fact
  * table in ONE scan to a bounded frame — group sums (levene, jarque_bera),
  * the distinct-value rank frame (kruskal_wallis, the mann_whitney
  * discipline), distinct event-time frame (logrank), or the per-series
  * daily frame (mann_kendall, durbin_watson, bounded days per series,
  * parallel across series). No test shuffles the raw rows more than once.
  */
object StatTestQueries {
  type Q = (SparkSession, String) => DataFrame

  private val dailySql =
    """SELECT event_type AS series, CAST(ts AS DATE) AS day, sum(value) AS x
      |  FROM events GROUP BY 1, 2""".stripMargin

  val queries: Map[String, Q] = Map(
    "kruskal_wallis" -> { (s, d) =>
      // Kruskal-Wallis H across order priorities (the k-group rank
      // companion of anova_f / mann_whitney): midranks from the
      // distinct-value frame via the distributed cumsum (core/Ranks),
      // per-group rank sums in one pass, tie-corrected H; reject at the
      // chi-square(k-1=4) 5% critical value
      val o = Tables.orders(s, d).select(col("o_orderpriority").as("_g"),
        col("o_totalprice").as("_v"))
      val g = o.groupBy(col("_v")).agg(count(lit(1)).cast("double").as("_c"))
      val ranks = graft.core.Ranks.withGlobalCumSums(g, Seq(col("_v")),
          Seq((col("_c"), "_cs")))
        .select(col("_v"),
          ((col("_cs") - col("_c")) + (col("_c") + 1.0) / 2.0).as("_r"))
      val per = o.join(ranks, "_v").groupBy(col("_g"))
        .agg(count(lit(1)).cast("double").as("_n"), sum(col("_r")).as("_rs"))
      val tot = per.agg(sum(col("_n")).as("_N"),
        sum(col("_rs") * col("_rs") / col("_n")).as("_rr"),
        count(lit(1)).cast("double").as("_k"))
      val ties = g.agg(sum(col("_c") * col("_c") * col("_c") - col("_c")).as("_t3"))
      // single-distinct-value degenerate: t3 = N³−N makes the correction 0
      // — fall back to the uncorrected H instead of dividing by zero
      // (mirrored CASE in the oracle)
      val hRaw = lit(12.0) / (col("_N") * (col("_N") + 1.0)) * col("_rr") -
        lit(3.0) * (col("_N") + 1.0)
      val corr = lit(1.0) - col("_t3") / (col("_N") * col("_N") * col("_N") - col("_N"))
      val h = when(corr > 0, hRaw / corr).otherwise(hRaw)
      tot.crossJoin(broadcast(ties)).select(
        col("_N").cast("long").as("n"), col("_k").cast("long").as("k"),
        r4(h).as("h_stat"), (r4(h) > 9.488).as("reject"))
    },
    "jarque_bera" -> { (s, d) =>
      // Jarque-Bera normality of extendedprice (scaled to O(1) so the
      // raw-moment sums keep ~12 clean digits ahead of the r4 rounding):
      // four raw moments in ONE aggregate, central moments and
      // skewness/kurtosis closed-form, reject at chi-square(2) 5%
      val v = col("l_extendedprice") / 100000.0
      val gdf = Tables.lineitem(s, d).agg(
        count(lit(1)).cast("double").as("_n"), sum(v).as("_s1"),
        sum(v * v).as("_s2"), sum(v * v * v).as("_s3"),
        sum(v * v * v * v).as("_s4"))
      val n = col("_n"); val m = col("_s1") / n
      val m2 = col("_s2") / n - m * m
      val m3 = col("_s3") / n - lit(3.0) * m * (col("_s2") / n) +
        lit(2.0) * m * m * m
      val m4 = col("_s4") / n - lit(4.0) * m * (col("_s3") / n) +
        lit(6.0) * m * m * (col("_s2") / n) - lit(3.0) * m * m * m * m
      val skew = m3 / sqrt(m2 * m2 * m2)
      val kurt = m4 / (m2 * m2)
      val jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
      gdf.select(col("_n").cast("long").as("n"), r4(skew).as("skewness"),
        r4(kurt).as("kurtosis"), r4(jb).as("jb_stat"),
        (r4(jb) > 5.991).as("reject"))
    },
    "levene_test" -> { (s, d) =>
      // Levene homogeneity-of-variance across return flags (mean-centered
      // classic form): pass 1 group means (broadcast — k rows), pass 2
      // the one-way ANOVA F on the absolute deviations, all from group
      // sufficient sums; reject at F(2, inf) 5% = 3.0
      val li = Tables.lineitem(s, d).select(col("l_returnflag").as("_g"),
        (col("l_extendedprice") / 100000.0).as("_v"))
      val means = li.groupBy(col("_g")).agg(avg(col("_v")).as("_m"))
      val z = li.join(broadcast(means), "_g")
        .select(col("_g"), abs(col("_v") - col("_m")).as("_z"))
      val per = z.groupBy(col("_g")).agg(count(lit(1)).cast("double").as("_n"),
        sum(col("_z")).as("_sz"), sum(col("_z") * col("_z")).as("_qz"))
      val tot = per.agg(count(lit(1)).cast("double").as("_k"),
        sum(col("_n")).as("_N"), sum(col("_sz")).as("_tz"),
        sum(col("_sz") * col("_sz") / col("_n")).as("_bz"),
        sum(col("_qz")).as("_tq"))
      val between = col("_bz") - col("_tz") * col("_tz") / col("_N")
      val within = col("_tq") - col("_bz")
      val f = (between / (col("_k") - 1.0)) / (within / (col("_N") - col("_k")))
      tot.select(col("_N").cast("long").as("n"), col("_k").cast("long").as("k"),
        r4(f).as("w_stat"), (r4(f) > 3.0).as("reject"))
    },
    "mann_kendall" -> { (s, d) =>
      // Mann-Kendall monotone-trend test + Sen's slope per daily series:
      // the day frame is bounded per series (one groupBy reduces the
      // events scan), so the pairwise S statistic and the pairwise-slope
      // median are generated from a per-series self-join of the REDUCED
      // frame — never the raw events; tie-corrected normal z
      val ds = TimeSeries.dailySeries(Tables.events(s, d))
        .select(col("series"), col("t"), col("x"))
      val a = ds.select(col("series"), col("t").as("_i"), col("x").as("_xi"))
      val b = ds.select(col("series"), col("t").as("_j"), col("x").as("_xj"))
      val pairs = a.join(b, Seq("series")).filter(col("_i") < col("_j"))
        .select(col("series"), signum(col("_xj") - col("_xi")).as("_sgn"),
          ((col("_xj") - col("_xi")) / (col("_j") - col("_i")).cast("double")).as("_slope"))
      val sStat = pairs.groupBy(col("series"))
        .agg(sum(col("_sgn")).as("_S"), count(lit(1)).cast("double").as("_m"))
      val ties = ds.groupBy(col("series"), col("x"))
        .agg(count(lit(1)).cast("double").as("_c"))
        .groupBy(col("series"))
        .agg(sum(col("_c") * (col("_c") - 1.0) * (lit(2.0) * col("_c") + 5.0)).as("_tv"))
      val nPer = ds.groupBy(col("series")).agg(count(lit(1)).cast("double").as("_n"))
      // exact median of the bounded pair-slope frame: the values at the
      // two middle ranks are determined by the sorted multiset, so rank
      // ties need no further tiebreak
      val wRank = Window.partitionBy(col("series")).orderBy(col("_slope"))
      val sen = pairs.withColumn("_rn", row_number().over(wRank).cast("double"))
        .join(sStat.select(col("series"), col("_m")), "series")
        .filter(col("_rn") === floor((col("_m") + 1.0) / 2.0) ||
          col("_rn") === floor((col("_m") + 2.0) / 2.0))
        .groupBy(col("series")).agg(avg(col("_slope")).as("_sen"))
      val varS = (col("_n") * (col("_n") - 1.0) * (lit(2.0) * col("_n") + 5.0) -
        col("_tv")) / 18.0
      // all-tied series ⇒ varS = 0: guard so Spark's NULL matches the
      // oracle's NULLIF'd denominator (DuckDB would give ±inf)
      val z = when(varS > 0, (col("_S") - signum(col("_S"))) / sqrt(varS))
      sStat.join(ties, "series").join(nPer, "series").join(sen, "series")
        .select(col("series"), col("_n").cast("long").as("n"),
          col("_S").cast("long").as("s_stat"), r4(z).as("z"),
          r4(col("_sen")).as("sen_slope"), (abs(r4(z)) > 1.96).as("reject"))
        .orderBy("series")
    },
    "logrank_test" -> { (s, d) =>
      // log-rank two-group survival comparison (the kaplan_meier data
      // split by user parity): observed vs expected group-1 deaths with
      // hypergeometric variance at each distinct duration — at-risk
      // counts via cumulative windows over the BOUNDED distinct-duration
      // frame (kaplan_meier discipline); chi-square(1) at 5%
      val ev = Tables.events(s, d).select(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).as("_day"))
      val dur = ev.groupBy(col("user_id"))
        .agg((max(col("_day")) - min(col("_day")) + 1).cast("long").as("d"))
        .select(col("d"), (col("user_id") % 2 === 0).as("_g1"))
      val g = dur.groupBy(col("d")).agg(count(lit(1)).cast("double").as("_dd"),
        sum(when(col("_g1"), 1.0).otherwise(0.0)).as("_d1"))
      val wPrior = Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, -1)
      val wAll = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val risk = g
        .withColumn("_n",
          sum(col("_dd")).over(wAll) - coalesce(sum(col("_dd")).over(wPrior), lit(0.0)))
        .withColumn("_n1",
          sum(col("_d1")).over(wAll) - coalesce(sum(col("_d1")).over(wPrior), lit(0.0)))
      val agg = risk.agg(sum(col("_d1")).as("_o1"),
        sum(col("_dd") * col("_n1") / col("_n")).as("_e1"),
        sum(when(col("_n") > 1.0,
          col("_dd") * (col("_n1") / col("_n")) * (lit(1.0) - col("_n1") / col("_n")) *
            (col("_n") - col("_dd")) / (col("_n") - 1.0)).otherwise(0.0)).as("_v"))
      val chi = (col("_o1") - col("_e1")) * (col("_o1") - col("_e1")) / col("_v")
      agg.select(col("_o1").cast("long").as("observed_1"),
        r4(col("_e1")).as("expected_1"), r4(chi).as("chi2"),
        (r4(chi) > 3.841).as("reject"))
    },
    "cohens_d" -> { (s, d) =>
      // Cohen's d standardized effect size of the A/B mean difference
      // (the magnitude number a readout reports beside welch_ttest's
      // significance): pooled-SD denominator from the same ONE moments
      // aggregate; smallness judged at the conventional 0.2 cut
      val o = Tables.orders(s, d)
      val isA = Preprocessing.splitColumn(col("o_orderkey"), 500, 42L) === "train"
      val y = col("o_totalprice")
      val g = o.agg(sum(when(isA, 1.0).otherwise(0.0)).as("_na"),
        sum(when(isA, y).otherwise(0.0)).as("_sa"),
        sum(when(isA, y * y).otherwise(0.0)).as("_qa"),
        sum(when(!isA, 1.0).otherwise(0.0)).as("_nb"),
        sum(when(!isA, y).otherwise(0.0)).as("_sb"),
        sum(when(!isA, y * y).otherwise(0.0)).as("_qb"))
      val va = (col("_qa") - col("_sa") * col("_sa") / col("_na")) / (col("_na") - 1)
      val vb = (col("_qb") - col("_sb") * col("_sb") / col("_nb")) / (col("_nb") - 1)
      val sp = sqrt(((col("_na") - 1) * va + (col("_nb") - 1) * vb) /
        (col("_na") + col("_nb") - 2))
      val dEff = (col("_sa") / col("_na") - col("_sb") / col("_nb")) / sp
      g.select(col("_na").cast("long").as("n_a"), col("_nb").cast("long").as("n_b"),
        r4(dEff).as("cohens_d"), r4(sp).as("pooled_sd"),
        (abs(r4(dEff)) < 0.2).as("negligible"))
    },
    "odds_ratio" -> { (s, d) =>
      // odds ratio of urgency given the md5 arm with the
      // Haldane-Anscombe +0.5 correction and the 95% log-normal CI (the
      // 2×2 readout epidemiology and churn analyses share): all four
      // cells from ONE aggregate
      val o = Tables.orders(s, d)
      val isA = Preprocessing.splitColumn(col("o_orderkey"), 500, 42L) === "train"
      val pos = col("o_orderpriority") === "1-URGENT"
      val g = o.agg(
        (sum(when(isA && pos, 1.0).otherwise(0.0)) + 0.5).as("_a"),
        (sum(when(isA && !pos, 1.0).otherwise(0.0)) + 0.5).as("_b"),
        (sum(when(!isA && pos, 1.0).otherwise(0.0)) + 0.5).as("_c"),
        (sum(when(!isA && !pos, 1.0).otherwise(0.0)) + 0.5).as("_dd"))
      val or = col("_a") * col("_dd") / (col("_b") * col("_c"))
      val seLog = sqrt(lit(1.0) / col("_a") + lit(1.0) / col("_b") +
        lit(1.0) / col("_c") + lit(1.0) / col("_dd"))
      val lo = exp(log(or) - lit(1.959964) * seLog)
      val hi = exp(log(or) + lit(1.959964) * seLog)
      g.select(r4(or).as("odds_ratio"), r4(lo).as("ci_lo"), r4(hi).as("ci_hi"),
        (r4(lo) > 1.0 || r4(hi) < 1.0).as("significant"))
    },
    "risk_ratio" -> { (s, d) =>
      // relative risk of urgency between the md5 arms with the Katz
      // log-normal 95% CI (+0.5 continuity like odds_ratio) — the other
      // half of the 2×2 readout pair; same ONE-aggregate cells
      val o = Tables.orders(s, d)
      val isA = Preprocessing.splitColumn(col("o_orderkey"), 500, 42L) === "train"
      val pos = col("o_orderpriority") === "1-URGENT"
      val g = o.agg(
        (sum(when(isA && pos, 1.0).otherwise(0.0)) + 0.5).as("_a"),
        (sum(when(isA, 1.0).otherwise(0.0)) + 0.5).as("_na"),
        (sum(when(!isA && pos, 1.0).otherwise(0.0)) + 0.5).as("_c"),
        (sum(when(!isA, 1.0).otherwise(0.0)) + 0.5).as("_nc"))
      val rr = (col("_a") / col("_na")) / (col("_c") / col("_nc"))
      val seLog = sqrt(lit(1.0) / col("_a") - lit(1.0) / col("_na") +
        lit(1.0) / col("_c") - lit(1.0) / col("_nc"))
      val lo = exp(log(rr) - lit(1.959964) * seLog)
      val hi = exp(log(rr) + lit(1.959964) * seLog)
      g.select(r4(rr).as("risk_ratio"), r4(lo).as("ci_lo"), r4(hi).as("ci_hi"),
        (r4(lo) > 1.0 || r4(hi) < 1.0).as("significant"))
    },
    "srm_check" -> { (s, d) =>
      // sample-ratio-mismatch guardrail: chi-square(1) of the observed
      // arm counts against the designed 50/50 md5 split — the first
      // validity gate any experiment readout runs; ONE aggregate
      val o = Tables.orders(s, d)
      val isA = Preprocessing.splitColumn(col("o_orderkey"), 500, 42L) === "train"
      val g = o.agg(sum(when(isA, 1.0).otherwise(0.0)).as("_na"),
        sum(when(!isA, 1.0).otherwise(0.0)).as("_nb"))
      val n = col("_na") + col("_nb")
      val e = n / 2.0
      val chi = (col("_na") - e) * (col("_na") - e) / e +
        (col("_nb") - e) * (col("_nb") - e) / e
      g.select(col("_na").cast("long").as("n_a"), col("_nb").cast("long").as("n_b"),
        r4(chi).as("chi2"), (r4(chi) > 3.841).as("srm_detected"))
    },
    "msprt" -> { (s, d) =>
      // mixture SPRT (always-valid inference — the sequential A/B monitor
      // that can be peeked at daily without alpha inflation; Johari et al.
      // mSPRT with a normal mixture, τ² = σ̂²): per-day per-arm sums from
      // ONE aggregate, cumulative windows over the BOUNDED day frame,
      // logΛ_t closed-form, always-valid p = exp(−max logΛ)
      val o = Tables.orders(s, d)
      val isA = Preprocessing.splitColumn(col("o_orderkey"), 500, 42L) === "train"
      val y = col("o_totalprice") / 100000.0
      val daily = o.groupBy(to_date(col("o_orderdate")).as("_day"))
        .agg(sum(when(isA, 1.0).otherwise(0.0)).as("_na"),
          sum(when(isA, y).otherwise(0.0)).as("_sa"),
          sum(when(!isA, 1.0).otherwise(0.0)).as("_nb"),
          sum(when(!isA, y).otherwise(0.0)).as("_sb"))
      val sig = o.agg(((sum(y * y) - sum(y) * sum(y) / count(lit(1))) /
        (count(lit(1)) - 1.0)).as("_s2"))
      val wc = Window.orderBy(col("_day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = daily
        .withColumn("_NA", sum(col("_na")).over(wc))
        .withColumn("_SA", sum(col("_sa")).over(wc))
        .withColumn("_NB", sum(col("_nb")).over(wc))
        .withColumn("_SB", sum(col("_sb")).over(wc))
        .filter(col("_NA") > 0.0 && col("_NB") > 0.0)
        .crossJoin(broadcast(sig))
      val nEff = col("_NA") * col("_NB") / (col("_NA") + col("_NB"))
      val delta = col("_SA") / col("_NA") - col("_SB") / col("_NB")
      // τ² = σ² ⇒ logΛ = −½ln(1+n_eff) + n_eff²δ²/(2σ²(1+n_eff))
      val logL = lit(-0.5) * log(lit(1.0) + nEff) +
        nEff * nEff * delta * delta / (lit(2.0) * col("_s2") * (lit(1.0) + nEff))
      cum.agg(count(lit(1)).cast("long").as("n_days"), max(r4(logL)).as("_ml"))
        .select(col("n_days"), col("_ml").as("max_log_lambda"),
          r4(least(lit(1.0), exp(-col("_ml")))).as("always_valid_p"),
          (r4(least(lit(1.0), exp(-col("_ml")))) < 0.05).as("reject"))
    },
    "vif" -> { (s, d) =>
      // variance inflation factors for the (quantity, extendedprice,
      // discount) design: closed-form from the 3×3 correlation matrix
      // inverse (cofactors — no iterative solve), every pairwise moment
      // from ONE map-side-combined aggregate; the multicollinearity
      // screen run before any linear fit
      val q = col("l_quantity") / 10.0
      val e = col("l_extendedprice") / 100000.0
      val dd = col("l_discount")
      val g = Tables.lineitem(s, d).agg(count(lit(1)).cast("double").as("_n"),
        sum(q).as("_sq"), sum(e).as("_se"), sum(dd).as("_sd"),
        sum(q * q).as("_sqq"), sum(e * e).as("_see"), sum(dd * dd).as("_sdd"),
        sum(q * e).as("_sqe"), sum(q * dd).as("_sqd"), sum(e * dd).as("_sed"))
      def cv(sab: Column, sa: Column, sb: Column) = sab - sa * sb / col("_n")
      val r12 = cv(col("_sqe"), col("_sq"), col("_se")) /
        sqrt(cv(col("_sqq"), col("_sq"), col("_sq")) * cv(col("_see"), col("_se"), col("_se")))
      val r13 = cv(col("_sqd"), col("_sq"), col("_sd")) /
        sqrt(cv(col("_sqq"), col("_sq"), col("_sq")) * cv(col("_sdd"), col("_sd"), col("_sd")))
      val r23 = cv(col("_sed"), col("_se"), col("_sd")) /
        sqrt(cv(col("_see"), col("_se"), col("_se")) * cv(col("_sdd"), col("_sd"), col("_sd")))
      val det = lit(1.0) + lit(2.0) * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23
      def out(name: String, v: Column) =
        g.select(lit(name).as("feature"), r4(v).as("vif"),
          r4(lit(1.0) - lit(1.0) / v).as("r2_others"))
      out("l_quantity", (lit(1.0) - r23 * r23) / det)
        .unionAll(out("l_extendedprice", (lit(1.0) - r13 * r13) / det))
        .unionAll(out("l_discount", (lit(1.0) - r12 * r12) / det))
        .orderBy("feature")
    },
    "partial_corr" -> { (s, d) =>
      // first-order partial correlations of the same triple (each pair
      // controlling for the third): r_xy.z = (r_xy − r_xz·r_yz) /
      // √((1−r_xz²)(1−r_yz²)) — the conditional-dependence screen beside
      // vif, same ONE-aggregate moment pass
      val q = col("l_quantity") / 10.0
      val e = col("l_extendedprice") / 100000.0
      val dd = col("l_discount")
      val g = Tables.lineitem(s, d).agg(count(lit(1)).cast("double").as("_n"),
        sum(q).as("_sq"), sum(e).as("_se"), sum(dd).as("_sd"),
        sum(q * q).as("_sqq"), sum(e * e).as("_see"), sum(dd * dd).as("_sdd"),
        sum(q * e).as("_sqe"), sum(q * dd).as("_sqd"), sum(e * dd).as("_sed"))
      def cv(sab: Column, sa: Column, sb: Column) = sab - sa * sb / col("_n")
      val r12 = cv(col("_sqe"), col("_sq"), col("_se")) /
        sqrt(cv(col("_sqq"), col("_sq"), col("_sq")) * cv(col("_see"), col("_se"), col("_se")))
      val r13 = cv(col("_sqd"), col("_sq"), col("_sd")) /
        sqrt(cv(col("_sqq"), col("_sq"), col("_sq")) * cv(col("_sdd"), col("_sd"), col("_sd")))
      val r23 = cv(col("_sed"), col("_se"), col("_sd")) /
        sqrt(cv(col("_see"), col("_se"), col("_se")) * cv(col("_sdd"), col("_sd"), col("_sd")))
      def pc(rxy: Column, rxz: Column, ryz: Column) =
        (rxy - rxz * ryz) / sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
      def out(name: String, r: Column, p: Column) =
        g.select(lit(name).as("pair"), r4(r).as("corr"), r4(p).as("partial_corr"))
      out("quantity_extendedprice", r12, pc(r12, r13, r23))
        .unionAll(out("quantity_discount", r13, pc(r13, r12, r23)))
        .unionAll(out("extendedprice_discount", r23, pc(r23, r12, r13)))
        .orderBy("pair")
    },
    "cooks_distance" -> { (s, d) =>
      // Cook's distance for the extendedprice~quantity OLS: closed-form
      // hat diagonal + residual from ONE sums pass (broadcast single
      // row), top-10 influential rows via TakeOrdered on the ROUNDED
      // statistic — the influence audit that flags label-corrupting rows
      val li = Tables.lineitem(s, d)
      val x = col("l_quantity") / 10.0
      val y = col("l_extendedprice") / 100000.0
      val g = li.agg(count(lit(1)).cast("double").as("_n"), sum(x).as("_sx"),
        sum(y).as("_sy"), sum(x * x).as("_sxx"), sum(x * y).as("_sxy"),
        sum(y * y).as("_syy"))
      val sxx = col("_sxx") - col("_sx") * col("_sx") / col("_n")
      val sxy = col("_sxy") - col("_sx") * col("_sy") / col("_n")
      val syy = col("_syy") - col("_sy") * col("_sy") / col("_n")
      val st = g.select(col("_n"), col("_sx"), col("_sy"),
        sxx.as("_Sxx"), (sxy / sxx).as("_b"),
        ((syy - (sxy / sxx) * sxy) / (col("_n") - 2.0)).as("_s2"))
      val joined = li.crossJoin(broadcast(st))
      val bHat = col("_b"); val aHat = col("_sy") / col("_n") - bHat * (col("_sx") / col("_n"))
      val eRes = y - (aHat + bHat * x)
      val h = lit(1.0) / col("_n") +
        (x - col("_sx") / col("_n")) * (x - col("_sx") / col("_n")) / col("_Sxx")
      val dCook = eRes * eRes * h / (lit(2.0) * col("_s2") * (lit(1.0) - h) * (lit(1.0) - h))
      joined.select(col("l_orderkey"), col("l_linenumber"),
          r4(dCook).as("cooks_d"), r6(h).as("leverage"), r4(eRes).as("resid"))
        .orderBy(col("cooks_d").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10)
    },
    "cronbach_alpha" -> { (s, d) =>
      // Cronbach's alpha over the four scaled lineitem measures (internal
      // consistency of an item battery): per-item variances and the
      // row-total variance from ONE aggregate — the feature-battery
      // reliability screen
      val items = Seq(col("l_quantity") / 10.0, col("l_extendedprice") / 100000.0,
        col("l_discount"), col("l_tax"))
      val tot = items.reduce(_ + _)
      val aggs = Seq(count(lit(1)).cast("double").as("_n")) ++
        items.zipWithIndex.flatMap { case (c, i) =>
          Seq(sum(c).as(s"_s$i"), sum(c * c).as(s"_q$i")) } ++
        Seq(sum(tot).as("_st"), sum(tot * tot).as("_qt"))
      val g = Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      def svar(sc: Column, qc: Column) =
        (qc - sc * sc / col("_n")) / (col("_n") - 1.0)
      val sumVars = items.indices.map(i => svar(col(s"_s$i"), col(s"_q$i"))).reduce(_ + _)
      val vTot = svar(col("_st"), col("_qt"))
      val alpha = lit(4.0) / 3.0 * (lit(1.0) - sumVars / vTot)
      g.select(col("_n").cast("long").as("n"), lit(4L).as("k"),
        r4(alpha).as("alpha"), (r4(alpha) >= 0.5).as("acceptable"))
    },
    "grubbs_test" -> { (s, d) =>
      // Grubbs max-outlier test on totalprice: G = max|x−x̄|/s with the
      // arg-max key; stats pass broadcast, extremum via TakeOrdered on the
      // ROUNDED deviation (conservative fixed 4.0 critical value for
      // n ≥ 10³ declared in the reject rule)
      val o = Tables.orders(s, d)
      val st = o.agg(count(lit(1)).cast("double").as("_n"),
        avg(col("o_totalprice")).as("_m"), stddev_samp(col("o_totalprice")).as("_sd"))
      val dev = r4(abs(col("o_totalprice") - col("_m")) / col("_sd"))
      o.crossJoin(broadcast(st))
        .select(col("_n").cast("long").as("n"), col("o_orderkey").as("outlier_key"),
          dev.as("g_stat"), (dev > 4.0).as("reject"))
        .orderBy(col("g_stat").desc, col("outlier_key"))
        .limit(1)
    },
    "durbin_watson" -> { (s, d) =>
      // Durbin-Watson residual autocorrelation of the per-series
      // day-index OLS: closed-form slope from one sums pass, residual
      // lag-diff within the bounded per-series partition
      val ds = TimeSeries.dailySeries(Tables.events(s, d))
      val td = col("t").cast("double")
      val st = ds.groupBy(col("series")).agg(count(lit(1)).cast("double").as("_n"),
        sum(td).as("_st"), sum(col("x")).as("_sx"),
        sum(td * col("x")).as("_stx"), sum(td * td).as("_stt"))
      val withB = st.select(col("series"),
        ((col("_stx") - col("_st") * col("_sx") / col("_n")) /
          (col("_stt") - col("_st") * col("_st") / col("_n"))).as("_b"),
        (col("_sx") / col("_n")).as("_mx"), (col("_st") / col("_n")).as("_mt"))
      val res = ds.join(broadcast(withB), "series")
        .select(col("series"), col("t"),
          (col("x") - (col("_mx") - col("_b") * col("_mt") + col("_b") * td)).as("_e"))
      val wl = Window.partitionBy(col("series")).orderBy(col("t"))
      res.withColumn("_ep", lag(col("_e"), 1).over(wl))
        .groupBy(col("series")).agg(count(lit(1)).cast("long").as("n"),
          (sum(when(col("_ep").isNotNull,
            (col("_e") - col("_ep")) * (col("_e") - col("_ep"))).otherwise(0.0)) /
            sum(col("_e") * col("_e"))).as("_dw"))
        .select(col("series"), col("n"), r4(col("_dw")).as("dw_stat"),
          (r4(col("_dw")) < 1.5).as("positive_autocorr"))
        .orderBy("series")
    })

  /** Shared moment CTEs for the (quantity, extendedprice, discount)
    * correlation triple — vif and partial_corr key off the same `r`. */
  private val corrTripleCtes =
    """g AS (SELECT count(*)::DOUBLE AS n,
      |    sum(l_quantity / 10.0) AS sq, sum(l_extendedprice / 100000.0) AS se,
      |    sum(l_discount) AS sd,
      |    sum((l_quantity / 10.0) * (l_quantity / 10.0)) AS sqq,
      |    sum((l_extendedprice / 100000.0) * (l_extendedprice / 100000.0)) AS see,
      |    sum(l_discount * l_discount) AS sdd,
      |    sum((l_quantity / 10.0) * (l_extendedprice / 100000.0)) AS sqe,
      |    sum((l_quantity / 10.0) * l_discount) AS sqd,
      |    sum((l_extendedprice / 100000.0) * l_discount) AS sed
      |  FROM lineitem),
      |r AS (SELECT
      |    (sqe - sq * se / n) / sqrt((sqq - sq * sq / n) * (see - se * se / n)) AS r12,
      |    (sqd - sq * sd / n) / sqrt((sqq - sq * sq / n) * (sdd - sd * sd / n)) AS r13,
      |    (sed - se * sd / n) / sqrt((see - se * se / n) * (sdd - sd * sd / n)) AS r23
      |  FROM g)""".stripMargin

  val oracles: Map[String, String] = Map(
    "cohens_d" ->
      """WITH b AS (SELECT o_totalprice AS y,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 >= 500
        |      THEN 1 ELSE 0 END AS a FROM orders),
        |g AS (SELECT sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) AS na,
        |    sum(CASE WHEN a = 1 THEN y ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN a = 1 THEN y * y ELSE 0.0 END) AS qa,
        |    sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) AS nb,
        |    sum(CASE WHEN a = 0 THEN y ELSE 0.0 END) AS sb,
        |    sum(CASE WHEN a = 0 THEN y * y ELSE 0.0 END) AS qb FROM b),
        |f AS (SELECT na, nb,
        |    sqrt(((na - 1) * ((qa - sa * sa / na) / (na - 1))
        |      + (nb - 1) * ((qb - sb * sb / nb) / (nb - 1))) / (na + nb - 2)) AS sp,
        |    sa / na - sb / nb AS diff FROM g)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(diff / sp, 4) AS cohens_d,
        |  round(sp, 4) AS pooled_sd, abs(round(diff / sp, 4)) < 0.2 AS negligible
        |FROM f""".stripMargin,
    "odds_ratio" ->
      """WITH b AS (SELECT
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 >= 500
        |      THEN 1 ELSE 0 END AS a,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos FROM orders),
        |g AS (SELECT
        |    sum(CASE WHEN a = 1 AND pos = 1 THEN 1.0 ELSE 0.0 END) + 0.5 AS ca,
        |    sum(CASE WHEN a = 1 AND pos = 0 THEN 1.0 ELSE 0.0 END) + 0.5 AS cb,
        |    sum(CASE WHEN a = 0 AND pos = 1 THEN 1.0 ELSE 0.0 END) + 0.5 AS cc,
        |    sum(CASE WHEN a = 0 AND pos = 0 THEN 1.0 ELSE 0.0 END) + 0.5 AS cd FROM b),
        |f AS (SELECT ca * cd / (cb * cc) AS orr,
        |    sqrt(1.0 / ca + 1.0 / cb + 1.0 / cc + 1.0 / cd) AS se FROM g)
        |SELECT round(orr, 4) AS odds_ratio,
        |  round(exp(ln(orr) - 1.959964 * se), 4) AS ci_lo,
        |  round(exp(ln(orr) + 1.959964 * se), 4) AS ci_hi,
        |  round(exp(ln(orr) - 1.959964 * se), 4) > 1.0
        |    OR round(exp(ln(orr) + 1.959964 * se), 4) < 1.0 AS significant
        |FROM f""".stripMargin,
    "risk_ratio" ->
      """WITH b AS (SELECT
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 >= 500
        |      THEN 1 ELSE 0 END AS a,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos FROM orders),
        |g AS (SELECT
        |    sum(CASE WHEN a = 1 AND pos = 1 THEN 1.0 ELSE 0.0 END) + 0.5 AS ca,
        |    sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) + 0.5 AS na,
        |    sum(CASE WHEN a = 0 AND pos = 1 THEN 1.0 ELSE 0.0 END) + 0.5 AS cc,
        |    sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) + 0.5 AS nc FROM b),
        |f AS (SELECT (ca / na) / (cc / nc) AS rr,
        |    sqrt(1.0 / ca - 1.0 / na + 1.0 / cc - 1.0 / nc) AS se FROM g)
        |SELECT round(rr, 4) AS risk_ratio,
        |  round(exp(ln(rr) - 1.959964 * se), 4) AS ci_lo,
        |  round(exp(ln(rr) + 1.959964 * se), 4) AS ci_hi,
        |  round(exp(ln(rr) - 1.959964 * se), 4) > 1.0
        |    OR round(exp(ln(rr) + 1.959964 * se), 4) < 1.0 AS significant
        |FROM f""".stripMargin,
    "srm_check" ->
      """WITH b AS (SELECT CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 >= 500
        |      THEN 1 ELSE 0 END AS a FROM orders),
        |g AS (SELECT sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) AS na,
        |    sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) AS nb FROM b),
        |f AS (SELECT na, nb,
        |    (na - (na + nb) / 2.0) * (na - (na + nb) / 2.0) / ((na + nb) / 2.0)
        |    + (nb - (na + nb) / 2.0) * (nb - (na + nb) / 2.0) / ((na + nb) / 2.0) AS chi
        |  FROM g)
        |SELECT na::BIGINT AS n_a, nb::BIGINT AS n_b, round(chi, 4) AS chi2,
        |  round(chi, 4) > 3.841 AS srm_detected FROM f""".stripMargin,
    "msprt" ->
      """WITH b AS (SELECT CAST(o_orderdate AS DATE) AS day, o_totalprice / 100000.0 AS y,
        |    CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR || '_42'), 1, 15))::BIGINT % 1000 >= 500
        |      THEN 1 ELSE 0 END AS a FROM orders),
        |dd AS (SELECT day,
        |    sum(CASE WHEN a = 1 THEN 1.0 ELSE 0.0 END) AS na,
        |    sum(CASE WHEN a = 1 THEN y ELSE 0.0 END) AS sa,
        |    sum(CASE WHEN a = 0 THEN 1.0 ELSE 0.0 END) AS nb,
        |    sum(CASE WHEN a = 0 THEN y ELSE 0.0 END) AS sb
        |  FROM b GROUP BY day),
        |sg AS (SELECT (sum(y * y) - sum(y) * sum(y) / count(*)) / (count(*) - 1.0) AS s2 FROM b),
        |c AS (SELECT day,
        |    sum(na) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cna,
        |    sum(sa) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csa,
        |    sum(nb) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cnb,
        |    sum(sb) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csb
        |  FROM dd),
        |e AS (SELECT c.*, sg.s2 FROM c, sg WHERE cna > 0.0 AND cnb > 0.0),
        |l AS (SELECT
        |    -0.5 * ln(1.0 + cna * cnb / (cna + cnb)) +
        |    (cna * cnb / (cna + cnb)) * (cna * cnb / (cna + cnb)) *
        |    (csa / cna - csb / cnb) * (csa / cna - csb / cnb) /
        |    (2.0 * s2 * (1.0 + cna * cnb / (cna + cnb))) AS ll
        |  FROM e),
        |f AS (SELECT count(*)::BIGINT AS n_days, max(round(ll, 4)) AS ml FROM l)
        |SELECT n_days, ml AS max_log_lambda,
        |  round(least(1.0, exp(-ml)), 4) AS always_valid_p,
        |  round(least(1.0, exp(-ml)), 4) < 0.05 AS reject FROM f""".stripMargin,
    "vif" ->
      s"""WITH $corrTripleCtes,
         |dt AS (SELECT r12, r13, r23,
         |    1.0 + 2.0 * r12 * r13 * r23 - r12 * r12 - r13 * r13 - r23 * r23 AS det
         |  FROM r)
         |SELECT 'l_quantity' AS feature, round((1.0 - r23 * r23) / det, 4) AS vif,
         |  round(1.0 - 1.0 / ((1.0 - r23 * r23) / det), 4) AS r2_others FROM dt
         |UNION ALL SELECT 'l_extendedprice', round((1.0 - r13 * r13) / det, 4),
         |  round(1.0 - 1.0 / ((1.0 - r13 * r13) / det), 4) FROM dt
         |UNION ALL SELECT 'l_discount', round((1.0 - r12 * r12) / det, 4),
         |  round(1.0 - 1.0 / ((1.0 - r12 * r12) / det), 4) FROM dt
         |ORDER BY feature""".stripMargin,
    "partial_corr" ->
      s"""WITH $corrTripleCtes
         |SELECT 'quantity_extendedprice' AS pair, round(r12, 4) AS corr,
         |  round((r12 - r13 * r23) / sqrt((1.0 - r13 * r13) * (1.0 - r23 * r23)), 4) AS partial_corr FROM r
         |UNION ALL SELECT 'quantity_discount', round(r13, 4),
         |  round((r13 - r12 * r23) / sqrt((1.0 - r12 * r12) * (1.0 - r23 * r23)), 4) FROM r
         |UNION ALL SELECT 'extendedprice_discount', round(r23, 4),
         |  round((r23 - r12 * r13) / sqrt((1.0 - r12 * r12) * (1.0 - r13 * r13)), 4) FROM r
         |ORDER BY pair""".stripMargin,
    "cooks_distance" ->
      """WITH g AS (SELECT count(*)::DOUBLE AS n, sum(l_quantity / 10.0) AS sx,
        |    sum(l_extendedprice / 100000.0) AS sy,
        |    sum((l_quantity / 10.0) * (l_quantity / 10.0)) AS sxx,
        |    sum((l_quantity / 10.0) * (l_extendedprice / 100000.0)) AS sxy,
        |    sum((l_extendedprice / 100000.0) * (l_extendedprice / 100000.0)) AS syy
        |  FROM lineitem),
        |st AS (SELECT n, sx, sy, sxx - sx * sx / n AS sxxc,
        |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS b,
        |    ((syy - sy * sy / n) - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) *
        |      (sxy - sx * sy / n)) / (n - 2.0) AS s2
        |  FROM g),
        |j AS (SELECT l_orderkey, l_linenumber, l_extendedprice / 100000.0 AS y,
        |    l_quantity / 10.0 AS x, st.* FROM lineitem, st),
        |c AS (SELECT l_orderkey, l_linenumber,
        |    y - ((sy / n - b * (sx / n)) + b * x) AS e,
        |    1.0 / n + (x - sx / n) * (x - sx / n) / sxxc AS h, s2 FROM j)
        |SELECT l_orderkey, l_linenumber,
        |  round(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 4) AS cooks_d,
        |  round(h, 6) AS leverage, round(e, 4) AS resid
        |FROM c ORDER BY cooks_d DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "cronbach_alpha" ->
      """WITH g AS (SELECT count(*)::DOUBLE AS n,
        |    sum(l_quantity / 10.0) AS s0,
        |    sum((l_quantity / 10.0) * (l_quantity / 10.0)) AS q0,
        |    sum(l_extendedprice / 100000.0) AS s1,
        |    sum((l_extendedprice / 100000.0) * (l_extendedprice / 100000.0)) AS q1,
        |    sum(l_discount) AS s2, sum(l_discount * l_discount) AS q2,
        |    sum(l_tax) AS s3, sum(l_tax * l_tax) AS q3,
        |    sum(l_quantity / 10.0 + l_extendedprice / 100000.0 + l_discount + l_tax) AS st,
        |    sum((l_quantity / 10.0 + l_extendedprice / 100000.0 + l_discount + l_tax) *
        |      (l_quantity / 10.0 + l_extendedprice / 100000.0 + l_discount + l_tax)) AS qt
        |  FROM lineitem),
        |a AS (SELECT n,
        |    4.0 / 3.0 * (1.0 - ((q0 - s0 * s0 / n) / (n - 1.0) + (q1 - s1 * s1 / n) / (n - 1.0)
        |      + (q2 - s2 * s2 / n) / (n - 1.0) + (q3 - s3 * s3 / n) / (n - 1.0)) /
        |      ((qt - st * st / n) / (n - 1.0))) AS alpha
        |  FROM g)
        |SELECT n::BIGINT AS n, 4::BIGINT AS k, round(alpha, 4) AS alpha,
        |  round(alpha, 4) >= 0.5 AS acceptable FROM a""".stripMargin,
    "grubbs_test" ->
      """WITH st AS (SELECT count(*)::DOUBLE AS n, avg(o_totalprice) AS m,
        |    stddev_samp(o_totalprice) AS sd FROM orders),
        |c AS (SELECT st.n, o_orderkey,
        |    round(abs(o_totalprice - st.m) / st.sd, 4) AS g FROM orders, st)
        |SELECT n::BIGINT AS n, o_orderkey AS outlier_key, g AS g_stat, g > 4.0 AS reject
        |FROM c ORDER BY g DESC, o_orderkey LIMIT 1""".stripMargin,
    "kruskal_wallis" ->
      """WITH o AS (SELECT o_orderpriority AS g, o_totalprice AS v FROM orders),
        |gv AS (SELECT v, count(*)::DOUBLE AS c FROM o GROUP BY v),
        |r AS (SELECT v, coalesce(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (c + 1.0) / 2.0 AS rk
        |  FROM gv),
        |per AS (SELECT o.g, count(*)::DOUBLE AS n, sum(r.rk) AS rs
        |  FROM o JOIN r ON o.v = r.v GROUP BY o.g),
        |tot AS (SELECT sum(n) AS nn, sum(rs * rs / n) AS rr, count(*)::DOUBLE AS k FROM per),
        |tt AS (SELECT sum(c * c * c - c) AS t3 FROM gv),
        |f AS (SELECT nn, k,
        |    CASE WHEN 1.0 - t3 / (nn * nn * nn - nn) > 0
        |      THEN (12.0 / (nn * (nn + 1.0)) * rr - 3.0 * (nn + 1.0)) /
        |        (1.0 - t3 / (nn * nn * nn - nn))
        |      ELSE 12.0 / (nn * (nn + 1.0)) * rr - 3.0 * (nn + 1.0) END AS h
        |  FROM tot, tt)
        |SELECT nn::BIGINT AS n, k::BIGINT AS k, round(h, 4) AS h_stat,
        |  round(h, 4) > 9.488 AS reject FROM f""".stripMargin,
    "jarque_bera" ->
      """WITH g AS (SELECT count(*)::DOUBLE AS n,
        |    sum(l_extendedprice / 100000.0) AS s1,
        |    sum((l_extendedprice / 100000.0) * (l_extendedprice / 100000.0)) AS s2,
        |    sum((l_extendedprice / 100000.0) * (l_extendedprice / 100000.0) * (l_extendedprice / 100000.0)) AS s3,
        |    sum((l_extendedprice / 100000.0) * (l_extendedprice / 100000.0) * (l_extendedprice / 100000.0) * (l_extendedprice / 100000.0)) AS s4
        |  FROM lineitem),
        |m AS (SELECT n, s1 / n AS mu, s2 / n - (s1 / n) * (s1 / n) AS m2,
        |    s3 / n - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |    s4 / n - 4.0 * (s1 / n) * (s3 / n) + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
        |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |  FROM g),
        |f AS (SELECT n, m3 / sqrt(m2 * m2 * m2) AS skew, m4 / (m2 * m2) AS kurt FROM m),
        |j AS (SELECT n, skew, kurt,
        |    n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jb FROM f)
        |SELECT n::BIGINT AS n, round(skew, 4) AS skewness, round(kurt, 4) AS kurtosis,
        |  round(jb, 4) AS jb_stat, round(jb, 4) > 5.991 AS reject FROM j""".stripMargin,
    "levene_test" ->
      """WITH li AS (SELECT l_returnflag AS g, l_extendedprice / 100000.0 AS v FROM lineitem),
        |mg AS (SELECT g, avg(v) AS m FROM li GROUP BY g),
        |z AS (SELECT li.g, abs(li.v - mg.m) AS z FROM li JOIN mg ON li.g = mg.g),
        |per AS (SELECT g, count(*)::DOUBLE AS n, sum(z) AS sz, sum(z * z) AS qz
        |  FROM z GROUP BY g),
        |tot AS (SELECT count(*)::DOUBLE AS k, sum(n) AS nn, sum(sz) AS tz,
        |    sum(sz * sz / n) AS bz, sum(qz) AS tq FROM per),
        |f AS (SELECT nn, k,
        |    ((bz - tz * tz / nn) / (k - 1.0)) / ((tq - bz) / (nn - k)) AS w
        |  FROM tot)
        |SELECT nn::BIGINT AS n, k::BIGINT AS k, round(w, 4) AS w_stat,
        |  round(w, 4) > 3.0 AS reject FROM f""".stripMargin,
    "mann_kendall" ->
      s"""WITH s0 AS ($dailySql),
         |s AS (SELECT series, x, (row_number() OVER (PARTITION BY series ORDER BY day) - 1)::BIGINT AS t FROM s0),
         |p AS (SELECT a.series, sign(b.x - a.x) AS sgn,
         |    (b.x - a.x) / (b.t - a.t)::DOUBLE AS slope
         |  FROM s a JOIN s b ON a.series = b.series AND a.t < b.t),
         |ss AS (SELECT series, sum(sgn) AS sv, count(*)::DOUBLE AS m FROM p GROUP BY series),
         |tg AS (SELECT series, x, count(*)::DOUBLE AS c FROM s GROUP BY series, x),
         |tv AS (SELECT series, sum(c * (c - 1.0) * (2.0 * c + 5.0)) AS tvv FROM tg GROUP BY series),
         |np AS (SELECT series, count(*)::DOUBLE AS n FROM s GROUP BY series),
         |rk AS (SELECT series, slope, row_number()
         |    OVER (PARTITION BY series ORDER BY slope)::DOUBLE AS rn FROM p),
         |sen AS (SELECT rk.series, avg(rk.slope) AS sen FROM rk JOIN ss ON rk.series = ss.series
         |  WHERE rk.rn = floor((ss.m + 1.0) / 2.0) OR rk.rn = floor((ss.m + 2.0) / 2.0)
         |  GROUP BY rk.series),
         |f AS (SELECT ss.series, np.n, ss.sv,
         |    (ss.sv - sign(ss.sv)) /
         |      NULLIF(sqrt((np.n * (np.n - 1.0) * (2.0 * np.n + 5.0) - tv.tvv) / 18.0), 0) AS z,
         |    sen.sen
         |  FROM ss JOIN tv ON ss.series = tv.series JOIN np ON ss.series = np.series
         |    JOIN sen ON ss.series = sen.series)
         |SELECT series, n::BIGINT AS n, sv::BIGINT AS s_stat, round(z, 4) AS z,
         |  round(sen, 4) AS sen_slope, abs(round(z, 4)) > 1.96 AS reject
         |FROM f ORDER BY series""".stripMargin,
    "logrank_test" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |dur AS (SELECT user_id, (max(day) - min(day) + 1)::BIGINT AS d FROM e GROUP BY user_id),
        |dg AS (SELECT d, user_id % 2 = 0 AS g1 FROM dur),
        |g AS (SELECT d, count(*)::DOUBLE AS dd,
        |    sum(CASE WHEN g1 THEN 1.0 ELSE 0.0 END) AS d1 FROM dg GROUP BY d),
        |c AS (SELECT d, dd, d1,
        |    sum(dd) OVER () - coalesce(sum(dd) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n,
        |    sum(d1) OVER () - coalesce(sum(d1) OVER (ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1
        |  FROM g),
        |a AS (SELECT sum(d1) AS o1, sum(dd * n1 / n) AS e1,
        |    sum(CASE WHEN n > 1.0 THEN dd * (n1 / n) * (1.0 - n1 / n) * (n - dd) / (n - 1.0)
        |      ELSE 0.0 END) AS v
        |  FROM c),
        |f AS (SELECT o1, e1, (o1 - e1) * (o1 - e1) / v AS chi FROM a)
        |SELECT o1::BIGINT AS observed_1, round(e1, 4) AS expected_1,
        |  round(chi, 4) AS chi2, round(chi, 4) > 3.841 AS reject FROM f""".stripMargin,
    "durbin_watson" ->
      s"""WITH s0 AS ($dailySql),
         |s AS (SELECT series, x, (row_number() OVER (PARTITION BY series ORDER BY day) - 1)::BIGINT AS t FROM s0),
         |st AS (SELECT series, count(*)::DOUBLE AS n, sum(t::DOUBLE) AS sts,
         |    sum(x) AS sx, sum(t::DOUBLE * x) AS stx, sum(t::DOUBLE * t::DOUBLE) AS stt
         |  FROM s GROUP BY series),
         |b AS (SELECT series,
         |    (stx - sts * sx / n) / (stt - sts * sts / n) AS bb,
         |    sx / n AS mx, sts / n AS mt FROM st),
         |e AS (SELECT s.series, s.t, s.x - (b.mx - b.bb * b.mt + b.bb * s.t::DOUBLE) AS e
         |  FROM s JOIN b ON s.series = b.series),
         |l AS (SELECT series, e, lag(e, 1) OVER (PARTITION BY series ORDER BY t) AS ep FROM e),
         |f AS (SELECT series, count(*)::BIGINT AS n,
         |    sum(CASE WHEN ep IS NOT NULL THEN (e - ep) * (e - ep) ELSE 0.0 END) /
         |      sum(e * e) AS dw
         |  FROM l GROUP BY series)
         |SELECT series, n, round(dw, 4) AS dw_stat, round(dw, 4) < 1.5 AS positive_autocorr
         |FROM f ORDER BY series""".stripMargin)
}
