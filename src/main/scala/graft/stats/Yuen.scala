package graft.stats

import graft.core.Num.r4
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Yuen's trimmed-mean two-sample t (Yuen 1974) — the robust companion
  * of Welch's t: compare γ-trimmed means with winsorized variances, so a
  * heavy tail or a handful of outliers cannot swamp the comparison.
  *
  * EXACT order statistics, distributed: the γ-trimmed sum is the sum of
  * order statistics ranked (g, n−g] (g = ⌈γn⌉), which is computable
  * WITHOUT sorting rows — from the per-group DISTINCT-VALUE cumulative
  * counts, each value v with count c and inclusive cumsum cs contributes
  * max(0, min(cs, n−g) − max(cs−c, g)) copies to the trimmed window.
  * The cumsum itself is the scale-safe [[graft.core.Ranks]] distributed
  * prefix sum over (group, value) — per-group prefixes recovered by
  * subtracting each group's broadcast start offset (groups are
  * contiguous under the (group, value) total order), so there is no
  * per-group single-partition window at any size. Winsorized moments
  * follow closed-form: the bottom/top g ranks are replaced by the
  * boundary order statistics v_(g+1) / v_(n−g) (min v with cumsum
  * reaching the rank). Everything replays in SQL on the same distinct
  * frame. */
object Yuen {
  /** One row: n/g/trimmed-mean per group, Yuen t, Satterthwaite df on
    * winsorized variances, large-sample ±1.96 reject. */
  def trimmedTest(df: DataFrame, value: Column, isA: Column,
                  gamma: Double = 0.2): DataFrame = {
    val base = df.select(value.cast("double").as("_v"),
      when(isA, 0L).otherwise(1L).as("_g"))
    val dv = base.groupBy(col("_g"), col("_v"))
      .agg(count(lit(1)).cast("long").as("_c"))
    val cum = graft.core.Ranks.withGlobalCumSums(dv,
      Seq(col("_g"), col("_v")), Seq((col("_c"), "_cs")))
    val offs = dv.groupBy(col("_g")).agg(sum(col("_c")).cast("long").as("_ng"))
    val wOff = Window.orderBy(col("_g")) // 2-row group frame
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs2 = offs.select(col("_g"), col("_ng"),
      coalesce(sum(col("_ng")).over(wOff), lit(0L)).as("_start"))
    val j = cum.join(broadcast(offs2), "_g")
      .withColumn("_gcs", col("_cs") - col("_start"))
    val gq = ceil(col("_ng") * gamma).cast("long")
    val kept = greatest(lit(0L),
      least(col("_gcs"), col("_ng") - gq) - greatest(col("_gcs") - col("_c"), gq))
    val per = j.groupBy(col("_g")).agg(
      max(col("_ng")).as("_n"),
      max(gq).as("_gq"),
      sum(col("_v") * kept.cast("double")).as("_ts"),
      sum(col("_v") * col("_v") * kept.cast("double")).as("_tss"),
      min(when(col("_gcs") >= gq + 1, col("_v"))).as("_vlo"),
      min(when(col("_gcs") >= col("_ng") - gq, col("_v"))).as("_vhi"))
    def side(g: Int, c: String): Column = max(when(col("_g") === g, col(c)))
    val one = per.agg(
      side(0, "_n").as("na"), side(1, "_n").as("nb"),
      side(0, "_gq").as("ga"), side(1, "_gq").as("gb"),
      side(0, "_ts").as("tsa"), side(1, "_ts").as("tsb"),
      side(0, "_tss").as("tssa"), side(1, "_tss").as("tssb"),
      side(0, "_vlo").as("loa"), side(1, "_vlo").as("lob"),
      side(0, "_vhi").as("hia"), side(1, "_vhi").as("hib"))
    def stats(n: Column, gg: Column, ts: Column, tss: Column,
              lo: Column, hi: Column): (Column, Column, Column) = {
      val h = (n - gg * 2).cast("double")
      val wsum = ts + gg * (lo + hi)
      val wss = tss + gg * (lo * lo + hi * hi)
      val wmean = wsum / n
      val s2w = (wss - n * wmean * wmean) / (n - 1).cast("double")
      // tiny-group guard (advice r13): with n ≤ 3 at gamma = 0.2 the
      // trimmed count h = n − 2g hits 0/negative and h·(h−1) divides by
      // zero — make the degenerate sides EXPLICIT nulls (the NULLIF
      // discipline) instead of relying on Divide's null-on-zero
      val tmean = when(h > 0, ts / h)
      val dTerm = when(h > 1, s2w * (n - 1).cast("double") / (h * (h - 1)))
      (tmean, dTerm, h)
    }
    val (tma, da, ha) = stats(col("na"), col("ga"), col("tsa"), col("tssa"),
      col("loa"), col("hia"))
    val (tmb, db, hb) = stats(col("nb"), col("gb"), col("tsb"), col("tssb"),
      col("lob"), col("hib"))
    val t = (tma - tmb) / sqrt(da + db)
    val dfY = (da + db) * (da + db) /
      (da * da / (ha - 1) + db * db / (hb - 1))
    one.select(col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      col("ga").cast("long").as("g_a"), col("gb").cast("long").as("g_b"),
      r4(tma).as("trim_mean_a"), r4(tmb).as("trim_mean_b"),
      r4(t).as("t_yuen"), round(dfY, 2).as("df"),
      (abs(r4(t)) > 1.96).as("reject"))
  }
}
