package graft.stats

import graft.core.Num.{r4, r6}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Histogram-Based Outlier Score (HBOS, Goldstein & Dengel, KI 2012) —
  * the linear-time unsupervised outlier detector production pipelines run
  * when distance-based methods (LOF, kNN-outlier) are too expensive: each
  * feature gets an equal-width histogram, a row's score is the sum of the
  * negative log bin masses, and high scores mark rows that sit in
  * low-density regions of every feature independently.
  *
  * Scale shape: one moments aggregate (min/max per feature), one
  * map-side-combined groupBy to the ≤ features·bins histogram frame, and
  * one scoring scan against the broadcast histogram — no sort, no join on
  * data-scale keys. The histogram IS the model and it is O(features·bins)
  * regardless of corpus size.
  */
object Outliers {
  /** bin = floor((v−lo)/width) clamped to bins−1 (the max value belongs to
    * the last bin); degenerate lo==hi puts everything in bin 0. */
  private def binOf(v: Column, lo: Column, hi: Column, bins: Int): Column =
    when(hi === lo, lit(0L)).otherwise(
      least(floor((v - lo) / ((hi - lo) / bins)), lit(bins - 1.0)).cast("long"))

  /** Per-feature equal-width histograms + the HBOS scoring pass.
    * Returns one row per occupied (feature, bin) with the bin mass and
    * score term, plus repeated corpus totals (n_rows, n_outliers at
    * `threshold`, max_score) so the whole gate rides in one frame. A row
    * always lands in an occupied bin of its own feature, so empty bins
    * never contribute a score term. */
  def hbos(df: DataFrame, features: Seq[(String, Column)], bins: Int,
           threshold: Double): DataFrame = {
    // (feature, value) long frame: |features| narrow rows per input row,
    // collapsed map-side to ≤ features·bins histogram rows
    val long = df.select(explode(array(features.map { case (n, c) =>
      struct(lit(n).as("f"), c.cast("double").as("v"))
    }: _*)).as("u")).select(col("u.f").as("f"), col("u.v").as("v"))
    // stats feeds hist + one filter per feature, hist feeds one filter
    // per feature + the final frame: without the cache each reference
    // recomputes its subtree from the corpus (the r16 plan carried 12
    // lineitem scans for 3 features). Both frames are ≤ features·bins
    // rows — cache cost is nil, and each corpus pass now runs once
    // (guide §2.4: recomputed subtrees, not shuffles, were the waste).
    val stats = long.groupBy("f").agg(min("v").as("_lo"), max("v").as("_hi"),
      count(lit(1)).cast("double").as("_n"))
      .cache()
    val hist = long.join(broadcast(stats), "f")
      .groupBy(col("f"), binOf(col("v"), col("_lo"), col("_hi"), bins).as("bin"))
      .agg(count(lit(1)).cast("long").as("n"), max(col("_n")).as("_nf"))
      .select(col("f"), col("bin"), col("n"),
        r6(col("n") / col("_nf")).as("p"),
        r6(-log(col("n") / col("_nf"))).as("score_term"))
      .cache()
    // scoring scan: per-row score = Σ_f score_term(bin_f(row)); stats and
    // histogram are broadcast (≤ features·bins rows each) so the second
    // corpus pass is map-side only — each feature contributes one tiny
    // broadcast hash join, never a shuffle
    val scoredRows = features.foldLeft(df) { case (acc, (n, c)) =>
      val st = stats.filter(col("f") === n)
        .select(col("_lo").as(s"_lo_$n"), col("_hi").as(s"_hi_$n"))
      val hs = hist.filter(col("f") === n)
        .select(col("bin").as(s"_bin_$n"), col("score_term").as(s"_st_$n"))
      acc.crossJoin(broadcast(st))
        .withColumn(s"_b_$n",
          binOf(c.cast("double"), col(s"_lo_$n"), col(s"_hi_$n"), bins))
        .join(broadcast(hs), col(s"_b_$n") === col(s"_bin_$n"))
    }
    val total = features.map { case (n, _) => col(s"_st_$n") }.reduce(_ + _)
    val summary = scoredRows.select(round(total, 6).as("_score"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(when(col("_score") >= threshold, 1L).otherwise(0L)).cast("long")
          .as("n_outliers"),
        r4(max(col("_score"))).as("max_score"))
    hist.crossJoin(broadcast(summary)).orderBy("f", "bin")
  }
}
