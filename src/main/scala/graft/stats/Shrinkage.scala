package graft.stats

import graft.core.Num.r6
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Empirical-Bayes beta-binomial rate shrinkage (Robbins 1956; the
  * "CTR smoothing" every ranking/ads pipeline runs before using per-group
  * conversion rates): fit a Beta(α, β) prior to the observed group rates
  * by method of moments, then replace each group's raw rate x/n with the
  * posterior mean (x+α)/(n+α+β) — small groups shrink hard toward the
  * global prior, large groups keep their own signal.
  *
  * Scale shape: one groupBy to the bounded group frame, one moments
  * aggregate over it for the prior (two scalars, broadcast back), one
  * stateless projection. Prior moments are rounded to the shared 1e-6
  * grid BEFORE α/β are derived and α/β again before the posterior, so
  * every downstream value replays engine-neutrally.
  */
object Shrinkage {
  /** Per-group (n, x, raw, shrunk) plus the fitted prior repeated on each
    * row. `successes`/`trials` are per-row 0/1-ish columns aggregated with
    * sum/count inside; `group` is the bounded grouping key. MoM guard:
    * var outside (0, m(1−m)) degrades to the uninformative Beta(1,1). */
  def betaBinomial(df: DataFrame, group: Column, success: Column): DataFrame = {
    val g = df.groupBy(group.as("grp"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(success.cast("double")).cast("long").as("x"))
      .withColumn("raw_rate", r6(col("x") / col("n")))
    val mom = g.agg(r6(avg(col("raw_rate"))).as("_m"),
        r6(var_samp(col("raw_rate"))).as("_v"),
        count(lit(1)).cast("long").as("n_groups"))
      .select(col("n_groups"), col("_m"), col("_v"),
        when(col("_v") > 0 && col("_v") < col("_m") * (lit(1.0) - col("_m")),
          r6(col("_m") * (col("_m") * (lit(1.0) - col("_m")) / col("_v") - 1.0)))
          .otherwise(1.0).as("alpha"),
        when(col("_v") > 0 && col("_v") < col("_m") * (lit(1.0) - col("_m")),
          r6((lit(1.0) - col("_m")) *
            (col("_m") * (lit(1.0) - col("_m")) / col("_v") - 1.0)))
          .otherwise(1.0).as("beta"))
    g.crossJoin(broadcast(mom))
      .select(col("grp"), col("n"), col("x"), col("raw_rate"),
        r6((col("x") + col("alpha")) / (col("n") + col("alpha") + col("beta")))
          .as("shrunk_rate"),
        col("alpha"), col("beta"), col("n_groups"))
      .orderBy("grp")
  }
}
