package graft.stats

import graft.core.Num.{r4, r6}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Off-policy evaluation by importance sampling (Horvitz & Thompson 1952;
  * Swaminathan & Joachims 2015 for SNIPS) — how a logging pipeline scores
  * a NEW policy from OLD logged interactions without an A/B test:
  *
  *   IPS   = 1/n Σ w_i·r_i,   w_i = π_new(a_i)/π_log(a_i)
  *   SNIPS = Σ w_i·r_i / Σ w_i          (self-normalized, lower variance)
  *   ESS   = (Σ w_i)² / Σ w_i²          (effective sample size — the
  *                                       diagnostic that says whether the
  *                                       estimate is usable at all)
  *
  * The logging propensity is estimated empirically as the action's share
  * of the log (the standard plug-in when the logger's probabilities were
  * not recorded); the target policy is a literal distribution.
  *
  * Scale shape: one map-side-combined action groupBy (bounded by the
  * action vocabulary) broadcast back, then ONE corpus aggregate. Nothing
  * data-scale leaves the executors. */
object OffPolicy {
  /** Evaluate the target policy that plays `promoted` with probability
    * `pPromoted` and spreads the rest uniformly over the other actions.
    * `reward` is a per-row 0/1-ish column. Returns one row:
    * (n, n_actions, ips, snips, ess, max_w, avg_reward_logged). */
  def ipsSnips(df: DataFrame, action: Column, reward: Column,
               promoted: String, pPromoted: Double): DataFrame = {
    val base = df.select(action.as("_a"), reward.cast("double").as("_r"))
    val shares = base.groupBy(col("_a"))
      .agg(count(lit(1)).cast("double").as("_ca"))
    val tot = shares.agg(sum(col("_ca")).as("_n"),
      count(lit(1)).cast("double").as("_k"))
    // π_log(a) = share, π_new(a) = literal rule; both quantized r6 so the
    // weight every estimator consumes replays engine-neutrally
    val w = base.join(broadcast(shares), Seq("_a"))
      .crossJoin(broadcast(tot))
      .withColumn("_pl", r6(col("_ca") / col("_n")))
      .withColumn("_pn", r6(when(col("_a") === promoted, lit(pPromoted))
        .otherwise(lit(1.0 - pPromoted) / (col("_k") - 1.0))))
      .withColumn("_w", r6(col("_pn") / col("_pl")))
    w.agg(count(lit(1)).cast("long").as("n"),
        max(col("_k")).cast("long").as("n_actions"),
        r6(sum(col("_w") * col("_r")) / count(lit(1))).as("ips"),
        r6(sum(col("_w") * col("_r")) / sum(col("_w"))).as("snips"),
        r4(pow(sum(col("_w")), 2) / sum(col("_w") * col("_w"))).as("ess"),
        r6(max(col("_w"))).as("max_w"),
        r6(avg(col("_r"))).as("avg_reward_logged"))
  }
}
