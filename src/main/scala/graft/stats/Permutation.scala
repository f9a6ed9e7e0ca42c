package graft.stats

import graft.core.Num.{md5Long, r6}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Permutation test for a difference in group means (Fisher 1935; the
  * exact-by-construction significance test A/B platforms fall back to
  * when normal-approximation assumptions are shaky): re-randomize the
  * group assignment J times, recompute the mean difference under each,
  * and the p-value is the share of permuted |diffs| at least as extreme
  * as the observed one — (1 + #extreme)/(J + 1) with the add-one so the
  * test is valid at finite J (Phipson & Smyth 2010).
  *
  * Permutations are md5-derived per (unit, j) — deterministic,
  * engine-replayable, and exactly the label-exchange null when units are
  * exchangeable. Scale shape: the unit frame explodes J× in-row and
  * collapses in ONE map-side-combined groupBy(j) (J bounded rows out);
  * nothing data-scale crosses a second shuffle. */
object Permutation {
  /** Two-sided permutation test of mean(`metric`) between the md5 halves
    * of `unit` under `salt`. Returns one row: (n_units, obs_diff,
    * n_perms, n_extreme, p_value, reject_05). */
  def meanDiff(df: DataFrame, unit: Column, metric: Column,
               salt: String, nPerms: Int): DataFrame = {
    val base = df.select(unit.cast("string").as("_u"),
      metric.cast("double").as("_m"))
    def diffOf(assign: Column): (Column, Column) = (
      sum(when(assign, col("_m"))) / sum(when(assign, 1.0)),
      sum(when(!assign, col("_m"))) / sum(when(!assign, 1.0)))
    val obsA = md5Long(concat(col("_u"), lit(s"_$salt"))) % 2 === 0
    val (oa, ob) = diffOf(obsA)
    val obs = base.agg(count(lit(1)).cast("long").as("n_units"),
      r6(oa - ob).as("obs_diff"))
    // J in-row replicas -> ONE groupBy(j): each permutation's diff is a
    // conditional aggregate over the same pass
    val permA = md5Long(concat(col("_u"), lit(s"_${salt}_"),
      col("_j").cast("string"))) % 2 === 0
    val (pa, pb) = diffOf(permA)
    val perms = base
      .select(col("_u"), col("_m"),
        explode(sequence(lit(0), lit(nPerms - 1))).as("_j"))
      .groupBy(col("_j")).agg(r6(pa - pb).as("_d"))
    val ex = perms.crossJoin(broadcast(obs))
      .agg(sum(when(abs(col("_d")) >= abs(col("obs_diff")), 1L).otherwise(0L))
        .cast("long").as("n_extreme"))
    obs.crossJoin(broadcast(ex))
      .select(col("n_units"), col("obs_diff"),
        lit(nPerms.toLong).as("n_perms"), col("n_extreme"),
        r6((col("n_extreme") + 1.0) / (nPerms + 1.0)).as("p_value"),
        ((col("n_extreme") + 1.0) / (nPerms + 1.0) < 0.05).as("reject_05"))
  }
}
