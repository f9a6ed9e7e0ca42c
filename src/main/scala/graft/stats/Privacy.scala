package graft.stats

import graft.core.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Laplace mechanism for differentially private counts (Dwork et al.
  * TCC 2006): released count = true count + Lap(Δ/ε) noise, sensitivity
  * Δ=1 for counting queries. What a pipeline publishes to dashboards /
  * partners when the raw per-segment counts are user-sensitive.
  *
  * THIS gate draws the noise DETERMINISTICALLY — the Laplace inverse CDF
  * applied to an md5-derived uniform per key — so both engines replay the
  * identical release bit-for-bit. That makes the gate a mechanism-replay
  * test, NOT a privacy proof: production swaps the md5 uniform for a real
  * RNG (the mechanism and its utility accounting are unchanged).
  *
  * Scale shape: one map-side-combined groupBy to the bounded key frame,
  * then a stateless noise projection. */
object Privacy {
  /** Per-key noisy counts at privacy budget `epsilon`. Returns (key, n,
    * noise, n_noisy, epsilon, within_budget) — `within_budget` checks the
    * noise against the 1e-9-tail bound (ln(5e8)/ε), an always-true
    * invariant of the inverse CDF that pins the replay. */
  def laplaceCounts(df: DataFrame, key: Column, epsilon: Double): DataFrame = {
    val g = df.groupBy(key.as("key")).agg(count(lit(1)).cast("long").as("n"))
    // u in (0,1): md5-derived, per-key; Laplace inverse CDF at u−0.5,
    // rounded to an integer release (the discrete publish convention)
    val u = (Num.md5Long(concat(col("key").cast("string"), lit("_dp"))) % 1000000L
      + 1.0) / 1000001.0
    val shifted = u - 0.5
    val noise = round(
      -signum(shifted) * (lit(1.0) / epsilon) * log(lit(1.0) - abs(shifted) * 2.0), 0)
      .cast("long")
    val bound = math.ceil(math.log(5e8) / epsilon).toLong
    g.select(col("key"), col("n"), noise.as("noise"),
        (col("n") + noise).as("n_noisy"), lit(epsilon).as("epsilon"),
        (abs(noise) <= bound).as("within_budget"))
      .orderBy("key")
  }
}
