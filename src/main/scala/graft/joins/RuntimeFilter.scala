package graft.joins

import graft.core.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime join filtering — the shuffle killer for selective
  * joins at 100 TB: when a join's build side is selective but too large to
  * broadcast as rows, summarize its KEY SET as a constant-size Bloom
  * filter, broadcast THAT, and drop probe rows map-side before they ever
  * reach the join exchange. No false negatives by construction (every true
  * match's bits are set); false positives only cost shuffle bytes, never
  * correctness, and this operator audits its own FP rate exactly.
  *
  * Same deterministic md5 k-hash discipline as
  * [[graft.dedup.Dedup.bloomIncremental]] (position_i = md5(key‖"_bj_i")
  * mod m), realized as a DISTINCT position table (≤ m rows, saturating) —
  * the replayable form of the packed bitmap a production build would
  * broadcast. Spark's own AQE runtime filters are the engine-internal
  * cousin; this one is engine-neutral and SQL-replayable bit for bit.
  */
object RuntimeFilter {
  private def positions(key: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map(i => Num.md5Long(concat(key.cast("string"), lit(s"_bj_$i"))) % m)

  /** Probe `probe`.`probeKey` through a Bloom filter of
    * `build`.`buildKey`, then verify survivors exactly (against the true
    * key set). Returns one audit row: build/probe sizes, Bloom
    * pass-through, true matches, false positives, and the realized FP
    * rate among true non-matches.
    *
    * ONE probe-side scan: the r12 audit ran the 3-semi-join probe
    * pipeline once per aggregate (4 jobs over the probe side — 15 s cold
    * at sf0.1). The pass/match counts are now row FLAGS folded into a
    * single aggregate: each bit lookup is a broadcast left join whose
    * presence marks the slot, and only Bloom survivors carry a non-null
    * key into the exact verify join (null keys never match, so the
    * key-set join still sees just the pass-through rows — the at-scale
    * point of the filter is preserved). */
  def bloomJoinAudit(build: DataFrame, buildKey: Column,
                     probe: DataFrame, probeKey: Column,
                     m: Int = 1 << 18, k: Int = 3): DataFrame = {
    // keys feeds the bit table, the exact-verify join AND the key count;
    // bits feeds k broadcast legs — cached (keys = the Bloom build side,
    // small by design; bits ≤ m rows) so the build-side scan+distinct
    // runs once instead of ~5× (r17 opt, guide §3.2: the build side is
    // scanned twice by design — not six times)
    val keys = build.select(buildKey.cast("long").as("_k")).distinct().cache()
    val bits = keys.select(explode(array(positions(col("_k"), m, k): _*)).as("pos"))
      .distinct().cache()
    // a probe row passes iff ALL k slots are set: k chained BROADCAST
    // left joins against the ≤m-row (constant, corpus-independent) bit
    // table mark the slots entirely map-side — zero shuffles before the
    // exchange this filter exists to shrink
    val pos = positions(probeKey.cast("long"), m, k)
    val probeCols = probeKey.cast("long").as("_k") +:
      pos.zipWithIndex.map { case (p, i) => p.as(s"_p$i") }
    val flagged = (0 until k).foldLeft(probe.select(probeCols: _*)) {
      case (acc, i) =>
        acc.join(broadcast(bits.select(col("pos").as(s"_bit$i"))),
          col(s"_p$i") === col(s"_bit$i"), "left").drop(s"_p$i")
    }
    val pass = (0 until k).map(i => col(s"_bit$i").isNotNull).reduce(_ && _)
    // exact verify of the Bloom survivors only — non-survivors probe the
    // key-set join with a NULL key, which can never match
    val probed = flagged
      .select(col("_k"), pass.as("_pass"))
      .withColumn("_jk", when(col("_pass"), col("_k")))
      .join(keys.select(col("_k").as("_jk"), lit(1).as("_in")), Seq("_jk"), "left")
    val agg = probed.agg(
      count(lit(1)).cast("long").as("n_probe"),
      sum(when(col("_pass"), 1L).otherwise(0L)).cast("long").as("n_pass_bloom"),
      sum(when(col("_in").isNotNull, 1L).otherwise(0L)).cast("long").as("n_true_match"))
    val nb = keys.agg(count(lit(1)).cast("long").as("n_build_keys"))
    nb.crossJoin(broadcast(agg))
      .select(col("n_build_keys"), col("n_probe"), col("n_pass_bloom"),
        col("n_true_match"),
        (col("n_pass_bloom") - col("n_true_match")).as("n_false_pos"),
        when(col("n_probe") > col("n_true_match"),
          round((col("n_pass_bloom") - col("n_true_match")).cast("double") /
            (col("n_probe") - col("n_true_match")), 6)).otherwise(0.0)
          .as("fp_rate"))
  }
}
