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
    * `build`.`buildKey`, then verify survivors exactly (left-semi on the
    * true key set). Returns one audit row: build/probe sizes, Bloom
    * pass-through, true matches, false positives, and the realized FP
    * rate among true non-matches. */
  def bloomJoinAudit(build: DataFrame, buildKey: Column,
                     probe: DataFrame, probeKey: Column,
                     m: Int = 1 << 18, k: Int = 3): DataFrame = {
    val keys = build.select(buildKey.cast("long").as("_k")).distinct()
    val bits = keys.select(explode(array(positions(col("_k"), m, k): _*)).as("pos"))
      .distinct()
    // a probe row passes iff ALL k slots are set: k chained BROADCAST
    // left-semi joins against the ≤m-row (constant, corpus-independent)
    // bit table — the probe side is filtered entirely map-side, zero
    // shuffles before the exchange this filter exists to shrink
    val pos = positions(probeKey.cast("long"), m, k)
    val probeCols = probeKey.cast("long").as("_k") +:
      pos.zipWithIndex.map { case (p, i) => p.as(s"_p$i") }
    val hit = (0 until k).foldLeft(probe.select(probeCols: _*)) {
      case (acc, i) =>
        acc.join(broadcast(bits.select(col("pos").as(s"_bit$i"))),
          col(s"_p$i") === col(s"_bit$i"), "left_semi")
    }
    // exact verify of the Bloom survivors only — at scale this is the
    // point: the expensive key-set join sees just the pass-through rows
    val trueHit = hit.join(keys, Seq("_k"), "left_semi")
    val nb = keys.agg(count(lit(1)).cast("long").as("n_build_keys"))
    val np = probe.agg(count(lit(1)).cast("long").as("n_probe"))
    val npass = hit.agg(count(lit(1)).cast("long").as("n_pass_bloom"))
    val ntrue = trueHit.agg(count(lit(1)).cast("long").as("n_true_match"))
    nb.crossJoin(broadcast(np)).crossJoin(broadcast(npass))
      .crossJoin(broadcast(ntrue))
      .select(col("n_build_keys"), col("n_probe"), col("n_pass_bloom"),
        col("n_true_match"),
        (col("n_pass_bloom") - col("n_true_match")).as("n_false_pos"),
        when(col("n_probe") > col("n_true_match"),
          round((col("n_pass_bloom") - col("n_true_match")).cast("double") /
            (col("n_probe") - col("n_true_match")), 6)).otherwise(0.0)
          .as("fp_rate"))
  }
}
