package graft.graph

import graft.core.Num.r6
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One synchronous Louvain move round (Blondel et al. 2008, J. Stat.
  * Mech.) from the singleton initialization: every node inspects its
  * neighbors' (still-singleton) communities and moves to the one with the
  * best positive modularity gain,
  *
  *   ΔQ(s→t) = w_st/m − deg_s·deg_t/(2m²)     (w_st = 1 on a simple graph)
  *
  * staying put when no gain is positive. The synchronous variant makes
  * every decision independent (hence distributable AND replayable — the
  * classic sequential sweep is order-dependent); the moved-to choices
  * form a graph whose connected components are the round's communities,
  * resolved by the fixed-round min-label CC, and the result is scored by
  * [[Modularity.ofPartition]].
  *
  * Scale shape: gains are ONE equi-join of the directed edge list against
  * the degree frame; the argmax is a window partitioned on the node key;
  * CC and the modularity score are the already-gated fixed-round pieces.
  * No step touches anything bigger than the edge list. */
object Louvain {
  /** The move-choice labels: (node, label) after one synchronous round +
    * `ccRounds` min-label rounds over the choice graph. */
  def moveRound(edges: DataFrame, a: String, b: String,
                ccRounds: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col(a).cast("long").as("p1"), col(b).cast("long").as("p2"))
      .localCheckpoint()
    val dd = e.select(col("p1").as("s"), col("p2").as("t"))
      .unionAll(e.select(col("p2").as("s"), col("p1").as("t")))
    val deg = dd.groupBy(col("s").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val m = e.agg(count(lit(1)).cast("double").as("_m"))
    val gains = dd
      .join(deg.select(col("node").as("s"), col("deg").as("_ds")), "s")
      .join(deg.select(col("node").as("t"), col("deg").as("_dt")), "t")
      .crossJoin(broadcast(m))
      .withColumn("q", r6(lit(1.0) / col("_m") -
        col("_ds") * col("_dt") / (lit(2.0) * col("_m") * col("_m"))))
    val w = Window.partitionBy(col("s")).orderBy(col("q").desc, col("t"))
    val choice = gains.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("s").as("node"),
        when(col("q") > 0, col("t")).otherwise(col("s")).as("tgt"))
    val ce = choice.select(col("node").as("p1"), col("tgt").as("p2"))
    ConnectedComponents.propagate(ce, "p1", "p2", ccRounds)
  }

  /** Full gate frame: per-community stats + modularity of the one-round
    * partition (bounded by community count). */
  def moveRoundModularity(edges: DataFrame, a: String, b: String,
                          ccRounds: Int = 8): DataFrame = {
    val e = edges.select(col(a).cast("long").as("p1"), col(b).cast("long").as("p2"))
      .localCheckpoint()
    Modularity.ofPartition(e, moveRound(e, "p1", "p2", ccRounds))
  }
}
