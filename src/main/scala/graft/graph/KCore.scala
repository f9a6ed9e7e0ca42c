package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by fixed-round peeling — the graph-density screen
  * beside [[PageRank]]/[[HITS]] (crawl graphs: which host neighborhoods
  * are densely interlinked; co-purchase graphs: which product communities
  * are cohesive).
  *
  * Each round drops nodes whose CURRENT degree is below k, then restricts
  * the edge set to survivors: one unioned degree groupBy + two semi-join
  * restrictions per round, shuffle keys = node ids; `localCheckpoint`
  * truncates lineage so r rounds stay r shuffle rounds (the
  * ConnectedComponents discipline). A FIXED round count makes the peeling
  * exactly replayable as chained SQL CTEs; real graphs converge in a few
  * rounds and the per-round (n_nodes, n_edges) trace shows it.
  */
object KCore {
  /** `edges`: undirected (p1, p2) pairs, p1 < p2, deduplicated.
    * Returns one row per round: (round, n_nodes, n_edges) AFTER that
    * round's peel. */
  def run(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("p1"), col("p2")).localCheckpoint(true)
    val perRound = (1 to rounds).map { r =>
      val deg = e.select(col("p1").as("p")).unionAll(e.select(col("p2").as("p")))
        .groupBy("p").agg(count(lit(1)).as("_dg"))
      val keep = deg.filter(col("_dg") >= k).select(col("p")).localCheckpoint(true)
      e = e.join(keep.select(col("p").as("p1")), "p1")
        .join(keep.select(col("p").as("p2")), "p2")
        .localCheckpoint(true)
      keep.agg(count(lit(1)).cast("long").as("n_nodes"))
        .crossJoin(e.agg(count(lit(1)).cast("long").as("n_edges")))
        .select(lit(r.toLong).as("round"), col("n_nodes"), col("n_edges"))
    }
    perRound.reduce(_ unionAll _).orderBy("round")
  }
}
