package graft.graph

import graft.core.Num.r6
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a node partition — the standard quality score for
  * community structure (Newman & Girvan 2004):
  *
  *   Q = Σ_c ( e_c / m − (deg_c / 2m)² )
  *
  * with m the undirected edge count, e_c the edges internal to community
  * c, and deg_c the community's degree sum. Paired with the deterministic
  * min-label connected components ([[ConnectedComponents.propagate]]) it
  * grades a clustering the same way silhouette grades k-means — every
  * piece (labels, degrees, internal-edge counts) is a map-side-combined
  * aggregate or an equi-join on node ids, so the score costs two shuffles
  * at any graph size.
  */
object Modularity {
  /** Modularity of the `rounds`-round min-label CC partition of `edges`
    * (columns a, b; undirected, no self-loops, assumed deduplicated).
    * Returns the per-community frame (community, n_nodes, internal_edges,
    * degree_sum, q_term) with repeated graph totals — one row per
    * community, bounded by the community count. */
  def ofComponents(edges: DataFrame, a: String, b: String,
                   rounds: Int = 8): DataFrame = {
    val e = edges.select(col(a).cast("long").as("p1"), col(b).cast("long").as("p2"))
      .localCheckpoint() // labels + two label joins + degrees read it
    val lab = ConnectedComponents.propagate(e, "p1", "p2", rounds)
    // internal edges: both endpoints' labels (CC labels make every edge
    // internal by construction, but the formula is partition-agnostic —
    // callers can pass any label frame through ofPartition below)
    ofPartition(e, lab)
  }

  /** Modularity of an arbitrary partition: `labels` = (node, label),
    * covering exactly the nodes of `e` (all callers pass CC/move labels
    * derived from the same edge list — r17 opt precondition: with full
    * coverage, per-community degree sums can come straight off the
    * labeled edge frame instead of a node-degree groupBy + node-key
    * join + regroup; internal edges and degree sums now share ONE
    * labeled-edge subtree and n_nodes is a join-free grouped count.
    * Degree sums regroup integer counts — bit-exact). */
  def ofPartition(e: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("node"), col("label"))
    val withL = e
      .join(lab.select(col("node").as("p1"), col("label").as("_l1")), "p1")
      .join(lab.select(col("node").as("p2"), col("label").as("_l2")), "p2")
    // ONE pass over the labeled edges to the compact (l1, l2) count
    // frame (bounded by community-pair mass); internal edges AND degree
    // sums both derive from it by regrouping integer counts (exact)
    val cpair = withL.groupBy(col("_l1"), col("_l2"))
      .agg(count(lit(1)).cast("long").as("_ec"))
    val internal = cpair.filter(col("_l1") === col("_l2"))
      .groupBy(col("_l1").as("community"))
      .agg(sum(col("_ec")).cast("long").as("internal_edges"))
    val dsum = cpair
      .select(explode(array(col("_l1"), col("_l2"))).as("community"), col("_ec"))
      .groupBy("community").agg(sum(col("_ec")).cast("double").as("degree_sum"))
    val deg = lab.groupBy(col("label").as("community"))
      .agg(count(lit(1)).cast("long").as("n_nodes"))
      .join(dsum, "community")
    val m = e.agg(count(lit(1)).cast("double").as("_m"))
    val per = deg.join(internal, Seq("community"), "left")
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        col("degree_sum").cast("long").as("degree_sum"),
        // + 0.0 canonicalizes IEEE negative zero (a tiny negative q_term
        // rounds to -0.0 and the two engines disagree on its sign bit)
        (r6(coalesce(col("internal_edges"), lit(0L)) / col("_m") -
          pow(col("degree_sum") / (lit(2.0) * col("_m")), 2)) + lit(0.0)).as("q_term"))
    val tot = per.agg(count(lit(1)).cast("long").as("n_communities"),
      (round(sum(col("q_term")), 6) + lit(0.0)).as("modularity"))
    per.crossJoin(broadcast(tot)).orderBy("community")
  }
}
