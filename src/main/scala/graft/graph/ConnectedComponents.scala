package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation over an
  * undirected edge list — the shuffle-native alternative to collecting the
  * edge list into a driver union-find when the graph itself is data-scale
  * (reference cpp/src/dbscan/ runs its CC on-GPU for the same reason).
  *
  * Each round every node takes the minimum label over itself and its
  * neighbors; labels only decrease, and the propagation converges in
  * graph-diameter rounds to label = min node id of the component. Every
  * round is one join + one grouped min (shuffle key = node id);
  * localCheckpoint truncates the lineage so k rounds stay k shuffles.
  */
object ConnectedComponents {
  /** Both directions of the edge list: (src, dst). */
  private def directed(edges: DataFrame, a: String, b: String): DataFrame = {
    val e = edges.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
    e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def initLabels(dir: DataFrame): DataFrame =
    dir.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))

  private def step(dir: DataFrame, lab: DataFrame): DataFrame = {
    // min(own label, min over neighbor labels) as ONE grouped min over
    // the union of neighbor-label rows and the node's own label row —
    // one join + one aggregate per round (r17 opt; the former shape paid
    // a second node-key join to stitch the neighbor min back onto the
    // label frame). min over a union is the same min: bit-exact.
    dir.join(lab.select(col("node").as("dst"), col("label").as("_nl")), "dst")
      .select(col("src").as("node"), col("_nl").as("label"))
      .unionAll(lab)
      .groupBy(col("node")).agg(min(col("label")).as("label"))
  }

  /** Exactly `rounds` propagation rounds — deterministic and (for graphs
    * whose diameter < rounds) converged. The fixed count exists so a SQL
    * oracle can replay the identical computation as chained CTEs. */
  def propagate(edges: DataFrame, a: String, b: String, rounds: Int): DataFrame =
    graft.core.FitCache.getOrFit(graft.core.FitCache.key(edges,
      "cc_propagate", a, b, rounds)) {
      propagateUncached(edges, a, b, rounds)
    }

  private def propagateUncached(edges: DataFrame, a: String, b: String,
                                rounds: Int): DataFrame = {
    val dir = directed(edges, a, b).localCheckpoint(true)
    var lab = initLabels(dir)
    // checkpoint every other round: enough to keep the plan shallow while
    // halving the eager materializations
    (0 until rounds).foreach { i =>
      lab = step(dir, lab)
      if (i % 2 == 1 || i == rounds - 1) lab = lab.localCheckpoint(true)
    }
    lab
  }

  /** Pointer jump: every node additionally adopts its current label's OWN
    * label (label-of-label hop). Composed with the neighbor-min step this
    * is path doubling — labels reach the component minimum in
    * O(log diameter) rounds instead of O(diameter). */
  private def jump(lab: DataFrame): DataFrame =
    lab.join(lab.select(col("node").as("label"), col("label").as("_ll")), Seq("label"), "left")
      .select(col("node"), least(col("label"), coalesce(col("_ll"), col("label"))).as("label"))

  /** Propagate until no label changes (≤ maxRounds) — exact CC for
    * arbitrary diameter. Each round is neighbor-min + pointer jump, so
    * convergence needs O(log diameter) rounds and the default bound covers
    * any real graph. One extra count() per round for the fixpoint test.
    * (The fixed-rounds `propagate` deliberately omits the jump: its SQL
    * oracle replays plain neighbor-min rounds.) */
  def converge(edges: DataFrame, a: String, b: String, maxRounds: Int = 64): DataFrame =
    // labeling is deterministic (min-label fixpoint) over eager
    // checkpoints — memoized like PageRank/HITS
    graft.core.FitCache.getOrFit(graft.core.FitCache.key(edges,
      "cc_converge", a, b, maxRounds)) {
      convergeUncached(edges, a, b, maxRounds)
    }

  private def convergeUncached(edges: DataFrame, a: String, b: String,
                               maxRounds: Int): DataFrame = {
    // UNBOUNDED loop ⇒ graft.core.Iterate.materialize, NOT localCheckpoint:
    // Spark 4 carries estimated stats through checkpoints, and with three
    // joins per round the estimated sizeInBytes grows 3^r in bit-width —
    // past ~20 rounds the driver live-locks in BigInteger multiplication
    // during planning (observed on the sf1 bench).
    val dirS = graft.core.Iterate.materialize(directed(edges, a, b))
    val dir = dirS.df
    var labS = graft.core.Iterate.materialize(initLabels(dir))
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val nextS = graft.core.Iterate.materialize(jump(step(dir, labS.df)))
      changed = nextS.df.as("n").join(labS.df.as("p"), col("n.node") === col("p.node"))
        .filter(col("n.label") =!= col("p.label")).count()
      labS.unpersist()
      labS = nextS
      round += 1
    }
    dirS.unpersist()
    labS.df
  }
}
