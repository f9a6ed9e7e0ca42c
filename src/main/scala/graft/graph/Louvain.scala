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

  /** MULTI-round synchronous Louvain (the r13 verdict's "iterate the gated
    * one-round move"): `nRounds` rounds of the standard community-gain
    * move (Blondel et al. 2008, eq. 2) from the singleton init. Unlike
    * [[moveRound]] — whose gains are pairwise node-to-node because every
    * community is still a singleton — each round here evaluates the FULL
    * community-level gain of node i leaving its community C for a
    * neighbor community D under the current labels:
    *
    *   ΔQ(i: C→D) = (k_iD − k_iC∖i)/m − k_i·(Σtot(D) − (Σtot(C) − k_i))/(2m²)
    *
    * where k_iD = #edges from i into D and Σtot(D) = total degree of D.
    * Moves are synchronous (all nodes decide on the same labels, ties
    * min-community, move only on positive rounded gain) — deterministic
    * and order-independent, hence distributable and SQL-replayable, where
    * the classic sequential sweep is neither.
    *
    * Scale shape per round: Σtot is one groupBy(label) over the node
    * frame; k_iD is one join of the directed edge list against labels +
    * one groupBy(node, label); the argmax is a window keyed on the node
    * id. Nothing exceeds the edge-list scale, and labels are
    * checkpoint-truncated so R rounds stay R join-rounds (the
    * dedup_clusters CC discipline).
    *
    * Returns one row PER ROUND: (round, n_moved, n_communities,
    * modularity, n_nodes, partition_checksum) — the checksum is an
    * md5-derived sum over (node, label), so the oracle hash-gates the
    * exact partition of every round, not just counts. */
  def moveRounds(edges: DataFrame, a: String, b: String,
                 nRounds: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Num
    val e = edges.select(col(a).cast("long").as("p1"), col(b).cast("long").as("p2"))
      .localCheckpoint(true)
    val dd = e.select(col("p1").as("s"), col("p2").as("t"))
      .unionAll(e.select(col("p2").as("s"), col("p1").as("t")))
      .localCheckpoint(true)
    val deg = dd.groupBy(col("s").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
      .localCheckpoint(true)
    val m = e.count().toDouble
    // r17 opt (guide §2.4): the label frame CARRIES the (static) node
    // degree, so Σtot and the post-move community stats are join-free
    // grouped sums, and k_iC∖i comes off a node-key window over the
    // already-node-partitioned candidate frame instead of a separate
    // join leg (3 joins/round removed, the duplicated kic/cur subtrees
    // gone). All regrouped sums are of integer-valued doubles (degree
    // counts) — bit-exact, same gains, same labels.
    var lab = deg.select(col("node"), col("node").as("lab"), col("deg"))
    val rows = (1 to nRounds).map { r =>
      val stot = lab.groupBy(col("lab")).agg(sum(col("deg")).as("stot"))
      val kic = dd.join(lab.select(col("node").as("t"), col("lab").as("d")), "t")
        .groupBy(col("s"), col("d")).agg(count(lit(1)).cast("double").as("ksd"))
      val cur = lab.select(col("node").as("s"), col("lab").as("c"), col("deg").as("degs"))
        .join(stot.select(col("lab").as("c"), col("stot").as("stotc")), "c")
      // k_sC (edges into the CURRENT community) = the ksd of the d == c
      // row, surfaced to every candidate row of node s by a window on
      // the join key (no re-exchange: kic ⋈ cur is already keyed on s)
      val wS = Window.partitionBy(col("s"))
      val cand = kic.join(cur, "s")
        .withColumn("ksc",
          coalesce(max(when(col("d") === col("c"), col("ksd"))).over(wS), lit(0.0)))
        .filter(col("d") =!= col("c"))
        .join(stot.select(col("lab").as("d"), col("stot").as("stotd")), "d")
        .withColumn("g", r6((col("ksd") - col("ksc")) / lit(m) -
          col("degs") * (col("stotd") - (col("stotc") - col("degs"))) /
            lit(2.0 * m * m)))
      val w = Window.partitionBy(col("s")).orderBy(col("g").desc, col("d"))
      val choice = cand.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).select(col("s"), col("d"), col("g"))
      // synchronous moves oscillate on positive-gain label swaps (two
      // singletons exchanging labels forever); the standard parallel-Louvain
      // remedy is to let only an independent subset move per round
      // (coloring / random subsets — Lu, Halappanavar & Kalyanaraman 2015).
      // An md5 parity on (node, round) is the cheap deterministic
      // randomized coloring: ~half the nodes move each round, replayable.
      val mayMove = Num.md5Long(concat(col("node").cast("string"),
        lit(s"_lvp_$r"))) % 2 === 0
      // carry the previous label so n_moved fuses into the round-stats
      // aggregate below — previously a separate driver count() per round
      // doubled the round's job tally (verdict r14 #6)
      val newLab = lab.select(col("node"), col("lab").as("c"), col("deg"))
        .join(choice.withColumnRenamed("s", "node"), Seq("node"), "left")
        .select(col("node"),
          when(col("g") > 0 && mayMove, col("d")).otherwise(col("c")).as("lab"),
          col("c").as("_prev"), col("deg"))
        .localCheckpoint(true)
      lab = newLab.select(col("node"), col("lab"), col("deg"))
      // round stats over L_r: per-community q_terms r6'd then the sum
      // r6'd (+0.0 canonicalizes -0.0) — the ofPartition discipline
      val st2 = lab.groupBy(col("lab")).agg(sum(col("deg")).as("ds"))
      val ie = e.join(lab.select(col("node").as("p1"), col("lab").as("_l1")), "p1")
        .join(lab.select(col("node").as("p2"), col("lab").as("_l2")), "p2")
        .filter(col("_l1") === col("_l2"))
        .groupBy(col("_l1").as("lab")).agg(count(lit(1)).cast("double").as("iec"))
      val q = st2.join(ie, Seq("lab"), "left")
        .select((r6(coalesce(col("iec"), lit(0.0)) / lit(m) -
          pow(col("ds") / lit(2.0 * m), 2)) + lit(0.0)).as("qt"))
        .agg(count(lit(1)).cast("long").as("n_communities"),
          (round(sum(col("qt")), 6) + lit(0.0)).as("modularity"))
      val chk = newLab.agg(count(lit(1)).cast("long").as("n_nodes"),
        sum(when(col("lab") =!= col("_prev"), 1L).otherwise(0L))
          .cast("long").as("n_moved"),
        sum(Num.md5Mod(concat(col("node").cast("string"), lit("_"),
          col("lab").cast("string")))).as("partition_checksum"))
      q.crossJoin(chk).select(lit(r).cast("long").as("round"),
        col("n_moved"), col("n_communities"), col("modularity"),
        col("n_nodes"), col("partition_checksum"))
    }
    rows.reduce(_ unionAll _).orderBy("round")
  }
}
