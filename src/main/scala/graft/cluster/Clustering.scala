package graft.cluster

import graft.core.Num.r4
import org.apache.spark.ml.clustering.{KMeans => MLKMeans}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clustering surface (reference python/cuml/cluster/kmeans.pyx,
  * dbscan.pyx).
  */
object KMeansGraft {
  /** Fit with MLlib's distributed Lloyd + k-means|| init (the Spark-native
    * counterpart of cuML's GPU Lloyd; same objective, seeded). Returns
    * per-cluster size and centroid, ordered by size desc for a
    * deterministic presentation. */
  def fitSummary(df: DataFrame, features: Seq[String], k: Int, seed: Long = 42L,
                 maxIter: Int = 20): DataFrame = {
    val va = new VectorAssembler().setInputCols(features.toArray).setOutputCol("_fv")
    val input = va.transform(df.select(features.map(c => col(c).cast("double").as(c)): _*))
    // seeded k-means|| + Lloyd → deterministic → fit-once (keyed on the
    // RAW frame: the assembler wraps a per-instance UDF closure)
    val model = graft.core.FitCache.getOrFit(graft.core.FitCache.key(df,
      "kmeans", features.mkString(","), k, seed, maxIter)) {
      new MLKMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
        .setFeaturesCol("_fv").setPredictionCol("_cl").setTol(1e-8)
        .fit(input)
    }
    val pred = model.transform(input)
    val aggCols = count(lit(1)).cast("long").as("size") +:
      features.map(c => r4(avg(col(c))).as(s"mean_$c"))
    val sizes = pred.groupBy(col("_cl")).agg(aggCols.head, aggCols.tail: _*)
    sizes.orderBy(col("size").desc, col("_cl")).drop("_cl")
  }

  /** PARTIAL HASH GATE row for the seeded k-means|| fit: point count
    * (SQL-exact), the BOUNDED non-empty-cluster invariant 1 ≤ k' ≤ k
    * (an exact k' would fail spuriously if Lloyd ever left a cluster
    * empty on degenerate data — same discipline as DBSCAN's
    * n_clusters_bounded), and the invariant SSE < total sum of squares
    * (the k=1 solution — any useful k=4 fit sits strictly below it).
    * Centroid coordinates stay spec-gated. */
  def fitGate(df: DataFrame, features: Seq[String], k: Int, seed: Long = 42L,
              maxIter: Int = 20): DataFrame = {
    val va = new VectorAssembler().setInputCols(features.toArray).setOutputCol("_fv")
    val input = va.transform(df.select(features.map(c => col(c).cast("double").as(c)): _*))
    val model = graft.core.FitCache.getOrFit(graft.core.FitCache.key(df,
      "kmeans", features.mkString(","), k, seed, maxIter)) {
      new MLKMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
        .setFeaturesCol("_fv").setPredictionCol("_cl").setTol(1e-8)
        .fit(input)
    }
    // SSE against the model's own centers (summary.trainingCost is only
    // carried by a fresh fit; recompute so the memoized path agrees)
    val centers = model.clusterCenters.map(_.toArray)
    val assigned = assign(features.map(col), centers.map(_.toSeq))
    val dists = centers.map { c =>
      features.zip(c).map { case (f, ci) => (col(f) - ci) * (col(f) - ci) }.reduce(_ + _)
    }
    val aggs = Seq(count(lit(1)).cast("long").as("_n"),
      countDistinct(assigned).cast("long").as("_k"),
      sum(least(dists: _*)).as("_sse")) ++
      features.map(f => var_pop(col(f)).as(s"_v$f"))
    input.agg(aggs.head, aggs.tail: _*)
      .select(col("_n").as("n_points"),
        (col("_k") >= 1 && col("_k") <= k).as("n_clusters_bounded"),
        (col("_sse") < col("_n") * features.map(f => col(s"_v$f")).reduce(_ + _))
          .as("sse_lt_totss"))
  }

  /** The assignment step (KMeans.predict) as a pure codegen'd expression:
    * argmin of squared distance to fixed centroids. Zero shuffle — this is
    * the piece that scores 100 TB of rows against a broadcast model. */
  def assign(features: Seq[Column], centroids: Seq[Seq[Double]]): Column = {
    val dists = centroids.map { c =>
      features.zip(c).map { case (f, ci) => (f - ci) * (f - ci) }.reduce(_ + _)
    }
    val best = least(dists: _*)
    dists.zipWithIndex.foldRight(lit(-1)) { case ((d, i), acc) =>
      when(d === best, lit(i)).otherwise(acc)
    }
  }

  /** Distance to EACH fixed centroid — cuML KMeans.transform(), which
    * returns the n×k centroid-distance matrix (reference
    * python/cuml/cluster/kmeans.pyx transform). Pure codegen'd columns,
    * zero shuffle: the 100 TB shape of scoring rows against a broadcast
    * model. */
  def distances(features: Seq[Column], centroids: Seq[Seq[Double]]): Seq[Column] =
    centroids.map { c =>
      sqrt(features.zip(c).map { case (f, ci) => (f - ci) * (f - ci) }.reduce(_ + _))
    }

  /** Squared distance to the NEAREST fixed centroid — the per-row term of
    * KMeans.score()/inertia_. Same codegen'd zero-shuffle shape as
    * [[assign]]; summing it per assigned cluster is the scoring pass. */
  def minSqDist(features: Seq[Column], centroids: Seq[Seq[Double]]): Column =
    least(centroids.map { c =>
      features.zip(c).map { case (f, ci) => (f - ci) * (f - ci) }.reduce(_ + _)
    }: _*)
}

/** DBSCAN. The exact 1-D case is fully expressible with range windows
  * (sort by value; a core point has ≥ minPts neighbors within eps; clusters
  * break where consecutive core points gap > eps). Until r11 this ran as
  * ONE global-order window — a single-partition sort that caps out on one
  * executor at scale. r12 range-partitions on value: points hash to
  * width-W buckets (W ≥ eps, so a ±eps range spans at most the adjacent
  * buckets), boundary points are MIRRORED into the neighbor bucket for
  * the neighbor count, per-bucket windows do the gap scan, and only the
  * bucket-summary frame (≤ #buckets rows: first/last core value + local
  * segment count) crosses partitions to stitch chains that span a bucket
  * boundary. Output is bit-identical to the global-window formulation.
  * Reference: cuml.DBSCAN (reference python/cuml/cluster/dbscan.pyx;
  * cpp/src/dbscan/).
  */
object DBSCAN {
  /** Returns (id, value, is_core, cluster) for core points; cluster = dense
    * index of the core-chain, -1 for non-core. */
  def oneD(df: DataFrame, idCol: String, valueCol: String,
           eps: Double, minPts: Int, nBuckets: Int = 0): DataFrame = {
    // range frames need integral offsets in the DataFrame API: work in
    // integer cents (values here carry 2 decimals), eps likewise.
    val epsC = math.round(eps * 100)
    val buckets = if (nBuckets > 0) nBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val v = round(col(valueCol).cast("double") * 100).cast("long")
    val pts = df.select(col(idCol).cast("long").as("id"), v.as("v"))
    // ONE stats pass picks the bucket width (driver reads 1 row)
    val st = pts.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      count(lit(1)).as("n")).head()
    if (st.getLong(2) == 0L)
      return pts.select(col("id"), r4(col("v") / 100.0).as("value"),
        lit(false).as("is_core"), lit(-1L).as("cluster"))
    val lo = st.getLong(0)
    val bW = math.max(epsC, (st.getLong(1) - lo) / buckets + 1)
    val maxB = (st.getLong(1) - lo) / bW
    val home = pts.withColumn("b", ((col("v") - lo) / bW).cast("long"))
      .withColumn("home", lit(true))
    // mirror boundary points into the adjacent bucket so its range
    // window sees every true ±eps neighbor; mirrors are counted but
    // never emitted (home=false)
    val off = (col("v") - lo) % bW
    val mirrorL = home.filter(off < epsC && col("b") > 0)
      .withColumn("b", col("b") - 1).withColumn("home", lit(false))
    val mirrorR = home.filter(off >= bW - epsC && col("b") < maxB)
      .withColumn("b", col("b") + 1).withColumn("home", lit(false))
    val all = home.unionByName(mirrorL).unionByName(mirrorR)
    val wRange = Window.partitionBy(col("b")).orderBy(col("v"))
      .rangeBetween(-epsC, epsC)
    val counted = all.withColumn("n_nbr", count(lit(1)).over(wRange))
      .filter(col("home"))
      .withColumn("is_core", col("n_nbr") >= minPts)
    // per-bucket gap scan over cores: local dense segment index
    val wSeq = Window.partitionBy(col("b")).orderBy(col("v"), col("id"))
    val cores = counted.filter(col("is_core"))
      .withColumn("gap", col("v") - lag(col("v"), 1).over(wSeq))
      .withColumn("new_seg", when(col("gap").isNull || col("gap") > epsC, 1L).otherwise(0L))
      .withColumn("local_seg", sum(col("new_seg")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
    // bucket summary (≤ #buckets rows): stitch cross-boundary chains.
    // base(b) = global cluster id of the bucket's first segment; a
    // bucket whose first core sits within eps of the previous non-empty
    // bucket's last core continues that cluster. The single-partition
    // window here runs over the TINY summary frame, never the data.
    val wB = Window.orderBy(col("b"))
    val bases = cores.groupBy(col("b"))
      .agg((max(col("local_seg")) + 1).as("n_segs"),
        min(col("v")).as("first_v"), max(col("v")).as("last_v"))
      .withColumn("prev_last", lag(col("last_v"), 1).over(wB))
      .withColumn("merged", when(col("prev_last").isNotNull &&
        col("first_v") - col("prev_last") <= epsC, 1L).otherwise(0L))
      .withColumn("segs_before", coalesce(sum(col("n_segs")).over(
        wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("merges_through", sum(col("merged")).over(
        wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("b"), (col("segs_before") - col("merges_through")).as("base"))
    val clustered = cores.join(broadcast(bases), Seq("b"))
      .select(col("id"), (col("base") + col("local_seg")).as("cluster"))
    counted.join(clustered, Seq("id"), "left")
      .select(col("id"), r4(col("v") / 100.0).as("value"),
        col("is_core"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }
}
