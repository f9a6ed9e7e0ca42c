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
    * (SQL-exact), the number of non-empty clusters, and the invariant
    * SSE < total sum of squares (the k=1 solution — any useful k=4 fit
    * sits strictly below it). Centroid coordinates stay spec-gated. */
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
      .select(col("_n").as("n_points"), col("_k").as("n_clusters"),
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
  * break where consecutive core points gap > eps) — no pairwise join at
  * all, so it scales as a sort. Reference: cuml.DBSCAN
  * (reference python/cuml/cluster/dbscan.pyx; cpp/src/dbscan/).
  */
object DBSCAN {
  /** Returns (id, value, is_core, cluster) for core points; cluster = dense
    * index of the core-chain, -1 for non-core. */
  def oneD(df: DataFrame, idCol: String, valueCol: String,
           eps: Double, minPts: Int): DataFrame = {
    // range frames need integral offsets in the DataFrame API: work in
    // integer cents (values here carry 2 decimals), eps likewise.
    val epsC = math.round(eps * 100)
    val v = round(col(valueCol).cast("double") * 100).cast("long")
    val base = df.select(col(idCol).cast("long").as("id"), v.as("v"))
      .withColumn("n_nbr", count(lit(1)).over(Window.orderBy(col("v")).rangeBetween(-epsC, epsC)))
      .withColumn("is_core", col("n_nbr") >= minPts)
    val wSeq = Window.orderBy(col("v"), col("id"))
    val cores = base.filter(col("is_core"))
      .withColumn("gap", col("v") - lag(col("v"), 1).over(wSeq))
      .withColumn("new_cl", when(col("gap").isNull || col("gap") > epsC, 1L).otherwise(0L))
      .withColumn("cluster", sum(col("new_cl")).over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .select(col("id"), col("cluster"))
    base.join(cores, Seq("id"), "left")
      .select(col("id"), r4(col("v") / 100.0).as("value"),
        col("is_core"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }
}
