package graft.manifold

import graft.neighbors.KNN
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Manifold learning front-ends (reference python/cuml/manifold/umap.pyx,
  * t_sne.pyx). The data-scale phases — kNN graph construction and
  * per-point bandwidth calibration — are implemented distributed; the
  * embedding layout iterations (O(n) state, not O(n·features)) are the
  * classic follow-up and stay out of the 100 TB hot path.
  */
object Manifold {
  /** UMAP fuzzy simplicial set weights: per node i, ρ_i = nearest distance,
    * σ_i solved (binary search) so Σ_j exp(−(d_ij−ρ_i)/σ_i) = log2(k).
    * Everything after the kNN pass is per-node math on k doubles — done in
    * a deterministic scalar function over the collected neighbor list. */
  def umapGraphWeights(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val knn = KNN.bruteForce(emb, emb, idCol, idCol, vecCol, vecCol, k,
      KNN.Euclidean, excludeSelf = true)
    val grouped = knn.groupBy(col("qid"))
      .agg(sort_array(collect_list(struct(col("rank"), col("id"), col("score")))).as("nbrs"))
    val spark = emb.sparkSession
    val solve = udf { (nbrs: Seq[org.apache.spark.sql.Row]) =>
      val ds = nbrs.map(_.getDouble(2)).toArray
      val rho = ds.min
      val target = math.log(ds.length.toDouble) / math.log(2.0)
      var lo = 1e-6; var hi = 1e6
      var it = 0
      while (it < 64) {
        val mid = (lo + hi) / 2
        val s = ds.map(d => math.exp(-math.max(d - rho, 0.0) / mid)).sum
        if (s > target) hi = mid else lo = mid
        it += 1
      }
      val sigma = (lo + hi) / 2
      (rho, sigma, ds.map(d => math.exp(-math.max(d - rho, 0.0) / sigma)))
    }
    grouped.select(col("qid"), solve(col("nbrs")).as("_r"))
      .select(col("qid"),
        round(col("_r._1"), 4).as("rho"),
        round(col("_r._2"), 4).as("sigma"),
        transform(col("_r._3"), w => round(w, 4)).as("weights"))
  }

  /** t-SNE conditional-P calibration: per point, binary-search β = 1/(2σ²)
    * to hit the target perplexity over the kNN distances. */
  def tsnePerplexity(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                     perplexity: Double): DataFrame = {
    val knn = KNN.bruteForce(emb, emb, idCol, idCol, vecCol, vecCol, k,
      KNN.Euclidean, excludeSelf = true)
    val grouped = knn.groupBy(col("qid"))
      .agg(sort_array(collect_list(struct(col("rank"), col("id"), col("score")))).as("nbrs"))
    val logU = math.log(perplexity)
    val solve = udf { (nbrs: Seq[org.apache.spark.sql.Row]) =>
      val d2 = nbrs.map(r => { val d = r.getDouble(2); d * d }).toArray
      var beta = 1.0; var lo = 0.0; var hi = Double.PositiveInfinity
      var it = 0
      var h = 0.0
      while (it < 64) {
        val ps = d2.map(d => math.exp(-d * beta))
        val sum = ps.sum max 1e-300
        h = math.log(sum) + beta * d2.zip(ps).map { case (d, p) => d * p }.sum / sum
        if (h > logU) { lo = beta; beta = if (hi.isInfinity) beta * 2 else (beta + hi) / 2 }
        else { hi = beta; beta = (lo + beta) / 2 }
        it += 1
      }
      (beta, h)
    }
    grouped.select(col("qid"), solve(col("nbrs")).as("_r"))
      .select(col("qid"), round(col("_r._1"), 4).as("beta"),
        round(col("_r._2"), 4).as("entropy"))
  }
}
