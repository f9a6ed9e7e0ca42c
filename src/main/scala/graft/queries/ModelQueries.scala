package graft.queries

import graft.cluster.KMeansGraft
import graft.core.Num.r4
import graft.core.Tables
import graft.io.ModelIO
import graft.linear.{OLS, Softmax}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-persistence query surface — the save/load round-trip the
  * reference gates with python/cuml/test/test_pickle.py, made hash-gated
  * here: each query fits (or takes) a model, saves it to parquet via
  * [[ModelIO]], loads it back, and scores THROUGH THE LOADED COPY. The
  * oracle is the same SQL as the direct-scoring twin query, so a hash
  * match proves the round-trip is parameter-exact (doubles survive
  * parquet bit-identically) — any loss in save/load would shift the
  * scored aggregates and break the hash.
  */
object ModelQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fresh local model dir per call, deleted once the load has collected
    * the parameters into driver memory (Bench re-invokes these queries
    * every round — nothing may accumulate in /tmp). At scale the same
    * save/load API takes an object-store URI and persistence is the
    * point, not a round-trip proof. */
  private def withTmpModel[T](tag: String)(f: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_model_$tag")
    try f(dir.toString)
    finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  val queries: Map[String, Q] = Map(
    "model_io_linreg" -> { (s, d) =>
      // fit → save → load → present: twin of linreg_ols through parquet
      val m = OLS.fit(Tables.lineitem(s, d), Seq("l_quantity"), "l_extendedprice")
      val loaded = withTmpModel("linreg") { path =>
        ModelIO.saveLinear(s, m, path)
        ModelIO.loadLinear(s, path)
      }
      loaded.toDF(s).select(col("term"),
        when(col("term") === "intercept", round(col("coef"), 2))
          .otherwise(round(col("coef"), 4)).as("coef"))
        .orderBy("term")
    },
    "model_io_kmeans" -> { (s, d) =>
      // save the literal centroid model → load → score: twin of
      // kmeans_assign with the broadcast literals coming off parquet
      val feats = Seq("l_quantity", "l_discount", "l_tax")
      val (lf, lc) = withTmpModel("kmeans") { path =>
        ModelIO.saveCentroids(s, feats, TabularQueries.Centroids, path)
        ModelIO.loadCentroids(s, path)
      }
      val cl = KMeansGraft.assign(lf.map(col), lc)
      Tables.lineitem(s, d)
        .select(cl.as("cluster"), col("l_quantity"), col("l_extendedprice"))
        .groupBy("cluster")
        .agg(count(lit(1)).cast("long").as("n"),
          r4(avg("l_quantity")).as("avg_quantity"),
          round(avg("l_extendedprice"), 2).as("avg_price"))
        .orderBy("cluster")
    },
    "model_io_softmax" -> { (s, d) =>
      // save the literal multinomial model → load → predict: twin of
      // softmax_predict through the parquet round-trip
      val (classes, icepts, weights) = withTmpModel("softmax") { path =>
        ModelIO.saveSoftmax(s, MLQueries.SoftmaxClasses, MLQueries.SoftmaxIntercepts,
          MLQueries.SoftmaxWeights, path)
        ModelIO.loadSoftmax(s, path)
      }
      val (pred, pMax) = Softmax.predict(
        Seq(col("l_quantity"), col("l_discount"), col("l_tax")),
        classes, icepts, weights)
      Tables.lineitem(s, d).select(pred.as("class"), pMax.as("p"))
        .groupBy("class")
        .agg(count(lit(1)).as("n"), r4(avg(col("p"))).as("avg_pmax"))
        .orderBy("class")
    })

  /** The loaded model must reproduce the direct model's hashes exactly —
    * same SQL as the direct-scoring twins. */
  val oracles: Map[String, String] = Map(
    "model_io_linreg" -> TabularQueries.oracles("linreg_ols"),
    "model_io_kmeans" -> TabularQueries.oracles("kmeans_assign"),
    "model_io_softmax" -> MLQueries.oracles("softmax_predict"))
}
