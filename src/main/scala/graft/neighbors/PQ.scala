package graft.neighbors

import org.apache.spark.ml.clustering.{KMeans => MLKMeans}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze & Schmid, "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011 — the compression layer
  * corpus-scale ANN systems put under their inverted files; the reference's
  * neighbors surface is brute force, `cpp/src/knn/knn.cu`, and this is the
  * declared scale path beyond it alongside IVF).
  *
  * D dims split into M subspaces; a K-centroid codebook per subspace turns
  * each vector into M small codes — 64-dim float32 → 8 codes ≈ 32×
  * compression, the difference between a spilling scan and a RAM-resident
  * one at corpus scale. A query builds one M×K table of subspace distances
  * (asymmetric distance computation), so scoring a candidate is M array
  * lookups + adds: pure codegen over the code column, no per-pair
  * multiplies. Codebooks train on a sample via MLlib k-means (standard PQ
  * practice); encoding is a broadcast-codebook map, shuffle-free. */
object PQ {
  /** centers(m)(j) = the j-th centroid of subspace m (length dim/m each). */
  final case class Codebook(m: Int, k: Int, centers: Array[Array[Array[Double]]]) {
    def subDim: Int = centers(0)(0).length
  }

  /** Per-subspace k-means over the sliced corpus (M small fits — each on
    * n × dim/M values; train on a sample at scale, as FAISS does). */
  def train(corpus: DataFrame, vecCol: String, m: Int, k: Int,
            seed: Long = 42L): Codebook = {
    val v = col(vecCol).cast("array<double>")
    val dim = corpus.select(size(v)).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val centers = (0 until m).map { s =>
      val input = corpus.select(
        array_to_vector(slice(v, s * sub + 1, sub)).as("_fv"))
      new MLKMeans().setK(k).setSeed(seed + s).setMaxIter(15)
        .setFeaturesCol("_fv").fit(input)
        .clusterCenters.map(_.toArray)
    }.toArray
    Codebook(m, k, centers)
  }

  /** Nearest-centroid code per subspace (broadcast-codebook JVM closure —
    * same justification as IVF.cellUdf: an m·k·subdim unrolled expression
    * tree exceeds the codegen method limit). */
  private def encodeUdf(cb: Codebook) = udf { (v: Seq[Double]) =>
    val sub = cb.subDim
    Array.tabulate(cb.m) { s =>
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < cb.k) {
        val ctr = cb.centers(s)(j)
        var d = 0.0; var i = 0
        while (i < sub) { val t = v(s * sub + i) - ctr(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      best
    }
  }

  /** The flattened M×K ADC table for a query: lut[s*k + j] = ‖q_s − c_sj‖². */
  private def lutUdf(cb: Codebook) = udf { (v: Seq[Double]) =>
    val sub = cb.subDim
    Array.tabulate(cb.m * cb.k) { x =>
      val s = x / cb.k; val j = x % cb.k
      val ctr = cb.centers(s)(j)
      var d = 0.0; var i = 0
      while (i < sub) { val t = v(s * sub + i) - ctr(i); d += t * t; i += 1 }
      d
    }
  }

  /** Corpus → (id, code) — the compressed index; persist this instead of
    * the raw vectors (32× smaller at m=8 over 64-dim float). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame =
    corpus.select(col(idCol).cast("long").as("id"),
      encodeUdf(cb)(col(vecCol).cast("array<double>")).as("code"))

  /** Top-k by asymmetric PQ distance: broadcast the (query, LUT) side,
    * score each code row with M element_at lookups (codegen), bounded-heap
    * rerank per query — the same no-window shape as the LSH/IVF paths. */
  def topK(codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           cb: Codebook, k: Int): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("qid"),
      lutUdf(cb)(col(vecCol).cast("array<double>")).as("lut"))
    val dist = (0 until cb.m).map(s =>
      element_at(col("lut"), element_at(col("code"), s + 1) + lit(s * cb.k) + 1))
      .reduce(_ + _)
    val pairs = codes.crossJoin(broadcast(q))
      .select(col("qid"), col("id"), dist.as("_s"))
    KNN.topKPerKey(pairs, k, KNN.nearFirst(KNN.Euclidean))
  }

  /** Recall@k vs exact L2 brute force + the compression ratio — the query
    * surface (PQ is approximate by construction; recall against the exact
    * scan is its figure of merit, as in the PQ paper's Table 2). */
  def recallSummary(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, m: Int, kCodes: Int, k: Int): DataFrame = {
    val cb = train(corpus, vecCol, m, kCodes)
    val codes = encode(corpus, idCol, vecCol, cb)
    val approx = topK(codes, queries, idCol, vecCol, cb, k)
      .select(col("qid"), col("id"))
    val exact = KNN.bruteForce(queries, corpus, idCol, idCol, vecCol, vecCol,
      k, KNN.Euclidean).select(col("qid"), col("id"))
    val dim = corpus.select(size(col(vecCol).cast("array<double>"))).head().getInt(0)
    val hits = exact.join(approx, Seq("qid", "id")).groupBy("qid")
      .agg(count(lit(1)).cast("double").as("hits"))
    exact.groupBy("qid").agg(count(lit(1)).cast("double").as("total"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), (coalesce(col("hits"), lit(0.0)) / col("total")).as("recall"))
      .agg(count(lit(1)).cast("long").as("n_queries"),
        round(avg(col("recall")), 4).as("avg_recall"),
        lit(dim * 4L / m.toLong).cast("long").as("compression_x"))
  }
}
