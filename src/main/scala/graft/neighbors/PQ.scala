package graft.neighbors

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
  * multiplies. Codebooks train on a bounded driver-side sample with a
  * deterministic local Lloyd (standard PQ practice — the sample, not the
  * corpus, bounds training); encoding is a broadcast-codebook map,
  * shuffle-free. */
object PQ {
  /** centers(m)(j) = the j-th centroid of subspace m (length dim/m each). */
  final case class Codebook(m: Int, k: Int, centers: Array[Array[Array[Double]]]) {
    def subDim: Int = centers(0)(0).length
  }

  /** Per-subspace k-means codebooks, trained on a BOUNDED driver-side
    * sample (standard PQ practice — FAISS trains its codebooks on ~10⁴-10⁵
    * sampled vectors regardless of corpus size): one collect of sampleN
    * rows, then M tiny local Lloyd runs (seeded k-means++ init, best-of-8
    * by SSE). Replaces M sequential MLlib jobs whose per-job overhead
    * dominated at small k·subdim — training cost is now independent of
    * the corpus SIZE up to the one full scan the md5-order sample
    * requires (a TakeOrdered pass; the Lloyd work itself is bounded);
    * only encode/score touch the corpus again (broadcast-codebook
    * maps). */
  def train(corpus: DataFrame, vecCol: String, m: Int, k: Int,
            seed: Long = 42L, sampleN: Int = 10000): Codebook =
    // md5-ordered sample + seeded Lloyd → deterministic → fit-once
    graft.core.FitCache.getOrFit(graft.core.FitCache.key(corpus,
      "pq", vecCol, m, k, seed, sampleN)) {
      trainUncached(corpus, vecCol, m, k, seed, sampleN)
    }

  private def trainUncached(corpus: DataFrame, vecCol: String, m: Int, k: Int,
                            seed: Long, sampleN: Int): Codebook = {
    val v = col(vecCol).cast("array<double>")
    // deterministic sample: md5-hash order (id-free, engine-stable)
    val sample = corpus.select(v.as("v"))
      .orderBy(md5(col("v").cast("string")))
      .limit(sampleN).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "PQ.train: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    // the M×8 Lloyd runs are independent and fully seeded, so they fan out
    // across driver cores as one flat task list (the driver is otherwise
    // idle here — no Spark job in flight); per-(s,r) seeds make results
    // ordering-independent and bit-identical to the sequential loop.
    // A DEDICATED pool (not ExecutionContext.global: blocking the caller
    // on the shared global pool risks starvation if train is ever invoked
    // from code already running on it) and a generous FINITE timeout, so
    // a wedged run fails loudly instead of hanging the driver forever.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val subPts = (0 until m).map { s =>
      sample.map(row => java.util.Arrays.copyOfRange(row, s * sub, (s + 1) * sub))
    }
    // best-of-8 restarts by SSE — recovers the quality of a k-means||
    // style init on the bounded sample
    val runs = for (s <- 0 until m; r <- 0 until 8) yield (s, r)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(runs.size, Runtime.getRuntime.availableProcessors())))
    val fitted =
      try {
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        Await.result(Future.traverse(runs.toList) { case (s, r) =>
          Future((s, lloyd(subPts(s), k, iters = 40, seed = seed + s + r * 1000L)))
        }, 10.minutes)
      } finally pool.shutdown()
    def sse(pts: Array[Array[Double]], cs: Array[Array[Double]]): Double =
      pts.map { p =>
        cs.map { c =>
          var d = 0.0; var i = 0
          while (i < p.length) { val t = p(i) - c(i); d += t * t; i += 1 }
          d
        }.min
      }.sum
    val centers = (0 until m).map { s =>
      fitted.collect { case (`s`, cs) => cs }.minBy(sse(subPts(s), _))
    }.toArray
    Codebook(m, k, centers)
  }

  /** Deterministic local Lloyd: k-means++ init with a fixed-seed RNG
    * (D²-weighted sampling — farthest-first chases outliers and costs
    * recall), then `iters` assignment/mean rounds; an emptied cluster
    * keeps its previous center. O(n·k·d·iters) on the bounded training
    * sample. */
  private def lloyd(points: Array[Array[Double]], k: Int, iters: Int,
                    seed: Long): Array[Array[Double]] = {
    val n = points.length
    val d = points.head.length
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val rng = new scala.util.Random(seed)
    val kk = math.min(k, n)
    val centers = Array.ofDim[Array[Double]](kk)
    centers(0) = points(rng.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < kk) {
      var total = 0.0
      var i = 0
      while (i < n) {
        val dd = sq(points(i), centers(c - 1))
        if (dd < minD(i)) minD(i) = dd
        total += minD(i)
        i += 1
      }
      // D²-weighted draw; total = 0 (all-duplicate sample) falls back to
      // an unweighted pick
      var pick = if (total > 0) rng.nextDouble() * total else -1.0
      var chosen = rng.nextInt(n)
      if (pick >= 0) {
        var j = 0
        var acc = 0.0
        while (j < n && pick >= 0) {
          acc += minD(j)
          if (acc >= pick) { chosen = j; pick = -1.0 }
          j += 1
        }
      }
      centers(c) = points(chosen).clone()
      c += 1
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](d))
      val counts = new Array[Long](kk)
      var i = 0
      while (i < n) {
        var bj = 0; var bd = Double.MaxValue
        var j = 0
        while (j < kk) {
          val dd = sq(points(i), centers(j))
          if (dd < bd) { bd = dd; bj = j }
          j += 1
        }
        counts(bj) += 1
        var x = 0
        while (x < d) { sums(bj)(x) += points(i)(x); x += 1 }
        i += 1
      }
      var j = 0
      while (j < kk) {
        if (counts(j) > 0) {
          var x = 0
          while (x < d) { centers(j)(x) = sums(j)(x) / counts(j); x += 1 }
        }
        j += 1
      }
      it += 1
    }
    // pad (k > n corner): repeat the last center so the codebook shape holds
    if (kk < k) centers ++ Array.fill(k - kk)(centers(kk - 1).clone()) else centers
  }

  /** Nearest-code vector for one input (shared with IVFPQ's residual
    * encoding). */
  private[neighbors] def encodeVec(cb: Codebook, v: Seq[Double]): Array[Int] = {
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

  /** The flattened M×K ADC table: lut[s*k + j] = ‖v_s − c_sj‖² (shared
    * with IVFPQ's per-probe residual tables). */
  private[neighbors] def adcVec(cb: Codebook, v: Seq[Double]): Array[Double] = {
    val sub = cb.subDim
    Array.tabulate(cb.m * cb.k) { x =>
      val s = x / cb.k; val j = x % cb.k
      val ctr = cb.centers(s)(j)
      var d = 0.0; var i = 0
      while (i < sub) { val t = v(s * sub + i) - ctr(i); d += t * t; i += 1 }
      d
    }
  }

  /** Nearest-centroid code per subspace (broadcast-codebook JVM closure —
    * same justification as IVF.cellUdf: an m·k·subdim unrolled expression
    * tree exceeds the codegen method limit). Emitted through
    * [[graft.core.Barrier.once]]: the M element_at reads of the ADC
    * table must not re-run the whole m·k·subdim table build M times per
    * candidate row — 8× the scan cost at kCodes=64 (measured
    * 23.6 s → 1.2 s at sf0.1). r16: the barrier is the STRUCTURAL
    * one-element Generate, not an asNondeterministic marker. */
  private def encodeUdf(cb: Codebook) =
    udf { (v: Seq[Double]) => encodeVec(cb, v) }

  /** The flattened M×K ADC table for a query. */
  private def lutUdf(cb: Codebook) =
    udf { (v: Seq[Double]) => adcVec(cb, v) }

  /** Corpus → (id, code) — the compressed index; persist this instead of
    * the raw vectors (32× smaller at m=8 over 64-dim float). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cb: Codebook): DataFrame =
    graft.core.Barrier.once(corpus, Seq(col(idCol).cast("long").as("id")),
      encodeUdf(cb)(col(vecCol).cast("array<double>")), "code")

  /** Top-k by asymmetric PQ distance: broadcast the (query, LUT) side,
    * score each code row with M element_at lookups (codegen), bounded-heap
    * rerank per query — the same no-window shape as the LSH/IVF paths. */
  def topK(codes: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           cb: Codebook, k: Int): DataFrame = {
    val q = graft.core.Barrier.once(queries,
      Seq(col(idCol).cast("long").as("qid")),
      lutUdf(cb)(col(vecCol).cast("array<double>")), "lut")
    val dist = (0 until cb.m).map(s =>
      element_at(col("lut"), element_at(col("code"), s + 1) + lit(s * cb.k) + 1))
      .reduce(_ + _)
    val pairs = codes.crossJoin(broadcast(q))
      .select(col("qid"), col("id"), dist.as("_s"))
    KNN.topKPerKey(pairs, k, KNN.nearFirst(KNN.Euclidean))
  }

  /** ADC shortlist + EXACT rerank (the PQ paper's IVFADC+R / FAISS
    * IndexRefine shape — the configuration production deployments run):
    * the corpus-scale pass stays the codegen'd M-lookup ADC scan over the
    * compressed codes, its top-`shortlist` per query (bounded-heap, no
    * window) joins back to the raw vectors — a hash equi-join on id whose
    * left side is the BOUNDED q·shortlist candidate set, so at 100 TB the
    * fetch touches shortlist rows per query, never the corpus — and the
    * final top-k is exact L2 over the shortlist. Recall becomes the
    * shortlist's recall@C, which climbs fast with C while the scan cost
    * stays the compressed one. */
  def topKRefined(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String, cb: Codebook, k: Int,
                  shortlist: Int): DataFrame = {
    val cand = topK(codes, queries, idCol, vecCol, cb, shortlist)
      .select(col("qid"), col("id"))
    val cv = corpus.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("_cv"))
    val qv = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).cast("array<double>").as("_qv"))
    val dim = graft.core.VectorOps.dimOf(cv, col("_cv"))
    val exactD = graft.core.VectorOps.sqDistFixed(col("_qv"), col("_cv"), dim)
    val pairs = cand.join(cv, "id").join(broadcast(qv), "qid")
      .select(col("qid"), col("id"), exactD.as("_s"))
    KNN.topKPerKey(pairs, k, KNN.nearFirst(KNN.Euclidean))
  }

  /** Recall@k vs exact L2 brute force + the compression ratio — the query
    * surface (PQ is approximate by construction; recall against the exact
    * scan is its figure of merit, as in the PQ paper's Table 2).
    * `shortlist` > k enables the refine stage ([[topKRefined]]). */
  def recallSummary(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, m: Int, kCodes: Int, k: Int,
                    shortlist: Int = 0): DataFrame = {
    val cb = train(corpus, vecCol, m, kCodes)
    val codes = encode(corpus, idCol, vecCol, cb)
    val approx = (if (shortlist > k)
        topKRefined(codes, corpus, queries, idCol, vecCol, cb, k, shortlist)
      else topK(codes, queries, idCol, vecCol, cb, k))
      .select(col("qid"), col("id"))
    val exact = KNN.bruteForceCached(queries, corpus, idCol, idCol, vecCol, vecCol,
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
