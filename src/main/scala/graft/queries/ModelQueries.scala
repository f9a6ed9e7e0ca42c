package graft.queries

import graft.cluster.KMeansGraft
import graft.core.Num.r4
import graft.core.Tables
import graft.io.ModelIO
import graft.linear.{OLS, Softmax}
import graft.preprocessing.Preprocessing
import graft.svm.SVMGraft
import graft.tsa.TimeSeries
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
    finally deleteRecursively(dir)
  }

  /** walk() returns a Stream holding a directory handle — close it before
    * deleting (Bench re-invokes these queries every round; an unclosed
    * stream per invocation would accumulate handles over a run). */
  private[graft] def deleteRecursively(dir: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } finally walk.close()
  }

  /** FIXED tmp path (per model tag), overwritten on every invocation:
    * per-series models and the registry stay LAZY scans over their
    * parquet — deleting the dir in a finally (the withTmpModel pattern)
    * would pull the files out from under the unexecuted plan. Overwrite
    * semantics keep /tmp bounded at one copy per tag across Bench's
    * re-invocations. */
  private def fixedModelDir(tag: String): String = {
    val p = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_models", tag)
    java.nio.file.Files.createDirectories(p.getParent)
    p.toString
  }

  /** The svm_predict literal model as a saveParams bag (intercept first,
    * then one named weight per feature in feature order). */
  private val SvmParamBag: Seq[(String, Double)] =
    ("intercept" -> MLQueries.SvmIntercept) +:
      MLQueries.LiFeatures.zip(MLQueries.SvmWeights)
        .map { case (f, w) => s"w_$f" -> w }

  private val KmFeatures = Seq("l_quantity", "l_discount", "l_tax")

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
    },
    "model_io_hw_forecast" -> { (s, d) =>
      // per-series (DataFrame-valued) persistence: fit the HW grid winner
      // per series → save the UNROUNDED state frame as parquet keyed on
      // series → load (one scan, no driver round-trip) → forecast through
      // the loaded frame. Twin of hw_fit_forecast: identical arithmetic
      // (l + k·b + season), so the hash gate proves the per-series
      // round-trip is parameter-exact.
      val state = TimeSeries.hwFitStateRaw(
        TimeSeries.dailySeries(Tables.events(s, d)), 7,
        TSAQueries.HwAlphas, TSAQueries.HwBetas, TSAQueries.HwGammas)
      val path = fixedModelDir("hw_add_state")
      ModelIO.saveSeriesModel(state, "hw_additive", path)
      TimeSeries.hwForecastFromState(
          ModelIO.loadSeriesModel(s, path, "hw_additive"), 7, h = 5)
        .orderBy("series", "step")
    },
    "model_io_ar_forecast" -> { (s, d) =>
      // second per-series family: grouped AR(3) (d=1) coefficients fit →
      // save long-format → load → unroll the forecast recursion through
      // the loaded frame. Twin of ar_p_forecast.
      val daily = TimeSeries.dailySeries(Tables.events(s, d))
      val coefs = TimeSeries.arCoefsLong(daily, p = 3, d = 1)
      val path = fixedModelDir("ar3_d1")
      ModelIO.saveSeriesModel(coefs, "ar3_d1", path)
      TimeSeries.arForecastPServe(daily,
          ModelIO.loadSeriesModel(s, path, "ar3_d1"), p = 3, h = 5, d = 1)
        .orderBy("series", "step")
    },
    "model_io_arima_forecast" -> { (s, d) =>
      // third per-series family: the ARIMA(1,1,1) ML-lattice winner's
      // forecast state (phi, pred, mu) persists; the serve path joins the
      // loaded state with the data's last observation and unrolls the
      // same recursion. Twin of arima_ml_forecast.
      val daily = TimeSeries.dailySeries(Tables.events(s, d))
      val state = TimeSeries.arimaMLStateLong(daily)
      val path = fixedModelDir("arima_ml")
      ModelIO.saveSeriesModel(state, "arima_ml_111", path)
      TimeSeries.arimaMLForecastServe(daily,
          ModelIO.loadSeriesModel(s, path, "arima_ml_111"), h = 5)
        .orderBy("series", "step")
    },
    "model_io_svm" -> { (s, d) =>
      // the saveParams codec exercised end-to-end: persist the literal
      // linear-SVC (b, w) as a named scalar bag → load → margin-score the
      // held-out split through the loaded values. Twin of svm_predict.
      val loaded = withTmpModel("svm") { path =>
        ModelIO.saveParams(s, "svm_linear", SvmParamBag, path)
        ModelIO.loadParams(s, path, "svm_linear").toMap
      }
      val held = Preprocessing.trainTestSplit(Tables.lineitem(s, d), "l_orderkey", 0.25)
        .filter(col("split") === "test")
      SVMGraft.predictSummary(held, MLQueries.LiFeatures, loaded("intercept"),
        MLQueries.LiFeatures.map(f => loaded(s"w_$f")),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    },
    "model_registry" -> { (s, d) =>
      // a DIRECTORY of saved models served as one SQL-queryable table
      // (ModelIO.loadDF over a glob): four codecs write side by side,
      // one scan summarizes per model_type. The oracle is computed from
      // the same literal models at registration time, so the hash gate
      // proves write → multi-model scan → aggregate is value-exact.
      val base = fixedModelDir("registry")
      ModelIO.saveCentroids(s, KmFeatures, TabularQueries.Centroids, s"$base/kmeans")
      ModelIO.saveSoftmax(s, MLQueries.SoftmaxClasses, MLQueries.SoftmaxIntercepts,
        MLQueries.SoftmaxWeights, s"$base/softmax")
      ModelIO.saveParams(s, "svm_linear", SvmParamBag, s"$base/svm_linear")
      ModelIO.saveTree(s, MLQueries.FilTree, s"$base/fil")
      ModelIO.loadDF(s, s"$base/*")
        .groupBy("model_type")
        .agg(count(lit(1)).cast("long").as("n_params"),
          round(sum(col("value")), 4).as("value_sum"))
        .orderBy("model_type")
    },
    "streaming_model_score" -> { (s, d) =>
      // third oracle-visible streaming query, closing the ModelIO ×
      // streaming intersection: a PERSISTED linear model (literal,
      // engine-neutral coefficients — the round-trip itself is under
      // test, parameter fitting is the linreg family's job) is saved,
      // loaded at stream definition, and served over the REAL events
      // stream (stateless per-micro-batch projection, Trigger
      // .AvailableNow, memory sink); the final per-event-type score
      // aggregate hash-gates against the SQL replay of the same literal
      // formula — a save/load drift of any coefficient bit shifts the
      // maxima and breaks the hash
      withTmpModel("stream_score") { path =>
        ModelIO.saveLinear(s,
          graft.linear.LinearModel(Seq("intercept", "value"), Seq(1.25, 0.5)), path)
        val sink = "graft_stream_score"
        val q = graft.streaming.StreamingOps
          .streamingModelScore(Tables.eventsStream(s, d), path, Seq("value"))
        graft.streaming.StreamingOps.runToMemory(s, q, sink, "append")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"),
            r4(avg(col("prediction"))).as("avg_score"),
            r4(min(col("prediction"))).as("min_score"),
            r4(max(col("prediction"))).as("max_score"))
          .orderBy("event_type")
      }
    },
    "streaming_series_score" -> { (s, d) =>
      // the LAST spec-only streaming twin made oracle-visible: a
      // PER-SERIES model (saveSeriesModel long format — engine-neutral
      // doubles, level from the r4'd batch mean, literal trend/season:
      // the persistence round-trip and stream-static serve are under
      // test, parameter fitting is the hw family's job) persists, loads
      // at stream definition, and serves the REAL events stream through
      // streamingSeriesScore's stateless stream-static join
      // (Trigger.AvailableNow, memory sink); the per-series residual
      // summary hash-gates against the SQL replay of the same literals
      withTmpModel("stream_series") { path =>
        val lv = Tables.events(s, d).groupBy(col("event_type").as("series"))
          .agg(r4(avg(col("value"))).as("_lv"))
        val modelRows = lv.select(col("series"), lit("level").as("key"),
            col("_lv").as("value"))
          .unionAll(lv.select(col("series"), lit("trend").as("key"),
            lit(0.01).as("value")))
          .unionAll(lv.select(col("series"), lit("season_0").as("key"),
            lit(0.02).as("value")))
        ModelIO.saveSeriesModel(modelRows, "hw_additive", path)
        val sink = "graft_stream_series_score"
        val q = graft.streaming.StreamingOps.streamingSeriesScore(
            Tables.eventsStream(s, d).select(col("event_type").as("series"),
              col("value").as("x")),
            path, "hw_additive")
        graft.streaming.StreamingOps.runToMemory(s, q, sink, "append").groupBy(col("series"))
          .agg(count(lit(1)).cast("long").as("n"),
            r4(avg(col("residual"))).as("avg_resid"),
            r4(min(col("residual"))).as("min_resid"),
            r4(max(col("residual"))).as("max_resid"),
            r4(max(col("forecast1"))).as("forecast1"))
          .orderBy("series")
      }
    },
    "streaming_dedup_index" -> { (s, d) =>
      // the persisted-index ingest dedup oracle-visible END-TO-END:
      // the already-ingested front half reduces to one row per content
      // hash and persists (data-scale index, parquet write — the saveALS
      // discipline); the back half STREAMS through the stateless
      // stream-static anti-join (streamingDedupVsIndex, index version
      // pinned at stream definition) and every surviving unseen doc
      // hash-gates against the split + anti-join SQL replay
      withTmpModel("dedup_hash_index") { path =>
        val docs = Tables.documents(s, d)
        val norm = md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
        docs.filter(col("doc_id") < 250)
          .select(norm.as("content_hash")).distinct()
          .write.mode("overwrite").parquet(path)
        val idx = s.read.parquet(path)
        val sink = "graft_stream_dedup_idx"
        val q = graft.streaming.StreamingOps
          .streamingDedupVsIndex(
            Tables.documentsStream(s, d).filter(col("doc_id") >= 250), idx)
        graft.streaming.StreamingOps.runToMemory(s, q, sink, "append")
          .select(col("doc_id"), col("content_hash"))
          .orderBy("doc_id")
      }
    },
    "model_io_als" -> { (s, d) =>
      // ALS serve path: fit (FitCache-shared with als_recommend) →
      // persist BOTH factor matrices in long form (data-scale: one row
      // per id per latent dim — saveALS is a parquet write, loadALS a
      // lazy scan; factors never pass through the driver) → top-k
      // recommendations THROUGH THE LOADED FRAMES for 5 deterministic
      // probe users. PARTIAL HASH GATE: probe/rec counts SQL-exact;
      // recommended items must come from the training item set; and the
      // loaded-serve dot products must match the in-memory model's
      // transform on the same pairs to float tolerance — the round-trip
      // parity proof.
      val ratings = MLQueries.alsRatings(s, d)
      val model = MLQueries.alsModel(ratings)
      val path = fixedModelDir("als_factors")
      ModelIO.saveALS(model.userFactors, model.itemFactors, path)
      val (uf, itf) = ModelIO.loadALS(s, path)
      val probes = ratings.select(col("user")).distinct().orderBy("user").limit(5)
      // probe-side factors are BOUNDED (5 users × rank rows) → broadcast;
      // the item side streams, score sums are map-side-combined
      val pu = uf.join(probes, uf("id") === probes("user"))
        .select(col("user"), col("f"), col("value").as("_uv"))
      val scores = broadcast(pu)
        .join(itf.select(col("id").as("item"), col("f"), col("value").as("_iv")), "f")
        .groupBy("user", "item").agg(sum(col("_uv") * col("_iv")).as("score"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user"))
        .orderBy(round(col("score"), 4).desc, col("item"))
      val topk = scores.withColumn("_rk", row_number().over(w)).filter(col("_rk") <= 3)
        .select(col("user"), col("item"), col("score"))
      val served = model.transform(topk)
      val itemSet = ratings.select(col("item")).distinct().withColumn("_in", lit(1))
      served.join(broadcast(itemSet), Seq("item"), "left")
        .agg(countDistinct(col("user")).cast("long").as("n_users"),
          count(lit(1)).cast("long").as("n_recs"),
          (sum(when(col("_in").isNull, 1).otherwise(0)) === 0).as("recs_in_item_set"),
          (max(abs(col("score") - col("prediction"))) < 1e-3).as("serve_matches_model"))
    },
    "model_io_ann" -> { (s, d) =>
      // the ANN family's persistence serve path: train the IVF coarse
      // quantizer, persist it (saveIVF — the quantizer is driver-scale;
      // the corpus side of a production index is the bucketed table
      // layout, cf IVF.writeBucketed), load it back, and serve top-k
      // THROUGH THE LOADED index. Gate: query/result counts SQL-exact;
      // the loaded index must reproduce the in-memory index's result set
      // EXACTLY (centers round-trip bit-exact ⇒ identical cells ⇒
      // identical candidates ⇒ identical top-k), and recall vs brute
      // force clears the tightened ann_ivf floor.
      import graft.neighbors.{IVF, KNN}
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 20)
      val idx = IVF.train(e, "embedding", nCells = 16)
      val path = fixedModelDir("ivf_index")
      ModelIO.saveIVF(s, idx, path)
      val loaded = ModelIO.loadIVF(s, path)
      val served = IVF.topK(e, q, "vec_id", "embedding", loaded, k = 5, nprobe = 4)
        .select(col("qid"), col("id")).cache()
      // bit-exact center round-trip is checked directly on the loaded
      // quantizer (doubles survive parquet bit-exactly): identical
      // centers ⇒ identical cell assignment ⇒ identical candidate sets
      // ⇒ identical top-k, so no second corpus-scale topK pass is needed
      // to establish loaded==memory (it was the sf1 serve-cost hotspot).
      val mismatches =
        if (loaded.centers.length != idx.centers.length) 1L
        else loaded.centers.zip(idx.centers).map { case (a, b) =>
          if (a.length != b.length) 1L
          else a.zip(b).count { case (x, y) =>
            java.lang.Double.doubleToLongBits(x) !=
              java.lang.Double.doubleToLongBits(y) }.toLong
        }.sum
      val exact = KNN.bruteForceCached(q, e, "vec_id", "vec_id", "embedding",
        "embedding", 5, KNN.Cosine).select(col("qid"), col("id")).cache()
      val hits = exact.join(served, Seq("qid", "id")).count()
      val recall = hits.toDouble / math.max(1L, exact.count())
      val out = served.agg(
        countDistinct(col("qid")).cast("long").as("n_queries"),
        count(lit(1)).cast("long").as("n_results"),
        lit(mismatches == 0L).as("loaded_matches_memory"),
        lit(recall >= 0.6).as("recall_floor"))
      out.cache().count()
      served.unpersist(); exact.unpersist()
      out
    },
    "model_io_pq" -> { (s, d) =>
      // the COMPRESSED index's persistence serve path (model_io_ann's PQ
      // twin): train the m=8/k=64 codebooks, persist them (savePQ — the
      // codebook is driver-scale; the corpus side of a production index
      // is the (id, code) table), load back, and serve the refined top-k
      // THROUGH THE LOADED codebook. Centers round-trip parquet
      // bit-exact ⇒ identical codes, ADC tables, and top-k, so one
      // driver-side bit comparison replaces a second corpus serve;
      // recall gates at the ann_pq refined floor.
      import graft.neighbors.{KNN, PQ}
      val e = Tables.embeddings(s, d)
      val q = e.filter(col("vec_id") < 20)
      val cb = PQ.train(e, "embedding", m = 8, k = 64)
      val path = fixedModelDir("pq_codebook")
      ModelIO.savePQ(s, cb, path)
      val loaded = ModelIO.loadPQ(s, path)
      val mismatches =
        if (loaded.m != cb.m || loaded.k != cb.k) 1L
        else (for {
          sp <- 0 until cb.m; cw <- 0 until cb.k
        } yield loaded.centers(sp)(cw).zip(cb.centers(sp)(cw)).count {
          case (x, y) => java.lang.Double.doubleToLongBits(x) !=
            java.lang.Double.doubleToLongBits(y) }.toLong).sum
      val codes = PQ.encode(e, "vec_id", "embedding", loaded)
      val served = PQ.topKRefined(codes, e, q, "vec_id", "embedding", loaded,
        k = 5, shortlist = 50).select(col("qid"), col("id")).cache()
      val exact = KNN.bruteForceCached(q, e, "vec_id", "vec_id", "embedding",
        "embedding", 5, KNN.Euclidean).select(col("qid"), col("id")).cache()
      val hits = exact.join(served, Seq("qid", "id")).count()
      val recall = hits.toDouble / math.max(1L, exact.count())
      val out = served.agg(
        countDistinct(col("qid")).cast("long").as("n_queries"),
        count(lit(1)).cast("long").as("n_results"),
        lit(mismatches == 0L).as("loaded_matches_memory"),
        lit(recall >= 0.6).as("recall_floor"))
      out.cache().count()
      served.unpersist(); exact.unpersist()
      out
    },
    "model_io_dedup" -> { (s, d) =>
      // persisted MinHash LSH index serve: build the band-bucket index of
      // the already-ingested front half, save it repartitioned on the
      // probe key (the IVF.writeBucketed discipline), then run the back
      // half's incremental near-dup check entirely THROUGH THE LOADED
      // index — the dedup family's serving surface, twinned with
      // dedup_incremental's shard split. The loaded index stays a lazy
      // scan: the serve join shuffles only the shard side.
      val docs = Tables.documents(s, d)
      val prior = docs.filter(col("doc_id") < 250)
      val shard = docs.filter(col("doc_id") >= 250)
      val path = fixedModelDir("dedup_lsh")
      ModelIO.saveDedupIndex(
        graft.dedup.Dedup.bandRows(prior, "text", "doc_id")
          .select("band", "bkey").distinct(), path)
      val idx = ModelIO.loadDedupIndex(s, path)
      val hits = graft.dedup.Dedup.bandRows(shard, "text", "doc_id")
        .join(idx, Seq("band", "bkey"), "left_semi")
        .select(col("doc")).distinct()
      shard.select(col("doc_id").cast("long").as("doc"), col("lang"))
        .join(hits.withColumn("_hit", lit(1)), Seq("doc"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_new"),
          sum(when(col("_hit").isNotNull, 1L).otherwise(0L)).cast("long")
            .as("n_dup_vs_index"))
        .orderBy("lang")
    })

  /** The registry summary, recomputed from the same literal models the
    * query saves: a VALUES oracle (model_type, n_params, value_sum). The
    * double sum mirrors Spark's exactly — same row order (one coalesced
    * file per model preserves codec row order, nulls skipped), same
    * left-associated IEEE adds, and BigDecimal.valueOf is the HALF_UP
    * path Spark's round(col, 4) takes on doubles. */
  private def registryOracleSql: String = {
    val models = Seq(
      ModelIO.centroidRows(KmFeatures, TabularQueries.Centroids),
      ModelIO.softmaxRows(MLQueries.SoftmaxClasses, MLQueries.SoftmaxIntercepts,
        MLQueries.SoftmaxWeights),
      ModelIO.paramRows("svm_linear", SvmParamBag),
      ModelIO.treeRows(MLQueries.FilTree))
    val rows = models.map { rs =>
      val sum = java.math.BigDecimal.valueOf(rs.flatMap(_.value).sum)
        .setScale(4, java.math.RoundingMode.HALF_UP)
      s"('${rs.head.model_type}', ${rs.size}::BIGINT, ${sum.toPlainString}::DOUBLE)"
    }
    s"""SELECT model_type, n_params, value_sum
       |FROM (VALUES ${rows.mkString(", ")}) AS t(model_type, n_params, value_sum)
       |ORDER BY model_type""".stripMargin
  }

  /** The loaded model must reproduce the direct model's hashes exactly —
    * same SQL as the direct-scoring twins. */
  val oracles: Map[String, String] = Map(
    "model_io_linreg" -> TabularQueries.oracles("linreg_ols"),
    "model_io_kmeans" -> TabularQueries.oracles("kmeans_assign"),
    "model_io_softmax" -> MLQueries.oracles("softmax_predict"),
    "model_io_hw_forecast" -> TSAQueries.oracles("hw_fit_forecast"),
    "model_io_ar_forecast" -> TSAQueries.oracles("ar_p_forecast"),
    "model_io_arima_forecast" -> TSAQueries.oracles("arima_ml_forecast"),
    "model_io_svm" -> MLQueries.oracles("svm_predict"),
    "model_registry" -> registryOracleSql,
    // full hash gate: the streamed serve of the persisted literal model
    // must reproduce the batch SQL scoring of the same formula exactly
    "streaming_model_score" ->
      """SELECT event_type,
        |  count(*)::BIGINT AS n,
        |  round(avg(1.25 + 0.5 * value), 4) AS avg_score,
        |  round(min(1.25 + 0.5 * value), 4) AS min_score,
        |  round(max(1.25 + 0.5 * value), 4) AS max_score
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "streaming_series_score" ->
      """WITH lv AS (SELECT event_type AS series, round(avg(value), 4) AS level
        |  FROM events GROUP BY 1),
        |r AS (SELECT e.event_type AS series,
        |    round(l.level + 0.01 + 0.02, 4) AS forecast1,
        |    round(e.value - (l.level + 0.01 + 0.02), 4) AS residual
        |  FROM events e JOIN lv l ON e.event_type = l.series)
        |SELECT series, count(*)::BIGINT AS n, round(avg(residual), 4) AS avg_resid,
        |  round(min(residual), 4) AS min_resid, round(max(residual), 4) AS max_resid,
        |  round(max(forecast1), 4) AS forecast1
        |FROM r GROUP BY series ORDER BY series""".stripMargin,
    // the streamed anti-join serve replayed as the split + NOT EXISTS
    "streaming_dedup_index" ->
      """WITH h AS (SELECT doc_id::BIGINT AS doc_id,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_hash
        |  FROM documents)
        |SELECT doc_id, content_hash FROM h b
        |WHERE doc_id >= 250 AND NOT EXISTS (
        |  SELECT 1 FROM h a WHERE a.doc_id < 250 AND a.content_hash = b.content_hash)
        |ORDER BY doc_id""".stripMargin,
    // partial gate: probe/rec counts SQL-exact, factor round-trip parity
    // and item-set membership as invariants (factors are seed-dependent)
    "model_io_als" ->
      """WITH u AS (SELECT DISTINCT o_custkey::INT AS u
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |u5 AS (SELECT u FROM u ORDER BY u LIMIT 5)
        |SELECT (SELECT count(*) FROM u5)::BIGINT AS n_users,
        |  ((SELECT count(*) FROM u5) * 3)::BIGINT AS n_recs,
        |  TRUE AS recs_in_item_set, TRUE AS serve_matches_model""".stripMargin,
    // quantizer round-trip gate: counts SQL-exact, loaded-vs-memory
    // result parity and the recall floor as invariants
    "model_io_ann" ->
      """SELECT (SELECT count(*) FROM embeddings WHERE vec_id < 20)::BIGINT AS n_queries,
        |  ((SELECT count(*) FROM embeddings WHERE vec_id < 20) * 5)::BIGINT AS n_results,
        |  TRUE AS loaded_matches_memory, TRUE AS recall_floor""".stripMargin,
    "model_io_pq" ->
      """SELECT (SELECT count(*) FROM embeddings WHERE vec_id < 20)::BIGINT AS n_queries,
        |  ((SELECT count(*) FROM embeddings WHERE vec_id < 20) * 5)::BIGINT AS n_results,
        |  TRUE AS loaded_matches_memory, TRUE AS recall_floor""".stripMargin,
    // the persisted-index serve replayed from scratch: same band CTEs as
    // the minhash pair oracles, index = the front half's distinct buckets
    "model_io_dedup" ->
      s"""WITH ${TextQueries.minhashBandCtes},
         |idx AS (SELECT DISTINCT band, bkey FROM bands WHERE doc_id < 250),
         |hits AS (SELECT DISTINCT b.doc_id FROM bands b JOIN idx USING (band, bkey)
         |  WHERE b.doc_id >= 250),
         |shard AS (SELECT doc_id, lang FROM documents WHERE doc_id >= 250)
         |SELECT d2.lang AS lang, count(*)::BIGINT AS n_new,
         |  sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dup_vs_index
         |FROM shard d2 LEFT JOIN hits h ON d2.doc_id = h.doc_id
         |GROUP BY 1 ORDER BY lang""".stripMargin)
}
