package graft.text

import graft.core.Num.r6
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus relevance statistics: TF-IDF term weighting and BM25 retrieval
  * scoring (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework: BM25 and Beyond") — the ranking layer a training-data
  * pipeline uses for query-targeted corpus selection and per-document
  * keyword profiling.
  *
  * Scale posture: everything is (doc, term) aggregates — two
  * map-side-combined groupBys (term frequency, document frequency) joined
  * on the term key, corpus-size scalars broadcast. No windows over the
  * corpus: per-doc top-k uses an in-aggregate array sort over the doc's
  * own bounded term set.
  */
object Relevance {
  private def normToks(textCol: String) =
    split(lower(trim(regexp_replace(col(textCol), "\\s+", " "))), " ")

  /** Corpus-level token heavy hitters — the boilerplate/stopword monitor
    * of an ingest pipeline. Exact variant: one map-side-combined token
    * groupBy + a TakeOrdered top-N (never a global sort); rank ties break
    * on the token so the DuckDB replay is deterministic. Output:
    * (rank, term, n, share) with share = n / total tokens (broadcast
    * scalar). The approximate production path is [[frequentTokens]]. */
  def heavyHitterTokens(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(explode(normToks(textCol)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_tot"))
    val w = Window.orderBy(col("n").desc, col("term"))
    counts.orderBy(col("n").desc, col("term")).limit(topN)
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(total))
      .select(col("rank").cast("long").as("rank"), col("term"),
        col("n").cast("long").as("n"),
        round(col("n") / col("_tot"), 6).as("share"))
      .orderBy("rank")
  }

  /** Misra-Gries frequent tokens (`DataFrame.stat.freqItems`) — the
    * one-pass sketch path: per-partition summaries of 1/support counters,
    * merged associatively; guaranteed to CONTAIN every token with
    * frequency > support·total (may include false positives, no false
    * negatives — the standard heavy-hitter contract). Sketch internals
    * are engine-specific → rows-only gate + guarantee spec. */
  def frequentTokens(df: DataFrame, textCol: String, support: Double): DataFrame = {
    val toks = df.select(explode(normToks(textCol)).as("term"))
    val items = toks.stat.freqItems(Seq("term"), support)
      .select(explode(col("term_freqItems")).as("term"))
    // report exact counts for the surviving candidates (bounded set join)
    toks.join(broadcast(items), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("term"))
  }

  /** Sketch-pruned, exactly-verified heavy hitters: candidates from the
    * one-pass freqItems sketch (every term with frequency > support
    * survives — the Karp/Misra-Gries guarantee), exact counts on the
    * bounded candidate set, then the support cut applied to the EXACT
    * counts. The output is the true heavy-hitter set, deterministic even
    * though the sketch's extra candidates depend on partition order —
    * which is what makes the production sketch path hash-gateable. */
  def verifiedHeavyHitters(df: DataFrame, textCol: String,
                           support: Double): DataFrame = {
    val counts = frequentTokens(df, textCol, support)
    val tot = df.select(explode(normToks(textCol)).as("term"))
      .agg(count(lit(1)).cast("double").as("_tt"))
    counts.crossJoin(broadcast(tot))
      .filter(col("n") > lit(support) * col("_tt"))
      .select(col("term"), col("n"))
      .orderBy(col("n").desc, col("term"))
  }

  /** (doc, term) rows with per-doc term counts — ONE explode + groupBy. */
  private def termCounts(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc"), explode(normToks(textCol)).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))

  /** Per-document top-N terms by TF-IDF (tf · ln(N/df)), ties broken by
    * term. The rerank happens inside the per-doc aggregate (array_sort on
    * the doc's own terms — bounded by doc length), not a corpus window. */
  def tfIdfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    topN: Int): DataFrame = {
    val tf = termCounts(df, textCol, idCol)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc"), col("term"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double"))).as("score"))
    // struct(-score, term): array_sort ascending == score descending, term asc
    scored.groupBy(col("doc"))
      .agg(slice(array_sort(collect_list(struct((-col("score")).as("ns"),
        col("term"), col("score")))), 1, topN).as("top"))
      .select(col("doc"), posexplode(col("top")))
      .select(col("doc"), (col("pos") + 1).cast("long").as("rank"),
        col("col.term").as("term"), r6(col("col.score")).as("score"))
  }

  /** Top-N most-similar document pairs by TF-IDF cosine over a PRUNED
    * inverted index — the sparse-vector similarity search every IR /
    * near-dup pipeline ships: terms with df > maxDfFrac·N are dropped
    * BEFORE the posting self-join (the standard stopword-pruning trick
    * that bounds the pair fan-out at Σ df² over rare terms, never
    * corpus²); weights, norms, and the cosine are all computed over the
    * pruned vocabulary consistently, so the DuckDB oracle replays the
    * ranking exactly (rounded-cosine ordering, (d1, d2) tie-break). */
  def tfidfCosinePairs(df: DataFrame, textCol: String, idCol: String,
                       topN: Int, maxDfFrac: Double = 0.5): DataFrame = {
    val tf = df.select(col(idCol).cast("long").as("doc"),
        explode(normToks(textCol)).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("doc", "term").agg(count(lit(1)).cast("double").as("tf"))
    val nDocs = df.agg(count(lit(1)).cast("double").as("nd"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("nd") * maxDfFrac)
    val w = tf.join(dfreq, "term")
      .select(col("doc"), col("term"), (col("tf") * log(col("nd") / col("df"))).as("w"))
    val norms = w.groupBy("doc").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val dots = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.select(col("doc").as("d1"), col("nrm").as("_n1")), "d1")
      .join(norms.select(col("doc").as("d2"), col("nrm").as("_n2")), "d2")
      .select(col("d1"), col("d2"),
        round(col("dot") / (col("_n1") * col("_n2")), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("d1"), col("d2"))
      .limit(topN)
  }

  /** BM25 scores for a literal query-term set; top-N documents.
    * idf is the Lucene/ATIRE positive form ln(1 + (N − df + ½)/(df + ½));
    * the per-term contribution is idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    * Query terms are a tiny literal list, so the per-term df table and the
    * (N, avgdl) scalars broadcast; the corpus-side work is one scan. */
  def bm25(df: DataFrame, textCol: String, idCol: String,
           queryTerms: Seq[String], topN: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = normToks(textCol)
    val docs = df.select(col(idCol).cast("long").as("doc"), toks.as("toks"))
      .select(col("doc"), size(col("toks")).cast("double").as("dl"), col("toks"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = docs.select(col("doc"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc"), col("dl"), col("term")).agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    val idf = log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val contrib = idf * col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc"), contrib.as("c"))
      .groupBy(col("doc")).agg(sum(col("c")).as("score"))
      .orderBy(col("score").desc, col("doc"))
      .limit(topN)
      .select(col("doc"), r6(col("score")).as("score"))
  }

  /** Count-based bigram language-model perplexity — the CCNet-shaped
    * quality filter (Wenzek et al. 2020 score every document with an LM
    * trained elsewhere and drop the high-perplexity tail): add-one
    * smoothed P(w₂|w₁) = (C(w₁w₂)+1)/(C(w₁)+V) trained on one corpus
    * slice, ppl(doc) = exp(−Σ ln P / n) on another.
    *
    * Scale shape: both count tables are map-side-combined groupBys on
    * token keys; scoring joins the scored docs' bigrams against them on
    * the same uniform keys — no windows over the corpus beyond the
    * per-doc lead(), no driver state beyond the vocab-size scalar.
    * Bigram identity uses the w₁_w₂ string key CONSISTENTLY on the train
    * and score sides, so any separator collision affects both counts
    * identically (and the DuckDB oracle reproduces it bit-for-bit). */
  /** Top-N collocations by pointwise mutual information:
    * PMI(w₁,w₂) = ln(N·C(w₁w₂) / (C(w₁)·C(w₂))) over min-support
    * corpus bigrams — the phrase-mining pass a tokenizer/vocabulary audit
    * runs. Count tables are the same map-side-combined token-key groupBys
    * as [[bigramPerplexity]]; the top-N is a TakeOrdered, never a global
    * sort. All counts are exact integers, so the PMI doubles (and the
    * ordering) replay engine-identically. */
  def pmiTopPairs(df: DataFrame, textCol: String, idCol: String,
                  minCount: Long, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).cast("long").as("doc"),
      posexplode(normToks(textCol)).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val bi = tok.withColumn("w2", lead(col("tok"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("tok").as("w1"), col("w2"))
    val uni = tok.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val nTok = tok.select(count(lit(1)).as("n_tok"))
    bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
      .join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c1", "c1a"), Seq("w1"))
      .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c1", "c1b"), Seq("w2"))
      .crossJoin(broadcast(nTok))
      .select(col("w1"), col("w2"), col("c2"),
        log(col("n_tok").cast("double") * col("c2").cast("double") /
          (col("c1a").cast("double") * col("c1b").cast("double"))).as("_pmi"))
      // round-before-rank (the repo determinism rule): JVM and libm ln()
      // can differ by an ulp, so rank on the displayed 6-decimal value and
      // let the (w1, w2) tie-break govern boundary cases
      .orderBy(round(col("_pmi"), 6).desc, col("w1"), col("w2"))
      .limit(topN)
      .select(col("w1"), col("w2"), col("c2").cast("long").as("n_pair"),
        r6(col("_pmi")).as("pmi"))
  }

  def bigramPerplexity(train: DataFrame, score: DataFrame, textCol: String,
                       idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def toks(df: DataFrame) = df.select(col(idCol).cast("long").as("doc"),
      posexplode(normToks(textCol)).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
    def bigrams(df: DataFrame) = toks(df)
      .withColumn("w2", lead(col("tok"), 1).over(w))
      .filter(col("w2").isNotNull)
      .select(col("doc"), col("tok").as("w1"),
        concat_ws("_", col("tok"), col("w2")).as("sh"))
    val uni = toks(train).groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val big = bigrams(train).groupBy(col("sh")).agg(count(lit(1)).as("c2"))
    val v = uni.count().toDouble
    bigrams(score)
      .join(uni.withColumnRenamed("tok", "w1"), Seq("w1"), "left")
      .join(big, Seq("sh"), "left")
      .select(col("doc"),
        log((coalesce(col("c2"), lit(0L)).cast("double") + 1.0) /
          (coalesce(col("c1"), lit(0L)).cast("double") + v)).as("_lp"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(exp(-sum(col("_lp")) / count(lit(1))), 4).as("ppl"))
  }

  /** Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995; Chen &
    * Goodman 1998 eq. 4.28) — the smoothing every production n-gram LM
    * quality filter actually ships (add-one, as in [[bigramPerplexity]],
    * systematically over-penalizes frequent contexts):
    *
    *   P(w2|w1) = max(c(w1w2)−D, 0)/c(w1•) + D·N1+(w1•)/c(w1•) · Pcont(w2)
    *   Pcont(w2) = (N1+(•w2) + 1) / (B + Vc)   (+1 so unseen w2 keeps mass)
    *
    * with D the absolute discount, c(w1•) the token count of bigrams
    * starting at w1, N1+ the distinct-continuation fan counts, B the
    * distinct-bigram-type total and Vc the distinct-right-type total.
    * Unseen w1 backs off to Pcont alone.
    *
    * Scale shape: every model statistic is ONE map-side-combined groupBy
    * off the trained bigram frame (pair counts, per-w1 fan/total, per-w2
    * continuation); scoring is three equi-joins on uniform token keys +
    * two broadcast scalars. Identical posture to [[bigramPerplexity]]. */
  def kneserNeyPerplexity(train: DataFrame, score: DataFrame, textCol: String,
                          idCol: String, discount: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def bigrams(df: DataFrame) = {
      val w = Window.partitionBy(col("doc")).orderBy(col("pos"))
      df.select(col(idCol).cast("long").as("doc"),
          posexplode(normToks(textCol)).as(Seq("pos", "tok")))
        .withColumn("w2", lead(col("tok"), 1).over(w))
        .filter(col("w2").isNotNull)
        .select(col("doc"), col("tok").as("w1"), col("w2"))
    }
    val big = bigrams(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("double").as("c2"))
    val ctx = big.groupBy(col("w1"))
      .agg(sum(col("c2")).as("ctot"), count(lit(1)).cast("double").as("fan"))
    val cont = big.groupBy(col("w2"))
      .agg(count(lit(1)).cast("double").as("cc"))
    val tot = big.agg(count(lit(1)).cast("double").as("_b"))
      .crossJoin(broadcast(cont.agg(count(lit(1)).cast("double").as("_vc"))))
    val d = lit(discount)
    val pcont = (coalesce(col("cc"), lit(0.0)) + 1.0) / (col("_b") + col("_vc"))
    bigrams(score)
      .join(big, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc"), log(when(col("ctot").isNull, pcont)
        .otherwise(greatest(coalesce(col("c2"), lit(0.0)) - d, lit(0.0)) / col("ctot") +
          d * col("fan") / col("ctot") * pcont)).as("_lp"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(exp(-sum(col("_lp")) / count(lit(1))), 4).as("ppl_kn"))
  }
}
