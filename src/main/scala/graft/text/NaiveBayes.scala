package graft.text

import graft.core.Num.r6
import graft.preprocessing.Preprocessing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over document tokens — the classic counts-only
  * text classifier (add-one smoothing, log-space scoring), re-expressed as
  * pure relational algebra so fit AND predict are each one aggregation
  * pass. The reference ships estimator/predictor pairs with this exact
  * train/score separation (e.g. python/cuml/linear_model/
  * logistic_regression.pyx fit/predict); NB is its counts-based sibling
  * and the standard quality-classifier baseline in LLM-corpus pipelines.
  *
  * Fit = three map-side-combined groupBys on the train split: per
  * (class, token) counts, per-class token totals, class priors. Vocabulary
  * size V joins in as a broadcast one-row frame (never a driver collect).
  * Predict = explode the test docs' tokens, cross-join the bounded class
  * frame (broadcast — |classes| rows), LEFT join the (class, token) counts
  * so unseen tokens fall back to the ln(1/(tot+V)) smoothed mass, then one
  * (doc, class) aggregate and a per-doc argmax window (partitioned by doc
  * — no global sort). Every decision happens on ROUNDED log-scores with a
  * class-name tie-break, so the DuckDB oracle replays the argmax exactly.
  *
  * Scale shape: token count tables shuffle on token/class keys
  * (map-side-combined); scoring joins on the same token key; the class
  * cross-join is a broadcast of |classes| rows; the argmax window is
  * per-doc. Nothing is quadratic, nothing sorts globally.
  */
object NaiveBayes {

  private def normToks(text: Column): Column =
    split(lower(trim(regexp_replace(text, "\\s+", " "))), " ")

  /** Per-class fit summary: (class, n_docs, n_tokens, vocab seen in class,
    * rounded log-prior). */
  def fitSummary(docs: DataFrame, textCol: String, labelCol: String,
                 testPermille: Int = 250, seed: Long = 42L,
                 idCol: String = "doc_id"): DataFrame = {
    val train = docs.filter(
      Preprocessing.splitColumn(col(idCol), testPermille, seed) === "train")
    val tok = train.select(col(labelCol).as("class"),
        explode(normToks(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    val nTrain = train.agg(count(lit(1)).cast("double").as("_n"))
    val byClass = train.groupBy(col(labelCol).as("class"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
    tok.groupBy(col("class"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        countDistinct(col("tok")).cast("long").as("class_vocab"))
      .join(byClass, "class")
      .crossJoin(broadcast(nTrain))
      .select(col("class"), col("n_docs"), col("n_tokens"), col("class_vocab"),
        r6(log(col("n_docs") / col("_n"))).as("log_prior"))
      .orderBy("class")
  }

  /** Fit on the train split, score the test split; emits the test-split
    * confusion matrix (truth, pred, n). */
  def fitPredictConfusion(docs: DataFrame, textCol: String, labelCol: String,
                          testPermille: Int = 250, seed: Long = 42L,
                          idCol: String = "doc_id"): DataFrame = {
    val split = Preprocessing.splitColumn(col(idCol), testPermille, seed)
    val base = docs.select(col(idCol).as("doc"), col(labelCol).as("truth"),
      normToks(col(textCol)).as("toks"), split.as("_sp"))
    val train = base.filter(col("_sp") === "train")
    val test = base.filter(col("_sp") === "test")

    val trainTok = train.select(col("truth").as("class"), explode(col("toks")).as("tok"))
      .filter(length(col("tok")) > 0)
    // (class, token) counts and per-class totals: map-side-combined groupBys
    val classTok = trainTok.groupBy("class", "tok")
      .agg(count(lit(1)).cast("double").as("ctk"))
    val classes = trainTok.groupBy("class")
      .agg(count(lit(1)).cast("double").as("tot"))
      .join(train.groupBy(col("truth").as("class"))
        .agg(count(lit(1)).cast("double").as("ndoc")), "class")
    val nTrainVocab = trainTok.agg(countDistinct(col("tok")).cast("double").as("v"))
    val nTrainDocs = train.agg(count(lit(1)).cast("double").as("ntr"))
    val classFrame = classes
      .crossJoin(broadcast(nTrainVocab))
      .crossJoin(broadcast(nTrainDocs))
      .select(col("class"), col("tot"), col("v"), log(col("ndoc") / col("ntr")).as("lp"))

    val testTok = test.select(col("doc"), col("truth"), explode(col("toks")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("doc", "truth", "tok").agg(count(lit(1)).cast("double").as("tf"))
    // every test token scores against EVERY class; missing (class, token)
    // counts coalesce to 0 → the add-one floor
    val scored = testTok.crossJoin(broadcast(classFrame))
      .join(classTok, Seq("class", "tok"), "left")
      .select(col("doc"), col("truth"), col("class"), col("lp"),
        (col("tf") * (log(coalesce(col("ctk"), lit(0.0)) + 1.0) -
          log(col("tot") + col("v")))).as("_c"))
    val docClass = scored.groupBy("doc", "truth", "class")
      .agg((first(col("lp")) + sum(col("_c"))).as("_score"))
    // argmax on the ROUNDED score, class-name tie-break — oracle-replayable
    val w = Window.partitionBy(col("doc"))
      .orderBy(round(col("_score"), 6).desc, col("class"))
    docClass.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .groupBy(col("truth"), col("class").as("pred"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy("truth", "pred")
  }
}
