package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-Pair Encoding tokenizer TRAINING (Sennrich et al., ACL 2016 —
  * the algorithm behind GPT-2/LLaMA-family vocabularies): repeatedly find
  * the most frequent adjacent symbol pair across the corpus and merge it
  * into a new symbol. The learned merge list IS the tokenizer.
  *
  * Distributed exactly the way production BPE trainers shard: the corpus
  * collapses to the word-TYPE frame (distinct word, count) — bounded by
  * vocabulary, not corpus size — and each merge round is ONE map-side-
  * combined pair-count aggregate (the argmax is a 1-row driver fetch, the
  * only thing that ever leaves the executors) plus a stateless in-row
  * fold that rewrites every word's symbol list. R merges = R tiny jobs
  * over the word-type frame; the 100 TB corpus is touched once, to build
  * that frame.
  *
  * Merging is the greedy left-to-right fold (`aggregate` over the symbol
  * array): acc ends with `l` and the next symbol is `r` → replace the
  * tail with the merged symbol (so "aaa" under (a,a) gives [aa, a],
  * matching the reference implementation's non-overlapping scan). Ties on
  * the pair count break lexicographically — deterministic and
  * SQL-replayable. */
object BPE {
  /** End-of-word marker appended as its own symbol (words are restricted
    * to ^[a-z]+$ so '_' cannot collide with a character symbol). */
  val Marker = "_"

  private def charSyms(word: Column): Column = concat(
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
    array(lit(Marker)))

  /** One learned merge. */
  final case class Merge(round: Int, left: String, right: String, count: Long)

  /** Train `rounds` merges over the corpus; returns the merge table
    * (round, left, right, merged, pair_count). */
  def train(docs: DataFrame, textCol: Column, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val toks = split(lower(trim(regexp_replace(textCol, "\\s+", " "))), " ")
    var words = docs.select(explode(toks).as("word"))
      .filter(col("word").rlike("^[a-z]{2,20}$"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("cnt"))
      .select(col("cnt"), charSyms(col("word")).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    for (r <- 1 to rounds) {
      val pairs = words.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).cast("long").as("c"))
      val top = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (top.nonEmpty) {
        val row = top.head
        val (l, rr, c) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(r, l, rr, c)
        val lc = lit(l); val rc = lit(rr); val mc = lit(l + rr)
        words = words.select(col("cnt"),
            aggregate(
              slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
              slice(col("syms"), lit(1), lit(1)),
              (acc, s) => when(element_at(acc, size(acc)) === lc && s === rc,
                  concat(slice(acc, lit(1), size(acc) - 1), array(mc)))
                .otherwise(concat(acc, array(s)))).as("syms"))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("round", "left", "right", "pair_count")
      .select(col("round").cast("long").as("round"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
  }

  /** Apply one learned merge (the same greedy left-to-right fold the
    * trainer uses) to a symbol-array column. */
  def applyMerge(syms: Column, l: String, r: String): Column = {
    val lc = lit(l); val rc = lit(r); val mc = lit(l + r)
    when(size(syms) < 2, syms).otherwise(aggregate(
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(1), lit(1)),
      (acc, s) => when(element_at(acc, size(acc)) === lc && s === rc,
          concat(slice(acc, lit(1), size(acc) - 1), array(mc)))
        .otherwise(concat(acc, array(s)))))
  }

  /** The tokenizer SERVE path: train `rounds` merges on the corpus, then
    * ENCODE the corpus with them and report per-language fertility — the
    * number the pipeline actually watches when picking a vocabulary
    * (tokens/word by language is the classic multilingual-fairness gauge).
    *
    * Scale shape: encoding collapses to the per-(lang, word-type) frame —
    * bounded by vocabulary × languages, not corpus — and the R merges are
    * literal columns folded in a single stateless projection (no joins:
    * the merge list is O(R) and rides in the plan). One final map-side-
    * combined per-lang aggregate. Output per lang: word tokens, subword
    * tokens, fertility = subwords/words, distinct subword vocabulary. */
  def encodeFertility(docs: DataFrame, textCol: Column, langCol: Column,
                      rounds: Int): DataFrame = {
    val merges = train(docs, textCol, rounds).orderBy("round").collect()
      .map(r => (r.getString(r.fieldIndex("left")), r.getString(r.fieldIndex("right"))))
    val toks = split(lower(trim(regexp_replace(textCol, "\\s+", " "))), " ")
    // one materialized projection PER merge on the bounded lang-word
    // frame (exactly train()'s per-round discipline): ArrayAggregate is
    // interpreted (no codegen for lambda HOFs) and references its input
    // ~4x, so folding R merges into ONE nested expression re-evaluates
    // the inner folds ~4^R times — at sf1 that turned a 3 s encode into
    // a half-hour stall. R localCheckpoints of a vocab-bounded frame are
    // noise by comparison.
    var lw = docs.select(langCol.as("lang"), explode(toks).as("word"))
      .filter(col("word").rlike("^[a-z]{2,20}$"))
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .select(col("lang"), col("cnt"), charSyms(col("word")).as("syms"))
      .localCheckpoint()
    merges.foreach { case (l, r) =>
      lw = lw.select(col("lang"), col("cnt"), applyMerge(col("syms"), l, r).as("syms"))
        .localCheckpoint()
    }
    val perLang = lw.groupBy(col("lang"))
      .agg(sum(col("cnt")).cast("long").as("n_words"),
        sum(col("cnt") * size(col("syms"))).cast("long").as("n_subwords"))
    val vocab = lw.select(col("lang"), explode(col("syms")).as("s")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).cast("long").as("subword_vocab"))
    perLang.join(vocab, Seq("lang"))
      .select(col("lang"), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") / col("n_words"), 6).as("fertility"),
        col("subword_vocab"))
      .orderBy("lang")
  }
}
