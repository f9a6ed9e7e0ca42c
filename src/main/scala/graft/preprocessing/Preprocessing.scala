package graft.preprocessing

import graft.core.Num
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preprocessing surface (reference python/cuml/preprocessing/
  * LabelEncoder.py, model_selection.py train_test_split).
  */
object Preprocessing {
  /** Deterministic label→code mapping: dense_rank over the sorted distinct
    * labels (cuML LabelEncoder fits categories in sorted order). The window
    * runs over the DISTINCT label set (tiny), never the data. */
  def labelEncoderMapping(df: DataFrame, labelCol: String): DataFrame = {
    val w = Window.orderBy(col("label"))
    df.select(col(labelCol).as("label")).distinct()
      .select(col("label"), (dense_rank().over(w) - 1).cast("long").as("code"))
  }

  /** Attach the code column to data rows — broadcast join against the tiny
    * mapping, the scalable form of LabelEncoder.transform. */
  def labelEncode(df: DataFrame, labelCol: String): DataFrame =
    df.join(broadcast(labelEncoderMapping(df, labelCol)),
      df(labelCol) === col("label"), "left").drop("label")

  /** Reproducible, engine-neutral train/test split: md5-hash of the key
    * column + seed, mod 1000 — the same rows land in the same split on any
    * cluster size, any engine (cuML's train_test_split shuffles by seed;
    * hash-splitting is its shuffle-free distributed equivalent). */
  def splitColumn(key: Column, testPermille: Int, seed: Long): Column =
    when(Num.md5Long(concat(key.cast("string"), lit("_"), lit(seed.toString))) % 1000 < testPermille,
      lit("test")).otherwise(lit("train"))

  def trainTestSplit(df: DataFrame, keyCol: String, testFraction: Double,
                     seed: Long = 42L): DataFrame =
    df.withColumn("split", splitColumn(col(keyCol), (testFraction * 1000).round.toInt, seed))

  /** Per-group deterministic downsampling — the data-mixing primitive of a
    * training-data pipeline (keep 50% of English, 5% of zh, …). Same
    * engine-neutral md5 threshold as [[trainTestSplit]], with a per-group
    * permille: a pure codegen'd filter, no shuffle, reproducible on any
    * cluster size. Groups absent from `fractions` are dropped. */
  def stratifiedSample(df: DataFrame, keyCol: String, groupCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val permille = fractions.toSeq.sortBy(_._1)
      .map { case (g, f) => (g, (f * 1000).round.toInt) }
    val pm = permille.foldLeft(lit(0)) { case (acc, (g, p)) =>
      when(col(groupCol) === g, lit(p)).otherwise(acc)
    }
    df.filter(Num.md5Long(concat(col(keyCol).cast("string"), lit("_"), lit(seed.toString)))
      % 1000 < pm)
  }
}
