package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * batched feature extraction. The decode step is a clearly-marked
  * deterministic STUB (no image/audio codecs in this environment); the
  * Spark-side contract — schema, batching, partition-parallel extraction —
  * is real and is what matters at 100 TB.
  */
object Multimodal {
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Wrap documents as fake media rows: payload = utf8 bytes, metadata
    * derived deterministically. Pure column expressions. n_bytes is the
    * BYTE length (octet_length) — the payload contract is byte-based, and
    * the oracle indexes bytes too, so the parity holds beyond ASCII. */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").cast("long"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height")).as("meta"))

  /** STUB decoder: a real deployment plugs an image/audio codec in here
    * (mapInPandas/mapPartitions, batch-at-a-time). The fake "features" are
    * deterministic byte statistics so the pipeline shape (binary in,
    * fixed-size float vector out, batched per partition) is fully
    * exercised. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media_type", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(DoubleType))))
    val rdd = media.select(col("doc_id"), col("meta.media_type"), col("payload")).rdd
      .mapPartitions { it =>
        // batch-at-a-time to mirror the accelerator-feeding access pattern
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val mt = r.getString(1)
            val bytes = r.getAs[Array[Byte]](2)
            val feats = decodeStub(bytes)
            Row(id, mt, bytes.length.toLong, feats)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** ??? in a real system — deterministic fake: moments of the byte
    * stream, standing in for decoded-pixel statistics. Unrounded so the
    * aggregate summary stays engine-reproducible (sum-of-ints means are
    * exact). */
  private def decodeStub(bytes: Array[Byte]): Seq[Double] = {
    if (bytes.isEmpty) Seq(0.0, 0.0, 0.0, 0.0)
    else {
      val d = bytes.map(b => (b & 0xff).toDouble)
      val mean = d.sum / d.length
      val v = d.map(x => (x - mean) * (x - mean)).sum / d.length
      Seq(mean, math.sqrt(v), d.max, d.min)
    }
  }

  /** Aggregate summary per media type (the query-surface entry point). */
  def featureSummary(documents: DataFrame): DataFrame =
    extractFeatures(asMedia(documents))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg(col("n_bytes")), 4).as("avg_bytes"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_feat_mean"))
      .orderBy(col("media_type"))
}
