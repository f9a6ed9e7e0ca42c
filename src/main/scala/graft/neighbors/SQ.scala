package graft.neighbors

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of an embedding column — the storage path a
  * 100 TB embedding corpus actually ships (4× smaller than float32, 8×
  * smaller than float64; FAISS's `ScalarQuantizer` QT_8bit shape, Jégou et
  * al.'s SQ baseline). Reference anchor: the PQ/IVF compression family
  * already in `graft.neighbors` (reference `cpp/src_prims/` distance
  * kernels operate on exactly such codes); SQ is its simplest member and
  * the one every pipeline starts with.
  *
  * Train = per-dimension (min, max) over the corpus: posexplode (pure map)
  * then ONE map-side-combined groupBy on the dimension index — d distinct
  * keys, so the shuffle reduces to d rows per partition regardless of
  * corpus size. Encode/decode replay is a broadcast join back on that
  * d-row frame followed by codegen arithmetic only:
  * code = clamp(round((x−min)/scale), 0..255), x̂ = min + code·scale,
  * scale = (max−min)/255.
  */
object SQ {

  /** Per-dimension audit of the int8 round-trip: (pos, dmin, dmax, scale,
    * avg_sq_err, max_abs_err) — one row per dimension. The quantize →
    * dequantize → error pass never materializes codes corpus-wide here;
    * at scale the same `code` expression writes the int8 column and this
    * summary is the data-quality gate beside it. */
  def quantizeAudit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val expl = df.select(col(idCol).cast("long").as("id"),
        posexplode(col(vecCol).cast("array<double>")))
      .toDF("id", "pos", "val")
    val stats = expl.groupBy(col("pos"))
      .agg(min(col("val")).as("dmin"), max(col("val")).as("dmax"))
      .withColumn("scale", (col("dmax") - col("dmin")) / 255.0)
    val code = when(col("scale") === 0.0, lit(0.0))
      .otherwise(least(lit(255.0),
        greatest(lit(0.0), round((col("val") - col("dmin")) / col("scale"), 0))))
    expl.join(broadcast(stats), Seq("pos"))
      .withColumn("err", col("val") - (col("dmin") + code * col("scale")))
      .groupBy(col("pos"))
      .agg(round(first(col("dmin")), 6).as("dmin"),
        round(first(col("dmax")), 6).as("dmax"),
        round(first(col("scale")), 9).as("scale"),
        round(avg(col("err") * col("err")), 9).as("avg_sq_err"),
        round(max(abs(col("err"))), 6).as("max_abs_err"))
      .withColumn("pos", col("pos").cast("long"))
  }
}
