package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation: salt the hot key space, partially
  * aggregate on (key, salt) — spreading a hot key over `salts` reducers —
  * then strip the salt and combine. Results are identical to the direct
  * groupBy for any algebraic aggregate; use when a key holds a large share
  * of the rows (the 100 TB skew pattern AQE alone may not save).
  */
object Salting {
  /** Salted sum/count aggregation over one key column. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame = {
    val salted = df.select(key.as("_k"), value.as("_v"))
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted.groupBy(col("_k"), col("_salt"))
      .agg(sum(col("_v")).as("_ps"), count(lit(1)).as("_pc"))
      .groupBy(col("_k"))
      .agg(sum(col("_ps")).as("sum"), sum(col("_pc")).cast("long").as("count"))
      .withColumnRenamed("_k", "key")
  }
}
