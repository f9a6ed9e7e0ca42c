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

  /** Skew-safe equi-join: the FACT side takes a deterministic salt in
    * [0, salts) (md5 of its key + a spreader column, engine-neutral), the
    * DIM side replicates each row `salts` times, and the join runs on
    * (key, salt) — a hot fact key spreads over `salts` reducers instead
    * of melting one. The result multiset is IDENTICAL to the plain key
    * join (parity spec); dim-side volume grows ×salts, so use it when
    * dim ≪ fact but too big (or too mid-plan) to broadcast — the gap AQE
    * skew handling doesn't always cover (first shuffle of a
    * non-sort-merge join, pre-AQE stats misestimates).
    * Output: fact columns + dim columns (key column once). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 spreadCol: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts >= 1")
    val f = fact.withColumn("_salt",
      pmod(Num.md5Long(concat_ws("_", col(keyCol).cast("string"),
        col(spreadCol).cast("string"))), lit(salts.toLong)))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    f.join(d, Seq(keyCol, "_salt")).drop("_salt")
  }
}
