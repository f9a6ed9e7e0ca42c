package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for SURVEY §6: planted-skew join, salted vs plain at sf0.1 —
  * wall time and max output-partition rows (AQE skew splitting and
  * broadcast disabled so the measurement isolates the salting). */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.{Num, Salting, Tables}
    val li = Tables.lineitem(spark, d)
    val hotKey = when(
      pmod(Num.md5Long(concat_ws("_", col("l_orderkey"), col("l_linenumber"))),
        lit(10L)) < 3, lit(1L)).otherwise(col("l_suppkey").cast("long"))
    val fact = li.select(hotKey.as("suppkey"), col("l_quantity"),
      concat_ws("_", col("l_orderkey"), col("l_linenumber")).as("_rid"))
    val dim = Tables.supplier(spark, d)
      .select(col("s_suppkey").cast("long").as("suppkey"), col("s_acctbal"))
    def run(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { r =>
        val t0 = System.nanoTime()
        val mx = df.select(spark_partition_id().as("pid")).groupBy("pid").count()
          .agg(max("count"), sum("count")).head()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name run$r: ${dt}%.2f s maxPartRows=${mx.getLong(0)} total=${mx.getLong(1)}")
      }
    }
    run("plain ", fact.join(dim, "suppkey"))
    for (s <- Seq(8, 16)) run(f"salt$s%-3d", Salting.saltedJoin(fact, dim, "suppkey", "_rid", s))
    spark.stop()
  }
}
