package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: prints ANN-family avg_recall across SFs/hyperparams. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val d = s"/root/testdata/sf$sf"
      val e = graft.core.Tables.embeddings(spark, d)
      val q = e.filter(col("vec_id") < 20)
      for ((m, kc, sl) <- Seq((8, 16, 50), (8, 64, 50), (8, 16, 100))) {
        val pq = graft.neighbors.PQ.recallSummary(e, q, "vec_id", "embedding",
          m = m, kCodes = kc, k = 5, shortlist = sl).head()
        val ivfpq = graft.neighbors.IVFPQ.recallSummary(e, q, "vec_id", "embedding",
          nCells = 16, m = m, kCodes = kc, k = 5, nprobe = 4, shortlist = sl).head()
        println(s"SF=$sf m=$m kCodes=$kc sl=$sl pq=${pq.getDouble(1)} ivfpq=${ivfpq.getDouble(1)}")
      }
      val ivf = graft.neighbors.IVF.recallSummary(e, q, "vec_id", "embedding",
        nCells = 16, k = 5, nprobe = 4).head()
      println(s"SF=$sf ivf=${ivf.getDouble(1)}")
    }
    spark.stop()
  }
}
