package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the session once (JVM/codegen/parquet-footer costs otherwise
    // land on whichever query happens to run first)
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(10).write
      .format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink: forces full materialization of every output column — a
    // bare count() lets Catalyst prune the actual operator work away.
    // SPARK_GRAFT_ONLY=a,b,c restricts the run (local iteration).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query reports NEGATED elapsed time so BENCH json can
      // never mistake a crash-at-start for a fast query
      val sign = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); 1.0 }
      catch { case t: Throwable => System.err.println(s"BENCH FAIL $name: $t"); -1.0 }
      name -> sign * (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(math.abs).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
