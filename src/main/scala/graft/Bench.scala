package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = math.max(sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt, 1)
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
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) System.err.println(
        s"BENCH WARN: SPARK_GRAFT_ONLY names match no query: ${unknown.mkString(", ")}")
    }
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // each query runs `runs` times; the per-query time is the MIN (sandbox
    // load noise inflates single runs by 2-4x — see the round-2 bench)
    val results = selected.map { case (name, fn) =>
      val timed = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case t: Throwable => System.err.println(s"BENCH FAIL $name: $t"); false }
        (ok, (System.nanoTime() - t0) / 1e9)
      }
      val okTimes = timed.collect { case (true, s) => s }
      // a query that failed every run reports NEGATED min elapsed so the
      // json can never mistake a crash-at-start for a fast query
      name -> (if (okTimes.nonEmpty) okTimes.min else -timed.map(_._2).min)
    }
    val failed = results.collect { case (n, v) if v < 0 => n }.toSeq.sorted
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries are excluded from total (listed separately)
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // 1-minute system load average: past rounds' reported numbers were
    // 3-5x inflated by sandbox co-tenants — record the evidence in-band
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // headline fields LAST: the driver records only the tail of stdout, and
    // with 246 per-query entries a metric-first line loses its totals to
    // truncation (every BENCH_r*.json through r7 shows the front cut off)
    println(s"""{"queries":$qs,"failed":$failedJson,"runs":$runs,"loadavg":$load,"sf":"$sfDir","metric":"total","value":$total,"unit":"sec","n_queries":${selected.size}}""")
    // second, summary-only line (no per-query map): short enough that the
    // stdout tail always retains one complete parseable JSON object even
    // when the full line above is truncated by the capture window. The
    // only unbounded field (failed names) goes FIRST and the headline
    // fields LAST, so a tail boundary landing inside a heavy-failure line
    // still keeps the totals (same ordering rationale as the full line).
    println(s"""{"failed":$failedJson,"n_failed":${failed.size},"sf":"$sfDir","runs":$runs,"loadavg":$load,"n_queries":${selected.size},"metric":"total","value":$total,"unit":"sec"}""")
    spark.stop()
  }
}
