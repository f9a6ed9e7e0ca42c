package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev probe for SURVEY §6 (r17 verdict #1): run one named query and print,
  * per stage, the task-time distribution (max vs median) so a
  * single-task-skew stage can be NAMED instead of guessed. Prints from a
  * shutdown hook too, so a `timeout`-killed run still reports the stage it
  * was stuck in, including tasks still in flight. Usage:
  *   runMain graft.tools.SkewFinder <sfDir> <queryName>
  * Env: SPARK_GRAFT_CPUS (default 16). */
object SkewFinder {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lock = new Object
    val taskMs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val running = mutable.Map.empty[Long, (Int, Long)] // taskId -> (stageId, startMs)
    val stageNames = mutable.Map.empty[Int, String]
    val stageIO = mutable.Map.empty[Int, (Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        lock.synchronized { stageNames(s.stageInfo.stageId) = s.stageInfo.name }
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        lock.synchronized {
          running(t.taskInfo.taskId) = (t.stageId, System.currentTimeMillis())
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = lock.synchronized {
        running.remove(t.taskInfo.taskId)
        taskMs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) +=
          t.taskInfo.duration
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          val m = s.stageInfo.taskMetrics
          stageIO(s.stageInfo.stageId) =
            (if (m == null) 0L else m.shuffleWriteMetrics.bytesWritten,
             if (m == null) 0L else m.inputMetrics.bytesRead)
        }
    })

    @volatile var printed = false
    def dump(): Unit = lock.synchronized {
      if (printed) return
      printed = true
      println("[skewfinder] stageId  tasks    maxMs    medMs  ratio  shufWrMB  inputMB  name")
      taskMs.toSeq.sortBy(_._1).foreach { case (sid, durs) =>
        val sorted = durs.sorted
        val med = sorted(sorted.length / 2)
        val mx = sorted.last
        val (sw, in) = stageIO.getOrElse(sid, (0L, 0L))
        println(f"[skewfinder] $sid%7d ${durs.length}%6d $mx%8d $med%8d ${
          if (med == 0) 0.0 else mx.toDouble / med}%6.1f ${sw / 1e6}%9.1f ${in / 1e6}%8.1f  ${stageNames.getOrElse(sid, "?").take(90)}")
      }
      val now = System.currentTimeMillis()
      running.toSeq.sortBy(_._2._2).foreach { case (tid, (sid, st)) =>
        println(f"[skewfinder] IN-FLIGHT task $tid stage $sid elapsed ${(now - st) / 1e3}%.0f s  ${stageNames.getOrElse(sid, "?").take(90)}")
      }
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => dump()))

    val t0 = System.nanoTime()
    val cnt = graft.SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[skewfinder] $name total ${wall}%.1f s  $cnt rows")
    dump()
    spark.stop()
  }
}
