package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profile of one declared query — the empirical instrument
  * of the optimization guide's §1 ("decide whether the time is going to
  * shuffle read, shuffle write, executor compute"), headless: a
  * SparkListener accumulates each completed stage's wall time, task
  * time, input/shuffle volumes and row counts, and the run prints them
  * sorted by wall time. Run 1 is cold (builder first-touch); runs 2+
  * are the steady state the bench budgets gate on. The listener is
  * installed AFTER the warm-up runs so only the profiled run's stages
  * are reported. Usage:
  *   runMain graft.tools.StageProf <sfDir> <query> [warmRuns=2]
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val warmRuns = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to warmRuns).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"STAGEPROF warm$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Double, Double, Long, Long, Long, Long, String)]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val s = e.stageInfo
        val m = s.taskMetrics
        val wall = (for (a <- s.completionTime; b <- s.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        rows += ((s.stageId, wall, m.executorRunTime / 1e3,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead, s.numTasks,
          s.name.takeWhile(_ != '\n').take(60)))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val total = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // let the listener bus drain
    println(f"STAGEPROF profiled ${total}%.2fs, ${rows.size} stages")
    println("stage   wall_s  task_s  tasks  shuf_read  shuf_write  input  name")
    rows.sortBy(-_._2).foreach { case (id, w, t, sr, sw, in, n, nm) =>
      println(f"$id%5d  $w%6.2f  $t%6.2f  $n%5d  ${sr / 1048576.0}%8.2fM  ${sw / 1048576.0}%9.2fM  ${in / 1048576.0}%6.1fM  $nm")
    }
    val sumWall = rows.map(_._2).sum
    println(f"STAGEPROF sum_stage_wall ${sumWall}%.2fs vs query $total%.2fs " +
      "(gap = driver/planning/scheduling between stages)")
    spark.stop()
  }
}
