package graft.tools
import java.util.concurrent.atomic.LongAdder
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-11 scale diagnostic for `jaccard_lsh`'s sf10→sf30 exponent
  * (SCALING.md round-11 §3): times the query with shuffle partitions
  * decoupled from cores (SPARK_GRAFT_PARTS; TimeQuery couples both to
  * SPARK_GRAFT_CPUS, which conflates partition width with thread
  * oversubscription) and, per run, reports the executor spill and
  * shuffle-write totals from task metrics — the numbers that separate
  * "more data, same regime" from "fixed per-task memory crossed the
  * external-merge threshold". Heap comes from build.sbt's
  * SPARK_DRIVER_MEM override.
  *
  * Round 12 adds PER-STAGE attribution (executor run time, shuffle
  * read/write, spill, task count per completed stage): the r11 verdict
  * left the ~25 %/decade CPU-side residual attributed to "per-task
  * hash state" in aggregate; comparing the per-stage exponent across
  * sf dirs names the stage that carries it, so a fix (two-level
  * aggregation, width scaling, prefilter) targets the measured stage
  * instead of the whole plan. SPARK_GRAFT_LSH_QUERY overrides the
  * timed query (default jaccard_lsh) so variants registered under
  * other names A/B against the same instrument. */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val qname = sys.env.getOrElse("SPARK_GRAFT_LSH_QUERY", "jaccard_lsh")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val memSpill = new LongAdder; val diskSpill = new LongAdder
    val shufWrite = new LongAdder
    // (stageId, name-head, tasks, runTimeMs, shufReadB, shufWriteB, spillB)
    val stages = ArrayBuffer.empty[(Int, String, Int, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.add(m.memoryBytesSpilled)
          diskSpill.add(m.diskBytesSpilled)
          shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        // cancelled/failed stage attempts can complete without metrics
        Option(i.taskMetrics).foreach { m =>
          stages.synchronized {
            stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60),
              i.numTasks, m.executorRunTime,
              m.shuffleReadMetrics.totalBytesRead,
              m.shuffleWriteMetrics.bytesWritten,
              m.memoryBytesSpilled + m.diskBytesSpilled))
          }
        }
      }
    })
    for (dir <- args; i <- 1 to 3) {
      memSpill.reset(); diskSpill.reset(); shufWrite.reset()
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(qname)(spark, dir).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(2000)
      println(f"DIAG $dir q=$qname parts=$parts run$i rows=$n $sec%.1f s " +
        f"spillMem=${memSpill.sum / 1e9}%.1f GB " +
        f"spillDisk=${diskSpill.sum / 1e9}%.1f GB " +
        f"shufWrite=${shufWrite.sum / 1e9}%.1f GB")
      stages.synchronized {
        stages.sortBy(-_._4).take(12).foreach {
          case (id, name, nt, rt, sr, sw, sp) =>
            println(f"  STAGE $id%4d $name%-60s tasks=$nt%4d " +
              f"runTime=${rt / 1000.0}%8.1f s " +
              f"shufRead=${sr / 1e9}%6.2f GB shufWrite=${sw / 1e9}%6.2f GB " +
              f"spill=${sp / 1e9}%6.2f GB")
        }
      }
    }
    spark.stop()
  }
}
