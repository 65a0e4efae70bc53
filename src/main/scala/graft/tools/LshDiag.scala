package graft.tools
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-11 scale diagnostic for `jaccard_lsh`'s sf10→sf30 exponent
  * (SCALING.md round-11 §3): times the query with shuffle partitions
  * decoupled from cores (SPARK_GRAFT_PARTS; TimeQuery couples both to
  * SPARK_GRAFT_CPUS, which conflates partition width with thread
  * oversubscription) and, per run, reports the executor spill and
  * shuffle-write totals from task metrics — the numbers that separate
  * "more data, same regime" from "fixed per-task memory crossed the
  * external-merge threshold". Heap comes from build.sbt's
  * SPARK_DRIVER_MEM override. */
object LshDiag {
  def main(args: Array[String]): Unit = {
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val memSpill = new LongAdder; val diskSpill = new LongAdder
    val shufWrite = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.add(m.memoryBytesSpilled)
          diskSpill.add(m.diskBytesSpilled)
          shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    for (dir <- args; i <- 1 to 3) {
      memSpill.reset(); diskSpill.reset(); shufWrite.reset()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("jaccard_lsh")(spark, dir).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(2000)
      println(f"DIAG $dir parts=$parts run$i rows=$n $sec%.1f s " +
        f"spillMem=${memSpill.sum / 1e9}%.1f GB " +
        f"spillDisk=${diskSpill.sum / 1e9}%.1f GB " +
        f"shufWrite=${shufWrite.sum / 1e9}%.1f GB")
    }
    spark.stop()
  }
}
