package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.PageRank

/** Round-13 instrument (r12 verdict item 4): time the DISTRIBUTED
  * PageRank loop — `localThreshold = 0`, so the size gate that routes
  * bench-scale graphs through the single-task path cannot fire — on a
  * GenScale'd dir, reporting iterations, per-iteration seconds (via
  * SPARK_GRAFT_PR_LOG, set here), and total shuffle read/write GB from
  * task metrics. This turns the "O(iterations) bounded-lineage loop"
  * claim (PageRank object scaladoc) into a measured SCALING.md row:
  * per-iteration time should be flat across iterations (localCheckpoint
  * keeps lineage depth constant) and shuffle per iteration bounded by
  * |V| message traffic, not iteration count.
  *
  * Usage: SPARK_GRAFT_PR_LOG=1 runMain graft.tools.PrDist <sfDir> */
object PrDist {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shufWrite = new LongAdder; val shufRead = new LongAdder
    val spill = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.add(m.shuffleWriteMetrics.bytesWritten)
          shufRead.add(m.shuffleReadMetrics.totalBytesRead)
          spill.add(m.diskBytesSpilled)
        }
      }
    })
    val edges = PageRank.productEdges(spark, dir)
    val v = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("id")).withColumn("pers", lit(1.0))
    // separate the one-time adjacency build (DF→RDD + groupByKey) from
    // the loop itself: it is the loop's per-iteration cost the lineage
    // claim is about
    val tAdj0 = System.nanoTime()
    val nEdges = edges.count()
    println(f"PRDIST adjacency-input edges=$nEdges " +
      f"sec=${(System.nanoTime() - tAdj0) / 1e9}%.1f")
    shufWrite.reset(); shufRead.reset(); spill.reset()
    val t0 = System.nanoTime()
    val nRanks = PageRank.run(spark, v, edges,
      PageRank.Params(localThreshold = 0)).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // listener events drain asynchronously
    println(f"PRDIST dir=$dir ranks=$nRanks total=$sec%.1f s " +
      f"shufWrite=${shufWrite.sum / 1e9}%.2f GB " +
      f"shufRead=${shufRead.sum / 1e9}%.2f GB " +
      f"spill=${spill.sum / 1e9}%.2f GB")
    spark.stop()
  }
}
