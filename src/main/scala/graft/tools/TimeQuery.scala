package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-time a single declared query against one sf dir — the A/B
  * instrument behind SCALING.md's quiet re-times (run 1 = cold with
  * builder first-touch, runs 2+ = warm). [[graft.Bench]] sweeps the
  * whole surface with budgets; this answers the narrower question
  * "did THIS query get faster under THIS code change" without paying
  * for a sweep, so variants can be swapped in place and compared on a
  * load-gated box (gate on 1-min loadavg yourself before trusting the
  * numbers — see the bench-isolation note in the verify skill).
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query> [runs=4]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(args(1))
    val runs = if (args.length > 2) args(2).toInt else 4
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      q(spark, args(0)).collect()
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
