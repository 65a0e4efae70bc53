package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the 64-round BPE depth workload per sf dir — the instrument
  * behind SCALING.md's bpe_merges cadence A/B (round 11). Usage:
  * runMain graft.tools.BpeTime <sfName...>  (e.g. sf0.01 sf0.1);
  * edit TextOps.BpeCheckpointEvery between runs to A/B the cadence. */
object BpeTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- args) {
      val t0 = System.nanoTime()
      val n = graft.operators.TextOps
        .bpeMerges(spark, s"/root/testdata/$sf", 64).count()
      println(f"BPE64 $sf rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
