package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the 64-round BPE depth workload per sf dir — the instrument
  * behind SCALING.md's bpe_merges cadence A/B (round 11; byte-level
  * mode round 13). Usage:
  * runMain graft.tools.BpeTime [--bytes] <sfName...>  (e.g. sf0.01);
  * edit TextOps.BpeCheckpointEvery between runs to A/B the cadence.
  * `--bytes` times [[graft.operators.TextOps.bpeMergesBytes]] (the
  * char/byte-level learner — ~10× more symbols per word, so the
  * checkpoint-cadence trade needs its own numbers) instead of the
  * word-level [[graft.operators.TextOps.bpeMerges]]. */
object BpeTime {
  def main(args: Array[String]): Unit = {
    val bytes = args.contains("--bytes")
    val sfs = args.filterNot(_.startsWith("--"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- sfs) {
      val dir =
        if (sf.startsWith("/")) sf else s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      val n =
        if (bytes) graft.operators.TextOps.bpeMergesBytes(spark, dir, 64)
          .count()
        else graft.operators.TextOps.bpeMerges(spark, dir, 64).count()
      val mode = if (bytes) "bytes" else "word"
      println(f"BPE64 $mode $sf rows=$n " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
