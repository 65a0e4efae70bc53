package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, split}

/** Times the BPE depth workload per sf dir — the instrument behind
  * SCALING.md's bpe_merges cadence A/B (round 11; byte-level mode
  * round 13; single-task-vs-distributed path A/B round 17). Usage:
  * runMain graft.tools.BpeTime [--bytes] [--merges=N] [--local=MAX]
  *   <sfName...>   (e.g. sf0.01)
  * `--bytes` times the char/byte-level learner (~10× more symbols per
  * word than word-level, and the only granularity whose loop is
  * vocabulary-bounded). `--merges=N` sets the merge budget (default
  * 64). `--local=MAX` forces the byte-level path dispatch: 0 = the
  * distributed one-job-per-round loop, a huge value = the single-task
  * incremental learner; omitted = the production default threshold.
  * Paths are timed via the un-memoized slice form so repeated cells in
  * one JVM re-execute the learn. Edit TextOps.BpeCheckpointEvery
  * between runs to A/B the checkpoint cadence (distributed path). */
object BpeTime {
  def main(args: Array[String]): Unit = {
    val bytes = args.contains("--bytes")
    val merges = args.collectFirst {
      case a if a.startsWith("--merges=") => a.stripPrefix("--merges=").toInt
    }.getOrElse(64)
    val localMax = args.collectFirst {
      case a if a.startsWith("--local=") => a.stripPrefix("--local=").toLong
    }
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
        if (bytes) {
          val corpus = graft.model.Tables.documents(spark, dir)
            .select(split(col("text"), " ").as("t"))
          graft.operators.TextOps.bpeMergesBytesOf(spark, corpus, merges,
            localMaxSymbols = localMax.getOrElse(
              graft.operators.TextOps.BpeLocalMaxSymbols))
            .count()
        } else graft.operators.TextOps.bpeMerges(spark, dir, merges).count()
      val mode =
        if (!bytes) "word"
        else localMax match {
          case Some(0L) => "bytes/dist"
          case Some(_)  => "bytes/local"
          case None     => "bytes/default"
        }
      println(f"BPE$merges%d $mode $sf rows=$n " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
