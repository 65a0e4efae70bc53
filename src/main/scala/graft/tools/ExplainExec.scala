package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump EXECUTED (post-AQE) physical plans for declared queries — the
  * runtime complement of [[Explain]]: runs each query to completion so
  * AQE's final join-strategy elections (broadcast vs shuffled hash vs
  * sort-merge) are visible, then prints the adaptive plan plus a
  * one-line strategy census. This is how the "AQE still elects
  * broadcast for the unhinted size joins" claims in SCALING.md are
  * checked at any scale. Usage:
  *   runMain graft.tools.ExplainExec <sfDir> [query...]
  */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSet
      else graft.SparkEntry.queries.keySet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.filter(q => names(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val df = fn(spark, dir)
        df.collect() // materialize so AQE finalizes every stage
        val p = df.queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(p).size
        println(s"\n===== $name (executed, $dir) =====")
        println(s"joins: broadcastHash=${n("BroadcastHashJoin")} " +
          s"sortMerge=${n("SortMergeJoin")} " +
          s"shuffledHash=${n("ShuffledHashJoin")} " +
          s"nestedLoop=${n("BroadcastNestedLoopJoin")} " +
          s"cartesian=${n("CartesianProduct")} " +
          s"exchanges=${n("Exchange ")}")
        if (sys.env.contains("SPARK_GRAFT_EXPLAIN_FULL")) println(p)
      }
    spark.stop()
  }
}
