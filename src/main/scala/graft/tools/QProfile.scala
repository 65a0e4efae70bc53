package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold/warm timing probe for declared queries — separates a query's
  * first-run cost (which materializes any shared cached builders) from
  * its steady-state cost. Usage:
  *   runMain graft.tools.QProfile <sfDir> <query> [query...]
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
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
    spark.range(1000000L).selectExpr("sum(id)").collect() // warm the JVM
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"QPROF $name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs" +
          s" rows=$n")
      }
    }
    spark.stop()
  }
}
