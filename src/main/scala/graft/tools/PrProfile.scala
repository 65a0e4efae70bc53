package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.algo.PageRank

/** One-off phase profiler for pagerank_global at a given sf dir. */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val edges = t("build-edges-df") { PageRank.productEdges(spark, dir) }
    t("edges-count") { edges.count() }
    val v = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("id")).withColumn("pers", lit(1.0))
    t("run") { PageRank.run(spark, v, edges).count() }
    spark.stop()
  }
}
