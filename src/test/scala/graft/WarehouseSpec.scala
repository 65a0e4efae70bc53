package graft

import org.apache.spark.sql.functions._

import graft.sources.Warehouse

/** Proves the bucketed-join claim: a self-join on the bucket key plans
  * with NO shuffle (no Exchange), while the raw-parquet self-join
  * shuffles both sides. */
class WarehouseSpec extends SparkSpec {

  test("bucketed self-join is shuffle-free; raw self-join is not") {
    val oi = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Warehouse.materializeBucketed(spark, oi, "oi_bucketed", "l_orderkey",
        buckets = 4)
      val b = Warehouse.table(spark, "oi_bucketed")
      val bucketedPlan = b.as("a").join(b.as("b"), Seq("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange"), bucketedPlan)

      val rawPlan = oi.as("a").join(oi.as("b"), Seq("l_orderkey"))
        .queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"), rawPlan)

      // same join result either way
      val viaBucket = b.as("a").join(b.as("b"), Seq("l_orderkey")).count()
      val viaRaw = oi.as("a").join(oi.as("b"), Seq("l_orderkey")).count()
      assert(viaBucket == viaRaw)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS oi_bucketed")
    }
  }
}
