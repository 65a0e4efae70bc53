package graft

import org.apache.spark.sql.functions._

import graft.sources.Etl

/** ETL pipeline parity: node/edge store written with the reference's
  * expected shape (FIXTURES §A.3 ETL expectations, scaled up). */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("ETL writes a typed graph store; counts reconcile with the tables") {
    val out = java.nio.file.Files.createTempDirectory("graft-etl").toString
    // every reference test greps for this sentinel (tp2/app/test.py:163)
    val stdout = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(stdout)) {
      Etl.run(spark, "/root/testdata/sf0.001", out)
    }
    assert(stdout.toString.contains("ETL done."), stdout.toString)

    val nodes = spark.read.parquet(s"$out/nodes")
    val byLabel = nodes.groupBy("label").count()
      .as[(String, Long)].collect().toMap
    val customers = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet").count()
    val parts = spark.read
      .parquet("/root/testdata/sf0.001/part.parquet").count()
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet").count()
    assert(byLabel("Customer") == customers)
    assert(byLabel("Product") == parts)
    assert(byLabel("Order") == orders)
    assert(byLabel("Category") > 0)
    // node ids unique per label (MERGE-on-id semantics)
    assert(nodes.count() ==
      nodes.select("label", "id").distinct().count())

    val edges = spark.read.parquet(s"$out/edges")
    val byType = edges.groupBy("rel_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("PLACED") == orders)
    assert(byType("IN_CATEGORY") == parts)
    assert(byType.contains("CONTAINS"))
    // dynamic event edges present with the mapped types
    assert(byType.keySet.intersect(
      Set("VIEWED", "CLICKED", "PURCHASED")).nonEmpty)

    // the partitioned layout must PRUNE: a per-relationship scan reads
    // only its rel_type directory (the reason the store partitions by
    // type at all — at 100 TB this is the difference between one
    // directory and the full edge set)
    val pruned = edges.filter(col("rel_type") === "PLACED")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("rel_type"), plan)
    assert(pruned.count() == orders)
  }
}
