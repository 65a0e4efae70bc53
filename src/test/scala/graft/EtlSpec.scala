package graft

import org.apache.spark.sql.functions._

import graft.sources.Etl

/** ETL pipeline parity: node/edge store written with the reference's
  * expected shape (FIXTURES §A.3 ETL expectations, scaled up). */
class EtlSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

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

  test("JSONL and CSV sources land on the parquet schema; operators are source-agnostic") {
    import graft.sources.TextSources
    val base = java.nio.file.Files.createTempDirectory("graft-textsrc")
    val docs = graft.model.Tables.documents(spark, dir)
    docs.write.mode("overwrite").json(s"$base/jsonl")
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val (fromJson, badJson) =
      TextSources.quarantine(TextSources.documentsJsonl(spark, s"$base/jsonl"))
    val (fromCsv, badCsv) =
      TextSources.quarantine(TextSources.documentsCsv(spark, s"$base/csv"))
    assert(badJson.isEmpty && badCsv.isEmpty)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[(Long, String, String, String, Long)].collect().toSet
    val fromParquet = key(docs)
    assert(key(fromJson) == fromParquet && key(fromCsv) == fromParquet)
    // the same operator over all three sources gives identical results —
    // the property that makes the ingest formats interchangeable
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextOps.spanDupRateOf(df)
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
    assert(gate(fromJson) == gate(docs) && gate(fromCsv) == gate(docs))
  }

  test("malformed JSONL lines quarantine; clean rows survive intact") {
    import graft.sources.TextSources
    val base = java.nio.file.Files.createTempDirectory("graft-textsrc-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/part-0.jsonl"),
      """{"doc_id": 1, "text": "the a of", "lang": "en", "source": "s", "n_chars": 8}
        |this line is not json at all
        |{"doc_id": 2, "text": "and in", "lang": "en", "source": "s", "n_chars": 6}
        |{"doc_id": broken json}
        |""".stripMargin)
    val (good, bad) =
      TextSources.quarantine(TextSources.documentsJsonl(spark, base.toString))
    assert(good.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val quarantined = bad.as[String].collect()
    assert(quarantined.length == 2)
    assert(quarantined.exists(_.contains("not json at all")))
  }

  test("chunker batches partition the input deterministically (S8)") {
    val docs = graft.model.Tables.documents(spark, dir).select("doc_id")
    val total = docs.count()
    val nb = Etl.nBatches(docs, chunkSize = 10)
    assert(nb == (total + 9) / 10)
    val assigned = Etl.chunkAssignOf(docs, col("doc_id"), nb)
    // complete + in-range: every row lands in exactly one batch
    assert(assigned.count() == total)
    val perBatch = assigned.groupBy("batch").count()
      .as[(Long, Long)].collect().toMap
    assert(perBatch.keys.forall(b => b >= 0 && b < nb))
    assert(perBatch.values.sum == total)
    // stable under recomputation and row order (hash of own key only)
    val again = Etl.chunkAssignOf(
      docs.orderBy(desc("doc_id")), col("doc_id"), nb)
      .as[(Long, Long)].collect().toSet
    assert(assigned.as[(Long, Long)].collect().toSet == again)
    // the iterator view: lazy per-batch filters, disjoint and complete
    val sizes = Etl.batches(docs, col("doc_id"), chunkSize = 10)
      .map(_.count()).toSeq
    assert(sizes.length == nb && sizes.sum == total)
  }
}
