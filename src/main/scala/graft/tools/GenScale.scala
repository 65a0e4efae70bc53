package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.Tables

/** One-off LOCAL scale-up generator for scaling measurements beyond the
  * driver's sf0.1 (round-5 verdict item 6): writes `documents`, `orders`
  * and `lineitem` parquet at `factor`× the sf0.1 row counts, preserving
  * the distributional shape the real generator uses (TESTDATA.md /
  * FIXTURES.md): documents draw 10–100 tokens uniformly from the REAL
  * sf0.1 token vocabulary (read at run time, not hardcoded), languages
  * and sources keep their cardinalities (5 / 20), orders and lineitem
  * keep the per-customer (10 orders) and per-order (4 items) densities.
  * Only the tables the shuffle-heavy scaling queries read are generated
  * (`jaccard_sim` ⇒ orders+lineitem; `corpus_prepare_full` /
  * `dedup_simhash_pairs` ⇒ documents).
  *
  * Fully deterministic WITHOUT partitioning sensitivity: every column is
  * a pure hash of the row id (`xxhash64(id, salt)`), never `rand()` —
  * re-running at any parallelism yields byte-identical values.
  *
  * Usage: runMain graft.tools.GenScale <outDir> [factor=10] [srcDir]
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val src = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = 5000L * factor
    val nCust = 15000L * factor
    val nOrders = 150000L * factor
    val nLine = 600000L * factor
    val nPart = 20000L * factor

    val vocab = Tables.documents(spark, src)
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().as[String].collect().sorted
    val vlit = vocab.map(t => s"'$t'").mkString("array(", ", ", ")")
    spark.range(nDocs).selectExpr(
        "id AS doc_id",
        s"""concat_ws(' ',
           |  transform(sequence(1, 10 + cast(pmod(xxhash64(id, 1), 91) AS INT)),
           |    j -> element_at($vlit,
           |           cast(pmod(xxhash64(id, j), ${vocab.length}) + 1 AS INT))))
           |  AS text""".stripMargin,
        "element_at(array('en','fr','de','es','zh')," +
          " cast(pmod(xxhash64(id, 2), 5) + 1 AS INT)) AS lang",
        "concat('src', pmod(xxhash64(id, 3), 20)) AS source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    spark.range(nOrders).selectExpr(
        "id AS o_orderkey",
        s"pmod(xxhash64(id, 10), $nCust) AS o_custkey")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    spark.range(nLine).selectExpr(
        s"pmod(xxhash64(id, 20), $nOrders) AS l_orderkey",
        s"pmod(xxhash64(id, 21), $nPart) AS l_partkey")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // events at factor× (round-6 scaling targets event_asof /
    // event_window_join): same shape as the driver's table — 150
    // users × 30 days at sf0.1, both scaled by √factor so per-user
    // event density (the as-of window's per-key sort size and the
    // range join's per-(user, hour) bucket occupancy) grows with the
    // data instead of keeping the keys constant-fat. ts is a plain
    // int64 of NANOS — the same VALUES Tables.events reads from the
    // real table under nanosAsLong, but WITHOUT the TIMESTAMP(NANOS)
    // logical annotation Spark cannot write (so this dir feeds
    // QProfile/Bench only; the DuckDB oracles CAST(ts AS TIMESTAMP)
    // and would reject the bare BIGINT — oracle-gate at the real sf
    // dirs, bench here)
    val nEvents = 100000L * factor
    val nUsers = math.max(1L, math.round(150 * math.sqrt(factor.toDouble)))
    val spanNs = math.round(30 * math.sqrt(factor.toDouble)) * 86400L * 1000000000L
    spark.range(nEvents).selectExpr(
        "id AS event_id",
        s"1704067200000000000 + pmod(xxhash64(id, 30), $spanNs) AS ts",
        s"pmod(xxhash64(id, 31), $nUsers) AS user_id",
        "element_at(array('view','view','view','click','click','purchase')," +
          " cast(pmod(xxhash64(id, 32), 6) + 1 AS INT)) AS event_type",
        "cast(pmod(xxhash64(id, 33), 10000) AS DOUBLE) / 100 AS value",
        "concat('{\"k\": ', pmod(xxhash64(id, 34), 100), '}') AS props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    println(s"GENSCALE wrote $out: documents=$nDocs orders=$nOrders " +
      s"lineitem=$nLine events=$nEvents/users=$nUsers (factor $factor " +
      s"over $src shape)")
    spark.stop()
  }
}
