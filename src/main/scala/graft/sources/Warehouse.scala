package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed materialization — the co-located-join lever for 100 TB
  * (SURVEY §7.5.6, spark_guide partitioning notes).
  *
  * The engine's hottest joins are self-joins and repeated joins on a
  * stable key: order-items on `l_orderkey` (co-occurrence), incidence on
  * `customer_id` (jaccard), edges on `src` (PageRank). On a cluster these
  * each shuffle the big table every query. Bucketing the table once by
  * the join key (`bucketBy(n, key).sortBy(key)`) makes every subsequent
  * equi-join on that key shuffle-free: Spark plans a sort-merge join over
  * co-located buckets with NO Exchange on either side — verified by
  * `WarehouseSpec` (the bucketed self-join plan contains no shuffle).
  *
  * At 100 TB: bucket counts sized to ~128–512 MB per bucket per the
  * target cluster; the bucketed table replaces the raw scan in the
  * operator builders — the query shapes are unchanged because bucketing
  * is a storage property, not a plan rewrite.
  */
object Warehouse {

  /** Materialize `df` as a bucketed+sorted table (idempotent overwrite).
    * Table lives in the session's `spark.sql.warehouse.dir`. */
  def materializeBucketed(spark: SparkSession, df: DataFrame, table: String,
      bucketKey: String, buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketKey)
      .sortBy(bucketKey)
      .format("parquet")
      .saveAsTable(table)

  /** Read back a bucketed table (bucket metadata comes from the catalog,
    * enabling the shuffle-free join). */
  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
