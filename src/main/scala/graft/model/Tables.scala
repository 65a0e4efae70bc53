package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers over the driver testdata directory layout
  * (`TESTDATA.md`): one parquet file per table under `<sfDir>/`.
  *
  * Spark-first posture: we hand Catalyst a plain parquet scan and rely on
  * column pruning + predicate pushdown (visible as `ReadSchema` /
  * `PushedFilters` in `explain("formatted")`). At 100 TB the same call
  * works unchanged against a partitioned table root; nothing here assumes
  * single-file input. Reference analogue: the `SELECT *` extracts at
  * `tp2/app/etl.py:201-206` — except we never materialize all columns;
  * pruning happens per-query.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")

  /** `events.ts` normalized to Spark's µs TimestampType regardless of the
    * physical encoding, which has varied across testdata generations:
    * int64 nanoseconds (either a plain BIGINT column as
    * [[graft.tools.GenScale]] writes, or parquet timestamp_ns surfaced as
    * a long under `spark.sql.legacy.parquet.nanosAsLong=true` — the graft
    * mains and the test session builder still set that conf so ns files
    * stay readable), or a native µs timestamp (tz-less reads as NTZ).
    * Nanos truncate to µs — the same truncation DuckDB applies casting
    * timestamp_ns → TIMESTAMP; NTZ casts to the UTC session timestamp
    * unchanged — exactly how DuckDB reads a tz-less µs column. Either
    * way the VALUES agree with the oracle. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _: TimestampType => raw
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected int64 nanos or timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** S2's live-database analogue (SURVEY §2.1): the reference extracts
    * Postgres tables over a single cursor (`tp2/app/etl.py:201-206` —
    * `SELECT *` + fetchall); on Spark the same extraction is a JDBC scan.
    * Filters and column pruning push down to the database as SQL
    * (JdbcSpec asserts the pushed filter reaches the scan), and passing
    * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions` splits
    * the extract into parallel range queries — the scale-out ingest
    * shape the reference's fetchall loop can't express. */
  def jdbc(s: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(
        s.read.format("jdbc").option("url", url).option("dbtable", table)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
}
