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

  /** `events.ts` is nanosecond-precision in the parquet (TESTDATA.md);
    * Spark's TimestampType is µs. The SESSION must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (all graft mains and the
    * test session builder set it — a reader must not mutate session conf
    * as a side effect); this reader then truncates the nano longs to µs —
    * the same truncation DuckDB applies casting timestamp_ns → TIMESTAMP,
    * so oracle comparisons agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
      == "true",
      "session must be built with spark.sql.legacy.parquet.nanosAsLong=true" +
        " (events.parquet stores ns timestamps)")
    read(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
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
