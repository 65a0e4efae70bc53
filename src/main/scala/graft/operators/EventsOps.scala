package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Event-stream analytics over the `events` table (extension surface,
  * SURVEY §7.4): JSON prop extraction, tumbling-window aggregation, and
  * batch sessionization (gaps-and-islands). The streaming (Structured
  * Streaming) variants of the windowed aggregations live in
  * [[graft.streaming.EventStream]]; these batch forms are the
  * oracle-checkable equivalents.
  */
object EventsOps {
  import Det._

  /** `json_props`: extract the JSON payload (`events.props`, e.g.
    * '{"k": 87}') and aggregate per event type. `get_json_object` is
    * codegen'd and stays inside WholeStageCodegen — no UDF. Sums are over
    * exact longs. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** `event_hourly`: tumbling 1-hour windowed aggregation — count, distinct
    * users, exact cents-sum of value (`window($"ts","1 hour")` in the
    * streaming variant; `date_trunc` here so DuckDB can mirror it).
    * Partial aggregation makes this a single narrow shuffle keyed on
    * (hour, event_type) — the classic streaming-friendly rollup. */
  def eventHourly(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        sumCents(col("value")).as("sum_value"))
      .orderBy("hour", "event_type")

  /** `event_sliding`: sliding-window aggregation (1 h window, 30 min
    * slide) in batch form: each event belongs to exactly two window
    * starts — its 30-min-floor and the one before — so the window
    * assignment is a 2-way explode followed by one grouped aggregation,
    * exactly how Spark's own `window(ts, '1 hour', '30 minutes')`
    * generator expands (the streaming twin lives in
    * [[graft.streaming.EventStream]]). µs-integer window math →
    * engine-exact. */
  def eventSliding(spark: SparkSession, dir: String): DataFrame = {
    val slideUs = 1800000000L // 30 min
    Tables.events(spark, dir)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("t0", expr(s"(us div $slideUs) * $slideUs"))
      .select(col("event_type"), col("user_id"),
        explode(array(col("t0"), col("t0") - slideUs)).as("w_us"))
      .groupBy(timestamp_micros(col("w_us")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"))
      .orderBy("window_start", "event_type")
  }

  /** `event_funnel`: ordered-step conversion — users whose FIRST view
    * precedes their first click precedes their first purchase. The
    * min-timestamp formulation turns sequence matching into one
    * conditional aggregation: no self-joins, no per-user sort, one
    * shuffle on user_id with map-side partial mins — the shape that
    * survives a 100× scale-up where the naive 3-way self-join on user
    * would not. µs-integer comparisons → engine-exact. */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    def firstOf(t: String) =
      min(when(col("event_type") === t, col("us")))
    e.groupBy("user_id")
      .agg(firstOf("view").as("first_view_us"),
        firstOf("click").as("first_click_us"),
        firstOf("purchase").as("first_purchase_us"))
      .filter(col("first_view_us") < col("first_click_us") &&
        col("first_click_us") < col("first_purchase_us"))
      .orderBy("user_id")
  }

  /** `event_retention`: cohort retention — users cohorted by their first
    * active day; for every (cohort_day, day_offset) cell, the distinct
    * users from that cohort active that many days later. Two grouped
    * aggregations and one equi-join on user_id — day-granular dates and
    * distinct counts, all engine-exact. Scale: `acts` is
    * one-row-per-(user, day) (bounded by users × horizon), both
    * aggregations partial; no window, no self-join on the raw stream. */
  def eventRetention(spark: SparkSession, dir: String): DataFrame = {
    val acts = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val firsts = acts.groupBy("user_id").agg(min("day").as("cohort_day"))
    acts.join(firsts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** `sessionize`: batch session windows with a 30-minute inactivity gap —
    * gaps-and-islands: flag session starts via lag, running-sum to a
    * session id, aggregate per (user, session). All µs-integer arithmetic →
    * engine-exact. Equal-timestamp ties don't affect the running sum, so
    * the result is deterministic despite the non-unique sort key.
    * Scale: one shuffle on user_id; per-user state is a sort — exactly how
    * `session_window` executes in Structured Streaming. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 1800L * 1000000L // 30 min
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    val flagged = e.withColumn("new_sess",
      when(col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1)
        .when(lag("ts_us", 1).over(w).isNull, 1)
        .otherwise(0))
    flagged
      .withColumn("session_id", sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"))
      .orderBy("user_id", "session_id")
  }
}
