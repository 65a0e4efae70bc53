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

  /** `event_anomaly`: per-event-type hourly volume outliers — the
    * pipeline-monitoring pass over the event stream: for each type,
    * z-score every hourly bucket count against that type's own
    * mean/stddev and flag |z| ≥ 2 (bot bursts, ingestion gaps, replay
    * storms).
    *
    * Engine-deterministic variance WITHOUT float accumulation: the
    * moments Σx and Σx² are EXACT LONGS (per-hour counts are
    * integers), so sample variance is the single fixed double tree
    * `(nb·Σx² − (Σx)²) / (nb·(nb−1))` — one cast, one division — and
    * the zero-variance guard is an INTEGER comparison
    * (`nb·Σx² − (Σx)² > 0`), immune to float-boundary drift. The
    * anomaly flag compares the ROUNDED z, so both engines decide the
    * boundary on the same 6-dp value. Overflow bound: Σx² stays exact
    * below ~3·10⁹ events per bucket; past that, widen the moment
    * columns to DECIMAL(38,0) (documented, not hit at any tested sf).
    *
    * Scale: one map-side-combined shuffle to (type, hour) counts, one
    * tiny per-type moment aggregate, one unhinted join back (the
    * stats side is #types rows — data-dependent, so AQE elects the
    * strategy; bounded-relation rule). Types with a single bucket have
    * no sample variance and are excluded by the `nb ≥ 2` filter. */
  def eventAnomaly(spark: SparkSession, dir: String,
      zThresh: Double = 2.0): DataFrame =
    eventAnomalyOf(Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n")), zThresh)

  /** [[eventAnomaly]] over any (event_type, hour, n) bucket-count
    * relation — the fixture-testable form. */
  private[graft] def eventAnomalyOf(hourly: DataFrame,
      zThresh: Double = 2.0): DataFrame = {
    val stats = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("nb"), sum("n").as("sx"),
        sum(col("n") * col("n")).as("sxx"))
      .filter(col("nb") >= 2)
    val num = col("nb") * col("sxx") - col("sx") * col("sx")
    val variance = num.cast("double") / (col("nb") * (col("nb") - lit(1)))
    val mean = col("sx").cast("double") / col("nb")
    val z = when(num > 0,
      round((col("n") - mean) / sqrt(variance), 6)).otherwise(0.0)
    hourly.join(stats, "event_type")
      .select(col("event_type"), col("hour"), col("n"), z.as("z"))
      .withColumn("is_anomaly", abs(col("z")) >= lit(zThresh))
      .orderBy("event_type", "hour")
  }

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

  /** `event_asof`: last-touch attribution as an AS-OF JOIN — each
    * purchase matched to the same user's most recent view/click at or
    * before the purchase timestamp (ties at equal µs include the touch;
    * among equal-time touches the highest event_id wins). Purchases with
    * no prior touch keep NULL touch columns (left as-of).
    *
    * Spark has no native as-of join; the classic scalable formulation is
    * UNION + ORDERED WINDOW rather than an inequality join: tag touches
    * kind 0 and purchases kind 1, sort each user's merged stream once by
    * (us, kind, event_id), and carry the last non-null touch payload
    * forward with `last(ignoreNulls)`. One shuffle on user_id and a
    * per-user sort — O(E log E/p) — where the naive
    * `t.us <= p.us` theta-join is a per-user cross product (a user with
    * T touches and P purchases costs T·P pairs before the per-purchase
    * max; the window form costs T+P rows, full stop). This is exactly
    * how a 100 TB attribution job must run: the merged-stream sort is
    * the same shape [[sessionize]] already pays, and skewed users
    * degrade to a bigger sort, never a quadratic join. */
  def eventAsof(spark: SparkSession, dir: String): DataFrame =
    eventAsofOf(Tables.events(spark, dir))

  /** [[eventAsof]] over any (event_id, user_id, event_type, ts)
    * relation — the testable form (hot-user skew cases build synthetic
    * streams; a skewed user degrades to a bigger per-partition sort,
    * never a quadratic join, and ExtensionSpec pins that closed-form). */
  private[graft] def eventAsofOf(events: DataFrame): DataFrame = {
    val e = events
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("kind",
        when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("touch", when(col("kind") === 0,
        struct(col("event_id").as("touch_event_id"),
          col("event_type").as("touch_type"), col("us").as("touch_us"))))
    val w = Window.partitionBy("user_id")
      .orderBy("us", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    e.withColumn("t", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
        col("t.touch_event_id"), col("t.touch_type"), col("t.touch_us"),
        (col("us") - col("t.touch_us")).as("gap_us"))
      .orderBy("event_id")
  }

  /** `event_window_join`: attribution-window RANGE JOIN — for each
    * purchase, every view/click by the same user in the preceding hour
    * (0 ≤ gap ≤ 1 h), aggregated to counts and the closest-touch gap;
    * purchases with an empty window keep zero counts (left semantics via
    * count join-back).
    *
    * The scalable range-join formulation is TIME BUCKETING: both sides
    * key by (user_id, floor(us / 1h)); a purchase probes exactly its own
    * bucket and the one before (any touch within the hour lands in one
    * of the two — and in only one, so nothing double-counts), turning
    * the inequality join into a 2-fan-out equi-join + residual filter.
    * Candidate work is bounded by per-(user, hour) occupancy — the same
    * guard-by-bucket posture as the LSH dedup tier — instead of the
    * unbounded per-user cross product a raw theta-join plans (Spark
    * executes non-equi joins as BroadcastNestedLoop/cartesian; at 100 TB
    * that is the difference between a shuffle join and a non-starter).
    * The window length trades fan-out (always 2) against bucket width
    * exactly like LSH band width. */
  def eventWindowJoin(spark: SparkSession, dir: String): DataFrame =
    eventWindowJoinOf(Tables.events(spark, dir))

  /** [[eventWindowJoin]] over any (event_id, user_id, event_type, ts)
    * relation with a parameterized window — the testable form
    * (PropertySpec replays random streams against a driver-side
    * reference with a tiny window, hammering the bucket boundaries). */
  private[graft] def eventWindowJoinOf(events: DataFrame,
      winUs: Long = 3600L * 1000000L): DataFrame = {
    val e = events
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val touches = e.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("t_type"),
        col("us").as("t_us"),
        expr(s"us div $winUs").as("bucket"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us").as("p_us"))
    val probes = purchases.select(col("event_id"), col("user_id"),
      col("p_us"),
      explode(array(expr(s"p_us div $winUs"),
        expr(s"p_us div $winUs - 1"))).as("bucket"))
    val hits = probes.join(touches, Seq("user_id", "bucket"))
      .filter(col("t_us") <= col("p_us") &&
        col("t_us") >= col("p_us") - winUs)
    val agg = hits.groupBy("event_id")
      .agg(count(lit(1)).as("n_touch"),
        sum(when(col("t_type") === "view", 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_type") === "click", 1L).otherwise(0L)).as("n_click"),
        min(col("p_us") - col("t_us")).as("min_gap_us"))
    purchases.join(agg, Seq("event_id"), "left_outer")
      .select(col("event_id"), col("user_id"), col("p_us").as("purchase_us"),
        coalesce(col("n_touch"), lit(0L)).as("n_touch"),
        coalesce(col("n_view"), lit(0L)).as("n_view"),
        coalesce(col("n_click"), lit(0L)).as("n_click"),
        col("min_gap_us"))
      .orderBy("event_id")
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
