package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventsOps, Multimodal}
import graft.streaming.EventStream

/** Streaming/batch parity + multimodal plumbing tests. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("corpus split columns are stream-composable (stateless parity)") {
    // splitBucket/splitOf are pure hash columns — the same expressions
    // drop into a readStream pipeline unchanged, the practical payoff
    // of assignment-as-column over assignment-as-query
    val schema = graft.model.Tables.documents(spark, dir).schema
    // the file streaming source wants a directory to watch
    val watched = java.nio.file.Files.createTempDirectory("graft-split-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      watched.resolve("documents.parquet"))
    val stream = spark.readStream.schema(schema)
      .parquet(watched.toString)
      .select(col("doc_id"),
        graft.operators.Corpus.splitBucket(col("doc_id")).as("bucket"),
        graft.operators.Corpus.splitOf(col("doc_id")).as("split"))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("split_stream").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("split_stream")
        .as[(Long, Long, String)].collect().toSet
      val batch = graft.operators.Corpus.splitAssign(spark, dir)
        .as[(Long, Long, String)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming hourly agg reconciles with the batch rollup") {
    val q = EventStream.runToMemory(
      EventStream.hourlyAgg(EventStream.readEvents(spark, dir)),
      "hourly_stream")
    try {
      val streamed = spark.table("hourly_stream")
        .select(col("hour"), col("event_type"), col("n"))
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      val batch = EventsOps.eventHourly(spark, dir)
        .select(col("hour"), col("event_type"), col("n"))
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming session windows match batch sessionize row-for-row") {
    val q = EventStream.runToMemory(
      EventStream.sessionAgg(EventStream.readEvents(spark, dir)),
      "session_stream")
    try {
      val total = spark.table("session_stream")
        .agg(sum("n_events")).collect()(0).getLong(0)
      val events = graft.model.Tables.events(spark, dir).count()
      assert(total == events) // every event lands in exactly one session
      // FULL parity with the batch gaps-and-islands form: same sessions,
      // same per-session boundaries and counts. session_window's end is
      // last-event + gap, so batch duration_us = end − start − gap.
      val gapUs = 1800L * 1000000L
      val streamed = spark.table("session_stream")
        .select(col("user_id"), unix_micros(col("start")).as("start_us"),
          (unix_micros(col("end")) - unix_micros(col("start")) - gapUs)
            .as("duration_us"),
          col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val batch = EventsOps.sessionize(spark, dir)
        .select(col("user_id"), col("start_us"), col("duration_us"),
          col("n_events"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming sliding window matches the batch 2-way-explode form") {
    val sliding = EventStream.readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
    val q = EventStream.runToMemory(sliding, "sliding_stream")
    try {
      val streamed = spark.table("sliding_stream")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      val batch = EventsOps.eventSliding(spark, dir)
        .select(col("window_start"), col("event_type"), col("n"))
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("flatMapGroupsWithState totals reconcile with the batch aggregate") {
    val updates = EventStream.statefulUserTotals(
      EventStream.readEvents(spark, dir))
    val q = updates.toDF().writeStream
      .outputMode("update").format("memory").queryName("user_state").start()
    try {
      q.processAllAvailable()
      // keep the LAST update per user (update mode emits per-batch rows)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(desc("events"))
      val finalState = spark.table("user_state")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "events", "weight")
        .as[(Long, Long, Double)].collect()
        .map { case (u, e, wt) => u -> ((e, wt)) }.toMap
      val batchWeights = graft.operators.Relational
        .eventWeights(spark, dir).as[(Long, Double)].collect().toMap
      val batchCounts = graft.model.Tables.events(spark, dir)
        .groupBy("user_id").count().as[(Long, Long)].collect().toMap
      batchCounts.foreach { case (u, c) =>
        assert(finalState(u)._1 == c, s"user $u count")
      }
      batchWeights.foreach { case (u, wt) =>
        assert(finalState(u)._2 == wt, s"user $u weight") // dyadic → exact
      }
    } finally q.stop()
  }

  test("streaming dedup drops replayed events, keeps one row per id") {
    // a source dir whose events file contains every event TWICE (replay)
    val src = graft.model.Tables.events(spark, dir)
      .select(col("event_id"), expr("unix_micros(ts) * 1000").as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit("{}").as("props"))
    // the testdata layout ships events.parquet as a single FILE (the
    // stream source's pathGlobFilter matches leaf file names) — write to
    // a staging dir and move the single part file into place
    val tmp = java.nio.file.Files.createTempDirectory("graft-replay").toString
    src.unionAll(src).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/staging")
    val part = new java.io.File(s"$tmp/staging").listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$tmp/events.parquet"))
    val q = EventStream.dedupEvents(EventStream.readEvents(spark, tmp))
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_stream").start()
    try {
      q.processAllAvailable()
      val unique = graft.model.Tables.events(spark, dir)
        .select("event_id").distinct().count()
      assert(spark.table("dedup_stream").count() == unique)
      assert(spark.table("dedup_stream")
        .groupBy("event_id").count().filter(col("count") > 1).count() == 0)
    } finally q.stop()
  }

  /** (event_id, touch...) projection shared by the as-of parity tests. */
  private def asofKeyed(df: org.apache.spark.sql.DataFrame) = df
    .select("event_id", "touch_event_id", "touch_type", "touch_us")
    .collect()
    .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
      Option(r.get(3)))).toSet

  /** The real events rows as (event_id, ts-ns, user_id, event_type)
    * driver-side tuples — the raw material the as-of stream tests
    * re-arrange into files. */
  private def eventTuples: Seq[(Long, Long, Long, String)] =
    graft.model.Tables.events(spark, dir)
      .select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts"),
        col("user_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq

  /** Write one parquet file of events rows into a stream-watched dir
    * (int64-ns ts — the GenScale physical layout). */
  private def writeEventFile(base: String, name: String,
      rows: Seq[(Long, Long, Long, String)]): Unit = {
    val staging = s"$base/staging-$name"
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$base/in/$name.parquet"))
  }

  private def eventFileStream(base: String,
      onePerTrigger: Boolean): org.apache.spark.sql.DataFrame = {
    val raw = spark.readStream
      .schema(EventStream.eventsSchema(org.apache.spark.sql.types.LongType))
    (if (onePerTrigger) raw.option("maxFilesPerTrigger", "1") else raw)
      .parquet(s"$base/in")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  test("streaming as-of attribution matches the batch as-of join") {
    // append-mode release is watermark-driven, so the stream tail needs
    // a flush: a far-future sentinel touch for an unused user pushes
    // the final watermark past every real event (a real pipeline's
    // source keeps flowing; a bounded harness must close the tail)
    val base = java.nio.file.Files.createTempDirectory("graft-asof-parity")
      .toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$base/in"))
    val rows = eventTuples
    val sentinel = (-1L, rows.map(_._2).max + 3600L * 1000000000L,
      -1L, "view")
    writeEventFile(base, "a", rows :+ sentinel)
    val q = EventStream.asofAttribution(eventFileStream(base, false))
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("asof_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = asofKeyed(spark.table("asof_stream"))
      val batch = asofKeyed(EventsOps.eventAsof(spark, dir))
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("as-of attribution is EXACT under out-of-order cross-batch arrival (shuffled split)") {
    // the watermark-bounded buffer contract: split the real events
    // round-robin by row index into two files — each spans the whole
    // month, so every batch-2 row is out of order against batch 1's
    // max — set the grace wider than the span, and the released
    // attributions must equal the batch operator row-for-row. The old
    // single-Touch fold missed attributions under exactly this split.
    val base = java.nio.file.Files.createTempDirectory("graft-asof-ooo")
      .toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$base/in"))
    val rows = eventTuples.sortBy(_._1)
    val (evens, odds) = rows.zipWithIndex.partition(_._2 % 2 == 0)
    val graceUs = 35L * 24 * 3600 * 1000000L // span is ~30 days
    val sentinel = (-1L, rows.map(_._2).max + (graceUs + 86400000000L) * 1000L,
      -1L, "view")
    writeEventFile(base, "a", evens.map(_._1))
    writeEventFile(base, "b", odds.map(_._1))
    writeEventFile(base, "c", Seq(sentinel))
    (Seq("a", "b") zip Seq(120000, 60000)).foreach { case (n, ago) =>
      new java.io.File(s"$base/in/$n.parquet")
        .setLastModified(System.currentTimeMillis() - ago)
    }
    val q = EventStream.asofAttribution(eventFileStream(base, true),
        graceUs = graceUs)
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("asof_ooo")
      .start()
    try {
      q.processAllAvailable()
      val streamed = asofKeyed(spark.table("asof_ooo"))
      val batch = asofKeyed(EventsOps.eventAsof(spark, dir))
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("as-of stream + state-store drain equals batch — NO sentinel rows") {
    // the sentinel-free closing of the tail boundary the two tests
    // above work around: run the stream on the REAL rows only (grace =
    // 7 days against the ~30-day span, so the watermark releases most
    // purchases in-stream and a genuine 7-day tail stays buffered),
    // stop, then drain the checkpoint's state store. released ∪
    // drained must equal the batch operator exactly, with no overlap.
    val base = java.nio.file.Files.createTempDirectory("graft-asof-drain")
      .toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$base/in"))
    writeEventFile(base, "a", eventTuples)
    val ck = s"$base/ck"
    val q = EventStream.asofAttribution(eventFileStream(base, false),
        graceUs = 7L * 24 * 3600 * 1000000L)
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("asof_drain")
      .option("checkpointLocation", ck).start()
    val streamed = try {
      q.processAllAvailable()
      asofKeyed(spark.table("asof_drain"))
    } finally q.stop()
    val drained = asofKeyed(EventStream.asofDrainTail(spark, ck).toDF())
    val batch = asofKeyed(EventsOps.eventAsof(spark, dir))
    assert(streamed.nonEmpty, "no in-stream releases: grace too wide")
    assert(drained.nonEmpty, "empty drain: tail boundary did not arise")
    assert(streamed.intersect(drained).isEmpty,
      "a purchase was both released and drained")
    assert(streamed ++ drained == batch)
  }

  test("drain refuses a TORN checkpoint (offset log ahead of commit log)") {
    // the round-12 review's decommission-drain hazard: a query killed
    // between the sink write and the commit-log write leaves offsets/
    // one batch ahead of commits/ — draining from the last COMMITTED
    // state could then double-emit (or miss) rows against a
    // non-transactional sink. Fabricate exactly that checkpoint shape
    // (run a healthy stream, then delete the newest commit file) and
    // pin the fail-fast.
    val base = java.nio.file.Files.createTempDirectory("graft-asof-torn")
      .toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$base/in"))
    writeEventFile(base, "a", eventTuples)
    val ck = s"$base/ck"
    val q = EventStream.asofAttribution(eventFileStream(base, false),
        graceUs = 7L * 24 * 3600 * 1000000L)
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("asof_torn")
      .option("checkpointLocation", ck).start()
    try q.processAllAvailable() finally q.stop()
    // healthy checkpoint drains fine
    assert(EventStream.asofDrainTail(spark, ck).count() > 0)
    // tear it: drop the newest commit marker
    val commits = new java.io.File(s"$ck/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    assert(commits.last.delete())
    val e = intercept[IllegalArgumentException] {
      EventStream.asofDrainTail(spark, ck)
    }
    assert(e.getMessage.contains("torn checkpoint"), e.getMessage)
  }

  test("as-of attribution evicts idle users (event-time timeout); post-eviction purchase attributes to nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft-asof-evict")
      .toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$base/in"))
    val dNs = 24L * 3600 * 1000000000L
    val t0 = 1740000000000000000L / dNs * dNs
    // user 1 touches at t0 then goes idle; user 2's views advance the
    // global watermark past t0 + idle (5 days) → user 1's state (touch
    // included) is evicted; the day-20 purchase then attributes to
    // nothing — the documented bounded-state trade
    writeEventFile(base, "a", Seq((1L, t0, 1L, "click"), (2L, t0, 2L, "view")))
    writeEventFile(base, "b", Seq((3L, t0 + 10 * dNs, 2L, "view")))
    // an expired timeout fires only in a batch where its key has NO
    // data — b2 is that batch (user 2 only, watermark already past
    // user 1's idle horizon after b)
    writeEventFile(base, "b2", Seq((6L, t0 + 11 * dNs, 2L, "view")))
    writeEventFile(base, "c", Seq((4L, t0 + 20 * dNs, 1L, "purchase"),
      (5L, t0 + 21 * dNs, 2L, "view")))
    (Seq("a", "b", "b2") zip Seq(180000, 120000, 60000)).foreach {
      case (n, ago) =>
        new java.io.File(s"$base/in/$n.parquet")
          .setLastModified(System.currentTimeMillis() - ago)
    }
    val q = EventStream.asofAttribution(eventFileStream(base, true),
        idleUs = 5L * 24 * 3600 * 1000000L)
      .toDF().writeStream
      .outputMode("append").format("memory").queryName("asof_evict")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("asof_evict").collect()
      assert(rows.length == 1, rows.mkString(";"))
      assert(rows(0).getAs[Long]("event_id") == 4L)
      assert(rows(0).getAs[java.lang.Long]("touch_event_id") == null,
        s"evicted touch must not attribute: ${rows(0)}")
    } finally q.stop()
  }

  test("stateful totals evict idle users and restart on return") {
    val base = java.nio.file.Files.createTempDirectory("graft-tot-evict")
      .toString
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$base/in"))
    val dNs = 24L * 3600 * 1000000000L
    val t0 = 1750000000000000000L / dNs * dNs
    writeEventFile(base, "a", Seq((1L, t0, 1L, "view"),
      (2L, t0, 1L, "click"), (3L, t0, 2L, "view")))
    writeEventFile(base, "b", Seq((4L, t0 + 10 * dNs, 2L, "view")))
    // the eviction fires in b2's batch (user 1 idle + no data there)
    writeEventFile(base, "b2", Seq((6L, t0 + 11 * dNs, 2L, "view")))
    writeEventFile(base, "c", Seq((5L, t0 + 20 * dNs, 1L, "purchase")))
    (Seq("a", "b", "b2") zip Seq(180000, 120000, 60000)).foreach {
      case (n, ago) =>
        new java.io.File(s"$base/in/$n.parquet")
          .setLastModified(System.currentTimeMillis() - ago)
    }
    val q = EventStream.statefulUserTotals(eventFileStream(base, true),
        idleUs = 5L * 24 * 3600 * 1000000L)
      .toDF().writeStream
      .outputMode("update").format("memory").queryName("tot_evict")
      .start()
    try {
      q.processAllAvailable()
      val u1 = spark.table("tot_evict").filter(col("user_id") === 1L)
        .select("events", "weight")
        .as[(Long, Double)].collect().toSet
      // batch a's running total (2 events, 1.5), then — after the
      // day-10 watermark advance evicts the 5-day-idle user — the
      // day-20 purchase RESTARTS at (1, 2.0); without eviction it
      // would read (3, 3.5)
      assert(u1 == Set((2L, 1.5), (1L, 2.0)), u1.toString)
    } finally q.stop()
  }

  test("as-of attribution carries touch state across micro-batches") {
    val base = java.nio.file.Files.createTempDirectory("graft-asof-xbatch")
    val watched = s"$base/in"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    def writeEvents(name: String,
        rows: Seq[(Long, Long, Long, String)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
    }
    val t0 = 1700000000000000000L // ns
    // batch a: the winning touch (higher event_id) plus user 8's
    // EQUAL-timestamp touch whose tied sibling arrives in batch b with
    // a LOWER event_id — the cross-batch tie the monotone state guard
    // must resolve exactly like the batch window order (highest
    // event_id wins at equal time, regardless of arrival batch)
    writeEvents("a", Seq((100L, t0, 7L, "view"), (105L, t0, 8L, "view"),
      // user 9: batch a holds a FUTURE touch (t0+120s) relative to the
      // purchase arriving out-of-order in batch b (t0+60s) — the
      // fail-safe contract: no attribution, never a negative gap
      (110L, t0 + 120L * 1000000000L, 9L, "view")))
    writeEvents("b", Seq((200L, t0 + 60L * 1000000000L, 7L, "purchase"),
      (103L, t0, 8L, "click"),
      (205L, t0 + 60L * 1000000000L, 8L, "purchase"),
      (210L, t0 + 60L * 1000000000L, 9L, "purchase")))
    new java.io.File(s"$watched/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    val stream = spark.readStream
      .schema(EventStream.eventsSchema(org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", "1").parquet(watched)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStream.asofAttribution(stream).toDF().writeStream
      .outputMode("append").format("memory").queryName("asof_xbatch")
      .start()
    try {
      q.processAllAvailable()
      val raw = spark.table("asof_xbatch").collect()
      // exact cardinality on the raw rows: one emission per purchase,
      // never duplicates (a Map would mask double-emission)
      assert(raw.length == 3, raw.mkString(";"))
      val rows = raw.map(r => r.getAs[Long]("event_id") ->
          (Option(r.getAs[java.lang.Long]("touch_event_id")),
            Option(r.getAs[String]("touch_type")))).toMap
      // user 7: touch from the earlier batch attributes the purchase
      assert(rows(200L) == ((Some(100L), Some("view"))))
      // user 8: the equal-time touch with the HIGHER event_id arrived in
      // the EARLIER batch — the later batch's tied lower-id touch must
      // NOT replace it (batch-operator tie discipline)
      assert(rows(205L) == ((Some(105L), Some("view"))))
      // user 9: out-of-order purchase with only a FUTURE touch held —
      // fail-safe no-attribution, not a negative gap
      assert(rows(210L) == ((None, None)))
    } finally q.stop()
  }

  test("anomaly monitor: cross-batch buckets, prequential z chain") {
    val base = java.nio.file.Files.createTempDirectory("graft-anom-xbatch")
    val watched = s"$base/in"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    def write(name: String, rows: Seq[(Long, Long)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("event_id", "ts")
        .select(col("event_id"), col("ts"), lit(1L).as("user_id"),
          lit("view").as("event_type"), lit(0.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
    }
    val hNs = 3600L * 1000000000L
    val t0 = 1700000000000000000L / hNs * hNs // hour-aligned base (ns)
    // hour counts: H0=2 H1=3 H2=2 H3=10 (H4's single event only closes
    // H3 and stays open). H2 SPLITS across the two batches — the
    // cross-batch bucket-count accumulation under test.
    write("a", Seq(
      (1L, t0), (2L, t0 + 1000000000L),                       // H0 ×2
      (3L, t0 + hNs), (4L, t0 + hNs + 1000000000L),
      (5L, t0 + hNs + 2000000000L),                           // H1 ×3
      (6L, t0 + 2 * hNs)))                                    // H2 first
    write("b", Seq(
      (7L, t0 + 2 * hNs + 1000000000L)) ++                    // H2 second
      (10L to 19L).map(i => (i, t0 + 3 * hNs + i * 1000000L)) ++ // H3 ×10
      Seq((30L, t0 + 4 * hNs)))                               // H4 (open)
    new java.io.File(s"$watched/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    val stream = spark.readStream
      .schema(EventStream.eventsSchema(org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", "1").parquet(watched)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStream.anomalyStream(stream).toDF().writeStream
      .outputMode("append").format("memory").queryName("anom_xbatch")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("anom_xbatch").collect()
        .map(r => r.getAs[Long]("hour_us") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("baseline_nb"),
            r.getAs[Double]("z"), r.getAs[Boolean]("is_anomaly"))))
      assert(rows.length == 4, rows.mkString(";")) // H4 never closes
      val m = rows.toMap
      val h0 = t0 / 1000L
      def z(n: Long, nb: Long, sx: Long, sxx: Long): Double =
        BigDecimal((n - sx.toDouble / nb) /
            math.sqrt((nb * sxx - sx * sx).toDouble / (nb * (nb - 1))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // prequential: each close judged against the PRIOR buckets only
      assert(m(h0) == ((2L, 0L, 0.0, false)))          // no baseline
      assert(m(h0 + 3600000000L) == ((3L, 1L, 0.0, false))) // nb < 2
      // H2 count is 1(batch a) + 1(batch b) = 2 — cross-batch state
      assert(m(h0 + 2 * 3600000000L) ==
        ((2L, 2L, z(2, 2, 5, 13), false)))             // baseline {2,3}
      val z3 = z(10, 3, 7, 17)                         // baseline {2,3,2}
      assert(z3 > 2.0)
      assert(m(h0 + 3 * 3600000000L) == ((10L, 3L, z3, true)))
    } finally q.stop()
  }

  test("anomaly monitor flags a burst after a CONSTANT history (zero-variance escape)") {
    // counts 5,5,5 then 500: the baseline has σ = 0 so no finite z
    // exists, yet the burst is the clearest anomaly there is — the
    // integer escape n·nb ≠ Σn must flag it (z stays the neutral 0);
    // a conforming bucket (another 5) must NOT flag
    val hNs = 3600L * 1000000000L
    val t0 = 1710000000000000000L / hNs * hNs
    val rows = (0 until 3).flatMap(h =>
      (1 to 5).map(i => (h * 10L + i, t0 + h * hNs + i * 1000000000L))) ++
      (1 to 500).map(i => (1000L + i, t0 + 3 * hNs + i * 1000000L)) ++
      (1 to 5).map(i => (2000L + i, t0 + 4 * hNs + i * 1000000000L)) ++
      Seq((3000L, t0 + 5 * hNs)) // closes the conforming bucket
    val df = rows.toDF("event_id", "ts")
      .select(col("event_id"), expr("timestamp_micros(ts div 1000)").as("ts"),
        lit(1L).as("user_id"), lit("view").as("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    // single batch suffices: all closes happen at one high watermark
    val tmp = java.nio.file.Files.createTempDirectory("graft-anom-burst")
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/ev")
    val stream = spark.readStream
      .schema(df.schema).parquet(s"$tmp/ev")
    val q = EventStream.anomalyStream(stream).toDF().writeStream
      .outputMode("append").format("memory").queryName("anom_burst")
      .start()
    try {
      q.processAllAvailable()
      val m = spark.table("anom_burst").collect()
        .map(r => r.getAs[Long]("hour_us") ->
          ((r.getAs[Long]("n"), r.getAs[Double]("z"),
            r.getAs[Boolean]("is_anomaly")))).toMap
      val h0 = t0 / 1000L
      assert(m(h0 + 3 * 3600000000L) == ((500L, 0.0, true)),
        "burst after constant history must flag via the integer escape")
      // the post-burst conforming bucket has nonzero variance now (the
      // 500 is in the moments) → ordinary small-|z| pass
      val (n4, z4, f4) = m(h0 + 4 * 3600000000L)
      assert(n4 == 5L && !f4 && math.abs(z4) < 2.0, s"($n4, $z4, $f4)")
      // constant-history closes (hours 1,2) must NOT flag
      assert(m(h0 + 3600000000L)._3 == false)
      assert(m(h0 + 2 * 3600000000L)._3 == false)
    } finally q.stop()
  }

  test("anomaly monitor evicts a STALLED type via the event-time timeout") {
    // type "view" emits only in H0 then goes silent; type "click" keeps
    // the GLOBAL watermark advancing through H3/H4. Without the
    // event-time timeout the stalled type's H0 bucket stays open forever
    // (its own hw never passes H0's end); with it, the global watermark
    // closes the bucket and emits the same prequential verdict.
    val base = java.nio.file.Files.createTempDirectory("graft-anom-stall")
    val watched = s"$base/in"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    def write(name: String, rows: Seq[(Long, Long, String)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("event_id", "ts", "event_type")
        .select(col("event_id"), col("ts"), lit(1L).as("user_id"),
          col("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
    }
    val hNs = 3600L * 1000000000L
    val t0 = 1720000000000000000L / hNs * hNs
    write("a", Seq((1L, t0, "view"), (2L, t0 + 1000000000L, "view"),
      (3L, t0 + 1000L, "click")))
    write("b", (10L to 12L).map(i => (i, t0 + 3 * hNs + i * 1000000L, "click")))
    write("c", Seq((20L, t0 + 4 * hNs, "click")))
    (Seq("a", "b") zip Seq(120000, 60000)).foreach { case (n, ago) =>
      new java.io.File(s"$watched/$n.parquet")
        .setLastModified(System.currentTimeMillis() - ago)
    }
    val stream = spark.readStream
      .schema(EventStream.eventsSchema(org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", "1").parquet(watched)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStream.anomalyStream(stream).toDF().writeStream
      .outputMode("append").format("memory").queryName("anom_stall")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("anom_stall").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_us"),
          r.getAs[Long]("n")))
      val h0 = t0 / 1000L
      // the stalled type's H0 bucket closed via the global watermark
      // (its own frontier never left H0), with its full 2-event count
      assert(rows.contains(("view", h0, 2L)), rows.mkString(";"))
      // the live type's own frontier closed its H0 and H3 as usual
      assert(rows.contains(("click", h0, 1L)), rows.mkString(";"))
      assert(rows.contains(("click", h0 + 3 * 3600000000L, 3L)),
        rows.mkString(";"))
    } finally q.stop()
  }

  test("anomaly monitor counts cross-batch OUT-OF-ORDER arrivals into a still-open bucket") {
    // the late-row pre-filter trap: batch a's max event time reaches
    // 10:30; batch b delivers a 10:15 event for the still-open 10:00
    // bucket. With the watermark delay = grace alone the pre-filter
    // would drop it BEFORE the fold (watermark = 10:30 > 10:15) and the
    // bucket would close at n=2; the bucket-width-padded delay must let
    // it through so the close reports the exact n=3.
    val base = java.nio.file.Files.createTempDirectory("graft-anom-ooo")
    val watched = s"$base/in"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    def write(name: String, rows: Seq[(Long, Long)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("event_id", "ts")
        .select(col("event_id"), col("ts"), lit(1L).as("user_id"),
          lit("view").as("event_type"), lit(0.0).as("value"),
          lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
    }
    val mNs = 60L * 1000000000L // one minute in ns
    val t0 = 1730000000000000000L / (60 * mNs) * (60 * mNs) // hour-aligned
    // Spark filters late events against the PREVIOUS batch's watermark
    // (watermarkForLateEvents lags one batch), so the late arrival must
    // come two batches after the max that strands it: a sets the max
    // (10:30), b lets that max become the late-events watermark, c
    // delivers the 10:15 event, d closes H0.
    write("a", Seq((1L, t0 + 5 * mNs), (2L, t0 + 30 * mNs)))   // H0 ×2, open
    write("b", Seq((3L, t0 + 35 * mNs)))  // H0; watermark now sees 10:30
    write("c", Seq((4L, t0 + 15 * mNs)))  // H0, BEHIND the watermark
    write("d", Seq((9L, t0 + 150 * mNs))) // advances hw past H0's end
    (Seq("a", "b", "c") zip Seq(180000, 120000, 60000)).foreach {
      case (n, ago) =>
        new java.io.File(s"$watched/$n.parquet")
          .setLastModified(System.currentTimeMillis() - ago)
    }
    val stream = spark.readStream
      .schema(EventStream.eventsSchema(org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", "1").parquet(watched)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStream.anomalyStream(stream).toDF().writeStream
      .outputMode("append").format("memory").queryName("anom_ooo")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("anom_ooo").collect()
        .map(r => r.getAs[Long]("hour_us") -> r.getAs[Long]("n")).toMap
      assert(rows(t0 / 1000L) == 4L,
        s"open-bucket out-of-order event lost to the pre-filter: $rows")
    } finally q.stop()
  }

  test("stream-stream interval join reconciles with the batch range join") {
    val q = EventStream.windowJoinStream(EventStream.readEvents(spark, dir))
      .writeStream
      .outputMode("append").format("memory").queryName("window_join_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("window_join_stream")
        .select("event_id", "t_eid")
        .as[(Long, Long)].collect().toSet
      // the batch operator's pre-aggregation candidate pairs
      val ev = graft.model.Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val t = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id").as("t_uid"), col("event_id").as("t_eid"),
          col("us").as("t_us"))
      val batch = p.join(t,
          col("user_id") === col("t_uid") && col("t_us") <= col("us") &&
            col("t_us") >= col("us") - 3600000000L)
        .select("event_id", "t_eid").as[(Long, Long)].collect().toSet
      assert(streamed.nonEmpty && streamed == batch)
      // and the downstream batch rollup over the joined pairs equals the
      // declared query's counts
      val rolled = spark.table("window_join_stream")
        .groupBy("event_id").count().as[(Long, Long)].collect().toMap
      val declared = EventsOps.eventWindowJoin(spark, dir)
        .filter(col("n_touch") > 0)
        .select("event_id", "n_touch").as[(Long, Long)].collect().toMap
      assert(rolled == declared)
    } finally q.stop()
  }

  test("foreachBatch parquet sink is idempotent under batch replay") {
    val base = java.nio.file.Files.createTempDirectory("graft-sink")
    val out = s"$base/out"
    def runOnce(ckpt: String): Unit = {
      val q = EventStream.toParquetIdempotent(
        EventStream.readEvents(spark, dir)
          .select("event_id", "ts", "user_id"), out, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(s"$base/ckpt1")
    val n1 = spark.read.parquet(out).count()
    assert(n1 == graft.model.Tables.events(spark, dir).count())
    // replay: a fresh checkpoint re-delivers the same source as the same
    // batch ids — the batch_id partition overwrite must absorb it
    runOnce(s"$base/ckpt2")
    assert(spark.read.parquet(out).count() == n1, "replay duplicated rows")
    assert(spark.read.parquet(out)
      .groupBy("event_id").count().filter(col("count") > 1).count() == 0)
  }

  test("streaming corpus ingestion matches corpus_prepare, idempotently") {
    import graft.streaming.CorpusStream
    val base = java.nio.file.Files.createTempDirectory("graft-corpus-ing")
    val out = s"$base/out"
    def runOnce(ckpt: String): Unit = {
      val q = CorpusStream.ingest(
        CorpusStream.readDocuments(spark, dir), out, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(s"$base/ckpt1")
    // the whole sf0.001 corpus arrives as ONE batch → per-batch dedup
    // scope == global scope → rows must equal the batch pipeline's
    // (packing excluded: pack ids are order-global by design)
    val streamed = spark.read.parquet(out)
      .select("doc_id", "split", "n_tokens")
      .as[(Long, String, Long)].collect().toSet
    val batch = graft.operators.Corpus.corpusPrepare(spark, dir)
      .select("doc_id", "split", "n_tokens")
      .as[(Long, String, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    // split is a physical PARTITION of the sink (readers prune on it)
    val splitDirs = new java.io.File(s"$out/batch_id=0").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(splitDirs == Set("split=train", "split=val", "split=test"))
    // replay with a fresh checkpoint: same batch ids re-delivered — the
    // batch_id dynamic-overwrite sink must absorb them, not append
    runOnce(s"$base/ckpt2")
    assert(spark.read.parquet(out)
      .select("doc_id", "split", "n_tokens")
      .as[(Long, String, Long)].collect().toSet == batch,
      "replay duplicated rows")
  }

  test("cross-batch dedup state drops a duplicate arriving in a later batch") {
    import graft.streaming.CorpusStream
    val base = java.nio.file.Files.createTempDirectory("graft-xbatch")
    val (watched, out, state) = (s"$base/in", s"$base/out", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    // quality-passing texts: >20 tokens, contain a stopword, and share
    // NO token run across texts (a common tail would make them real
    // near-duplicates and the minhash tier would rightly collapse them)
    def text(prefix: String): String =
      s"the " + (1 to 23).map(i => s"$prefix$i").mkString(" ")
    val t1 = text("alpha")
    val t2 = text("beta")
    val t3 = text("gamma")
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("synthetic").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
    }
    // batch 0: two distinct docs; batch 1: an exact copy of t1 under a
    // NEW doc_id (in-batch dedup can't see it) plus one fresh doc
    writeFile("a", Seq(1L -> t1, 2L -> t2))
    writeFile("b", Seq(10L -> t1, 11L -> t3))
    // distinct mtimes so the file source orders a before b
    new java.io.File(s"$watched/a.parquet")
      .setLastModified(System.currentTimeMillis() - 60000)
    def runOnce(ckpt: String): Unit = {
      val q = CorpusStream.ingestStateful(
        spark.readStream.schema(CorpusStream.documentsSchema)
          .option("maxFilesPerTrigger", "1").parquet(watched),
        out, ckpt, state)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(s"$base/ckpt1")
    val emitted = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    // doc 10 (cross-batch duplicate of doc 1) is the ONLY drop
    assert(emitted == Set(1L, 2L, 11L), s"emitted $emitted")
    // the state store holds bands only for emitted docs, by batch
    val stored = spark.read.parquet(state)
      .select("doc_id", "batch_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(stored == Set((1L, 0L), (2L, 0L), (11L, 1L)), s"state $stored")
    // replay with a fresh checkpoint: same batches re-delivered — sink
    // and store must overwrite themselves, and the duplicate must STAY
    // dropped (batch 1 sees exactly the state it saw the first time)
    runOnce(s"$base/ckpt2")
    assert(spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 11L),
      "replay changed the emitted set")
    assert(spark.read.parquet(state)
      .select("doc_id", "batch_id").distinct()
      .as[(Long, Long)].collect().toSet == stored,
      "replay changed the state store")
  }

  test("band-store compaction folds history, preserves suppression and replay") {
    import graft.streaming.CorpusStream
    val base = java.nio.file.Files.createTempDirectory("graft-compact")
    val (watched, out, state) = (s"$base/in", s"$base/out", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    def text(prefix: String): String =
      s"the " + (1 to 23).map(i => s"$prefix$i").mkString(" ")
    val (t1, t2, t3) = (text("alpha"), text("beta"), text("gamma"))
    def writeFile(name: String, mtimeOffsetMs: Long,
        rows: Seq[(Long, String)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("synthetic").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
      new java.io.File(s"$watched/$name.parquet")
        .setLastModified(System.currentTimeMillis() + mtimeOffsetMs)
    }
    def runOnce(ckpt: String): Unit = {
      val q = CorpusStream.ingestStateful(
        spark.readStream.schema(CorpusStream.documentsSchema)
          .option("maxFilesPerTrigger", "1").parquet(watched),
        out, ckpt, state)
      try q.processAllAvailable() finally q.stop()
    }
    // two batches of history, stopped cleanly
    writeFile("a", -120000, Seq(1L -> t1))
    writeFile("b", -60000, Seq(2L -> t2))
    runOnce(s"$base/ckpt1")
    val bandsBefore = spark.read.parquet(state)
      .select("doc_id", "band", "v1", "v2")
      .as[(Long, Int, Long, Long)].collect().toSet
    // fold batches 0..1 into the sentinel segment
    CorpusStream.compactBands(spark, state, throughBatch = 1L)
    val partsAfter = new java.io.File(state).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(partsAfter == Set("batch_id=-1"), s"parts $partsAfter")
    // the fold is row-lossless
    assert(spark.read.parquet(state)
      .select("doc_id", "band", "v1", "v2")
      .as[(Long, Int, Long, Long)].collect().toSet == bandsBefore)
    // a second compaction is a no-op fold of the fold
    CorpusStream.compactBands(spark, state, throughBatch = 1L)
    assert(spark.read.parquet(state)
      .select("doc_id", "band", "v1", "v2")
      .count() == bandsBefore.size)
    // resume: batch 2 carries a copy of the COMPACTED doc 1 plus a
    // fresh doc — suppression must survive the fold
    writeFile("c", 0, Seq(10L -> t1, 11L -> t3))
    runOnce(s"$base/ckpt1")
    val emitted = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(emitted == Set(1L, 2L, 11L), s"emitted $emitted")
    // the resumed batch's own bands land under its real batch id,
    // alongside the sentinel
    val stored = spark.read.parquet(state)
      .select("doc_id", "batch_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(stored == Set((1L, -1L), (2L, -1L), (11L, 2L)), s"state $stored")
  }

  test("compaction completes a crashed fold bound to a SMALLER throughBatch " +
      "instead of reusing it") {
    import graft.streaming.CorpusStream
    val base = java.nio.file.Files.createTempDirectory("graft-compact-tear")
    val (watched, out, state) = (s"$base/in", s"$base/out", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    def text(prefix: String): String =
      s"the " + (1 to 23).map(i => s"$prefix$i").mkString(" ")
    def writeFile(name: String, mtimeOffsetMs: Long,
        rows: Seq[(Long, String)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("synthetic").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
      new java.io.File(s"$watched/$name.parquet")
        .setLastModified(System.currentTimeMillis() + mtimeOffsetMs)
    }
    writeFile("a", -120000, Seq(1L -> text("alpha")))
    writeFile("b", -60000, Seq(2L -> text("beta")))
    val q = CorpusStream.ingestStateful(
      spark.readStream.schema(CorpusStream.documentsSchema)
        .option("maxFilesPerTrigger", "1").parquet(watched),
      out, s"$base/ckpt", state)
    try q.processAllAvailable() finally q.stop()
    val allRows = spark.read.parquet(state)
      .select("doc_id", "band", "v1", "v2")
      .as[(Long, Int, Long, Long)].collect().toSet
    // fabricate a compactBands(throughBatch = 0) run that crashed in
    // phase B: a COMMITTED stage bound to 0 (parquet _SUCCESS plus the
    // _THROUGH marker) and a store torn mid-delete (batch 0 gone)
    val stage = s"$state.compacting"
    spark.read.parquet(state).filter(col("batch_id") <= 0L)
      .select("doc_id", "band", "v1", "v2")
      .withColumn("batch_id", lit(-1L))
      .repartition(col("band"))
      .write.partitionBy("batch_id", "band").parquet(stage)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$stage/_THROUGH=0"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$state/batch_id=0"))
    // a later call with a LARGER throughBatch must finish the recorded
    // fold first, then fold batch 1 — reusing the stale stage would
    // delete batch 1 and swap in a fold that never saw it
    CorpusStream.compactBands(spark, state, throughBatch = 1L)
    val partsAfter = new java.io.File(state).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(partsAfter == Set("batch_id=-1"), s"parts $partsAfter")
    val rowsAfter = spark.read.parquet(state)
      .select("doc_id", "band", "v1", "v2")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(rowsAfter == allRows, "recovery lost band rows")
    assert(!new java.io.File(stage).exists(), "stage not cleaned up")
  }

  test("compaction recovery after a crash between the rename and the " +
      "stage delete keeps the swapped-in fold") {
    import graft.streaming.CorpusStream
    val base = java.nio.file.Files.createTempDirectory("graft-compact-post")
    val (watched, out, state) = (s"$base/in", s"$base/out", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    def text(prefix: String): String =
      s"the " + (1 to 23).map(i => s"$prefix$i").mkString(" ")
    def writeFile(name: String, mtimeOffsetMs: Long,
        rows: Seq[(Long, String)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("synthetic").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
      new java.io.File(s"$watched/$name.parquet")
        .setLastModified(System.currentTimeMillis() + mtimeOffsetMs)
    }
    writeFile("a", -120000, Seq(1L -> text("alpha")))
    writeFile("b", -60000, Seq(2L -> text("beta")))
    val q = CorpusStream.ingestStateful(
      spark.readStream.schema(CorpusStream.documentsSchema)
        .option("maxFilesPerTrigger", "1").parquet(watched),
      out, s"$base/ckpt", state)
    try q.processAllAvailable() finally q.stop()
    val allRows = spark.read.parquet(state)
      .select("doc_id", "band", "v1", "v2")
      .as[(Long, Int, Long, Long)].collect().toSet
    // fabricate a compactBands(throughBatch = 1) run that crashed AFTER
    // phase B's rename but BEFORE the final stage delete: the stage is
    // committed (_SUCCESS + _THROUGH=1) but its batch_id=-1 is already
    // renamed into the store, and the covered partitions are deleted —
    // the store's -1 is now the ONLY copy of every folded row
    val stage = s"$state.compacting"
    spark.read.parquet(state).filter(col("batch_id") <= 1L)
      .select("doc_id", "band", "v1", "v2")
      .withColumn("batch_id", lit(-1L))
      .repartition(col("band"))
      .write.partitionBy("batch_id", "band").parquet(stage)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$stage/_THROUGH=1"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$state/batch_id=0"))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$state/batch_id=1"))
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$stage/batch_id=-1"),
      java.nio.file.Paths.get(s"$state/batch_id=-1"))
    // the rerun must recognize the rename already happened (stage
    // committed, foldSrc absent, store -1 present) and ONLY delete the
    // stage — re-running the delete loop would destroy the store's -1,
    // the exact data-loss scenario of the r14 HIGH advice
    CorpusStream.compactBands(spark, state, throughBatch = 1L)
    val partsAfter = new java.io.File(state).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(partsAfter == Set("batch_id=-1"), s"parts $partsAfter")
    val rowsAfter = spark.read.parquet(state)
      .select("doc_id", "band", "v1", "v2")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(rowsAfter == allRows, "post-rename recovery lost band rows")
    assert(!new java.io.File(stage).exists(), "stage not cleaned up")
    // and a LARGER-argument rerun over the recovered store still folds
    // correctly (the -1 sentinel re-enters the next fold)
    CorpusStream.compactBands(spark, state, throughBatch = 2L)
    assert(spark.read.parquet(state)
      .select("doc_id", "band", "v1", "v2")
      .as[(Long, Int, Long, Long)].collect().toSet == allRows)
  }

  test("stream scoring with a batch-fitted model matches quality_predict " +
      "row-for-row") {
    import graft.streaming.CorpusStream
    import graft.operators.Distill
    val dir = "/root/testdata/sf0.001"
    val w = Distill.fitWeights(spark, dir).get
    // stream the same documents table as a 2-file source (each file one
    // micro-batch) through the incremental scoring plan
    val base = java.nio.file.Files.createTempDirectory("graft-score")
    val watched = s"$base/in"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Seq(0, 1).foreach { i =>
      val staging = s"$base/staging-$i"
      docs.filter(pmod(col("doc_id"), lit(2)) === i)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/chunk$i.parquet"))
    }
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(watched)
    val q = CorpusStream.scoredStream(src, w).writeStream
      .format("memory").queryName("scored_parity")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("scored_parity")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    val want = Distill.qualityPredict(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streamed quality-aware mix with the running fit matches " +
      "mix_quality row-for-row") {
    import graft.streaming.CorpusStream
    import graft.operators.Corpus
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft-mixstream")
    val (watched, state) = (s"$base/in", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Seq(0, 1).foreach { i =>
      val staging = s"$base/staging-$i"
      docs.filter(pmod(col("doc_id"), lit(2)) === i)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/chunk$i.parquet"))
    }
    // the production loop end-to-end: accumulate the nine sums over the
    // stream, re-solve, and hot-swap the triple into the mixing stream
    val qf = CorpusStream.fittedStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched),
      state, s"$base/ckpt-fit")
    try qf.processAllAvailable() finally qf.stop()
    val w = CorpusStream.runningFit(spark, state).get
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(watched)
    val q = CorpusStream
      .mixedStream(src, w, Corpus.defaultMixRates).writeStream
      .format("memory").queryName("mixed_parity")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("mixed_parity")
      .as[(Long, String, Double, Long, Long)].collect().toSet
    // parity target: the BATCH mix_quality declared query — tiering and
    // copy decisions are row-local (salted per-doc hash), so batching
    // cannot move them; only the output order differs, hence sets
    val want = Corpus.mixQuality(spark, dir, Corpus.defaultMixRates)
      .as[(Long, String, Double, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
    // tier-0 documents are DROPPED, never emitted — only base and
    // doubled tiers can reach the sink
    assert(spark.table("mixed_parity").select("tier")
      .distinct().as[Long].collect().toSet.subsetOf(Set(1L, 2L)))
  }

  test("incremental quality fit over batches equals the batch fit " +
      "over their union") {
    import graft.streaming.CorpusStream
    import graft.operators.Distill
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft-fitstream")
    val (watched, state) = (s"$base/in", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // three micro-batches partitioning the corpus
    Seq(0, 1, 2).foreach { i =>
      val staging = s"$base/staging-$i"
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/chunk$i.parquet"))
    }
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(watched)
    val q = CorpusStream.fittedStream(src, state, s"$base/ckpt")
    try q.processAllAvailable() finally q.stop()
    // one 9-sum row per batch landed
    assert(spark.read.parquet(state).select("batch_id")
      .distinct().as[Long].collect().toSet == Set(0L, 1L, 2L))
    // the merged-sums solve equals the batch fit over the whole corpus
    // EXACTLY (integer sums have no merge-order error)
    val running = CorpusStream.runningFit(spark, state)
    val batch = Distill.fitWeights(spark, dir)
    assert(running == batch && running.isDefined,
      s"running $running != batch $batch")
    // restart with the same checkpoint and no new input: replay-safe,
    // fit unchanged
    val q2 = CorpusStream.fittedStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched),
      state, s"$base/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    assert(CorpusStream.runningFit(spark, state) == batch)
  }

  test("composed fit→mix stream hot-swaps weights per batch and matches " +
      "the batch replay of the same schedule") {
    import graft.streaming.CorpusStream
    import graft.operators.{Corpus, Distill}
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft-mixingest")
    val (watched, out, state) = (s"$base/in", s"$base/out", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val chunks = Seq(0, 1, 2).map { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i).cache()
    }
    // stage each chunk as one parquet file; copy-then-drain one at a
    // time so batch k IS chunk k (the schedule the parity replays)
    def stage(i: Int): Unit = {
      val staging = s"$base/staging-$i"
      chunks(i).coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/chunk$i.parquet"))
    }
    stage(0)
    val src = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(watched)
    val q = CorpusStream.mixedIngest(src, out, s"$base/ckpt", state,
      Corpus.defaultMixRates)
    try {
      q.processAllAvailable()
      stage(1); q.processAllAvailable()
      stage(2); q.processAllAvailable()
    } finally q.stop()
    // batch-side replay of the INCLUSIVE schedule mixedIngest pins:
    // batch k mixes under the fit over chunks 0..k (integer sums ⇒
    // the accumulated solve equals the union solve exactly)
    val wk = (0 to 2).map { k =>
      val un = chunks.take(k + 1).reduce(_ unionByName _)
      Distill.solveSums(
        Distill.sumsOf(Distill.featuredSlice(un)).collect()(0))
        .getOrElse((0.0, 0.0, 0.0))
    }
    // the hot-swap is REAL on this data: the weight triple moves as
    // evidence accumulates (if it ever stops moving here, the fixture
    // no longer exercises the swap — fail loudly, don't vacuously pass)
    assert(wk.distinct.size > 1, s"weight schedule never moved: $wk")
    val got = spark.read.parquet(out)
      .select("batch_id", "doc_id", "source", "q_pred", "tier", "copy_idx")
      .as[(Long, Long, String, Double, Long, Long)].collect().toSet
    val want = (0 to 2).flatMap { k =>
      Corpus.mixQualityOf(spark, Distill.featuredSlice(chunks(k)), wk(k),
        Corpus.defaultMixRates)
        .withColumn("batch_id", lit(k.toLong))
        .select("batch_id", "doc_id", "source", "q_pred", "tier",
          "copy_idx")
        .as[(Long, Long, String, Double, Long, Long)].collect()
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
    chunks.foreach(_.unpersist())
  }

  test("composed fit→mix stream degenerates to the declared mix_quality " +
      "on a one-batch stream") {
    import graft.streaming.CorpusStream
    import graft.operators.Corpus
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft-mixingest1")
    val (watched, out, state) = (s"$base/in", s"$base/out", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val staging = s"$base/staging"
    docs.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$watched/all.parquet"))
    val q = CorpusStream.mixedIngest(
      spark.readStream.schema(docs.schema).parquet(watched),
      out, s"$base/ckpt", state, Corpus.defaultMixRates)
    try q.processAllAvailable() finally q.stop()
    // whole corpus in one batch ⇒ the inclusive schedule's weights ARE
    // the full-corpus fit ⇒ rows equal the declared query's verbatim
    val got = spark.read.parquet(out)
      .select("doc_id", "source", "q_pred", "tier", "copy_idx")
      .as[(Long, String, Double, Long, Long)].collect().toSet
    val want = Corpus.mixQuality(spark, dir, Corpus.defaultMixRates)
      .as[(Long, String, Double, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("compaction no-ops on a store with no batch partitions") {
    import graft.streaming.CorpusStream
    val base = java.nio.file.Files.createTempDirectory("graft-compact-empty")
    val state = s"$base/state"
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(state))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$state/_SUCCESS"))
    // only _SUCCESS (an empty first batch): schema inference over zero
    // partitions would throw — must return quietly instead
    CorpusStream.compactBands(spark, state, throughBatch = 0L)
    assert(new java.io.File(state).exists())
    assert(!new java.io.File(s"$state.compacting").exists())
  }

  test("three-batch chained dedup state survives a MID-STREAM crash replay") {
    import graft.streaming.CorpusStream
    val base = java.nio.file.Files.createTempDirectory("graft-xbatch3")
    val (watched, out, state) = (s"$base/in", s"$base/out", s"$base/state")
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(watched))
    def text(prefix: String): String =
      s"the " + (1 to 23).map(i => s"$prefix$i").mkString(" ")
    val (t1, t2, t3, t4) = (text("alpha"), text("beta"), text("gamma"),
      text("delta"))
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit = {
      val staging = s"$base/staging-$name"
      rows.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("en").as("lang"),
          lit("synthetic").as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$watched/$name.parquet"))
    }
    // chained cross-batch duplicates: batch 2 carries copies of docs
    // emitted in BOTH prior batches (10→1 was already dropped in batch
    // 1, so 21→11 and 20→2 probe the 0-hop AND 1-hop state depth)
    writeFile("a", Seq(1L -> t1, 2L -> t2))
    writeFile("b", Seq(10L -> t1, 11L -> t3))
    writeFile("c", Seq(20L -> t2, 21L -> t3, 22L -> t4))
    (Seq("a", "b") zip Seq(120000, 60000)).foreach { case (n, ago) =>
      new java.io.File(s"$watched/$n.parquet")
        .setLastModified(System.currentTimeMillis() - ago)
    }
    val ckpt = s"$base/ckpt"
    def runOnce(c: String = ckpt): Unit = {
      val q = CorpusStream.ingestStateful(
        spark.readStream.schema(CorpusStream.documentsSchema)
          .option("maxFilesPerTrigger", "1").parquet(watched),
        out, c, state)
      try q.processAllAvailable()
      finally {
        q.stop()
        q.awaitTermination()
        // restarting on the SAME checkpoint trips the concurrent-use
        // guard until the stopped run fully deregisters
        val deadline = System.currentTimeMillis() + 30000
        while (spark.streams.active.exists(_.id == q.id) &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(100)
      }
    }
    runOnce()
    val expected = Set(1L, 2L, 11L, 22L)
    val expectedState = Set((1L, 0L), (2L, 0L), (11L, 1L), (22L, 2L))
    def emitted() = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    def stored() = spark.read.parquet(state)
      .select("doc_id", "batch_id").distinct()
      .as[(Long, Long)].collect().toSet
    assert(emitted() == expected, s"emitted ${emitted()}")
    assert(stored() == expectedState, s"state ${stored()}")
    // CRASH REPLAY: batch 2 wrote its offsets but died before its
    // commit — delete commits/2 and restart on the SAME checkpoint; the
    // engine re-runs batch 2, which must see batch_id<2 state only
    // (its own half-written store partition is invisible to itself) and
    // overwrite its own sink/store partitions byte-identically
    assert(new java.io.File(s"$ckpt/commits/2").delete(),
      "checkpoint layout changed: commits/2 missing")
    // the local-FS checksum sidecar must go with it, or the replayed
    // commit's rename trips over the stale crc
    new java.io.File(s"$ckpt/commits/.2.crc").delete()
    runOnce()
    assert(emitted() == expected, "crash replay changed the emitted set")
    assert(stored() == expectedState, "crash replay changed the state store")
    // and a full fresh-checkpoint replay (all three batches re-delivered
    // under the same ids) must also be absorbed
    runOnce(s"$base/ckpt2")
    assert(emitted() == expected, "full replay changed the emitted set")
    assert(stored() == expectedState, "full replay changed the state store")
  }

  test("prepareSliceFull matches corpus_prepare_full (packing excluded)") {
    import graft.streaming.CorpusStream
    val slice = CorpusStream.prepareSliceFull(
        graft.model.Tables.documents(spark, dir))
      .as[(Long, String, Long)].collect().toSet
    val batch = graft.operators.Corpus.corpusPrepareFull(spark, dir)
      .select("doc_id", "split", "n_tokens")
      .as[(Long, String, Long)].collect().toSet
    assert(slice == batch && slice.nonEmpty)
  }

  test("multimodal frame sampling: coverage, stride, and boundary sizes") {
    val frames = Multimodal.frameSample(spark, dir).cache()
    val videos = Multimodal.assets(spark, dir)
      .filter(col("kind") === "video").cache()
    // one row group per video asset; stride-2 indices only
    assert(frames.select("asset_id").distinct().count() == videos.count())
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    // every frame is full-size except possibly the asset's last one
    val shortFrames = frames.filter(col("n_bytes") < 256)
    assert(shortFrames.groupBy("asset_id").count()
      .filter(col("count") > 1).count() == 0)
    // fingerprints match the column-expression md5 path (same hash family
    // the oracle replays) for a spot-checked asset
    val a = videos.orderBy("asset_id").limit(1)
      .select(col("asset_id"), expr("substr(cast(payload as string), 1, 256)")
        .as("f0")).withColumn("fp", graft.operators.TextOps.h32(col("f0")))
      .select("asset_id", "fp").as[(Long, Long)].collect().head
    val got = frames.filter(col("asset_id") === a._1)
      .filter(col("frame_idx") === 0).select("frame_fp")
      .as[Long].collect().head
    assert(got == a._2, s"asset ${a._1}: jvm fp $got vs expr fp ${a._2}")
    frames.unpersist(); videos.unpersist()
  }

  test("multimodal resize halves sizes (ceil) for every image asset") {
    val r = Multimodal.resize(spark, dir).cache()
    val images = Multimodal.assets(spark, dir)
      .filter(col("kind") === "image").count()
    assert(r.count() == images)
    assert(r.filter(col("resized_bytes") =!=
      ceil(col("n_bytes") / 2.0).cast("long")).count() == 0)
    r.unpersist()
  }

  test("multimodal: features are partition-parallel, normalized, typed") {
    val f = Multimodal.features(spark, dir).cache()
    assert(f.count() > 0)
    // histogram is normalized: Σ bins ≈ 1 for non-empty payloads
    val sums = f.filter(col("n_bytes") > 0)
      .select(expr("aggregate(features, 0D, (a, x) -> a + x)").as("s"))
      .as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-3, s"histogram sum $s"))
    assert(f.select("kind").distinct().count() == 3)
    f.unpersist()
  }
}
