package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at the sf dir and prints ONE
  * JSON line for the driver. Failures are loud: the per-query time map
  * keeps the driver's expected `{"queries":{name:sec}}` shape, but any
  * query that throws lands in `"errors":{name:msg}`, flips `"ok"` to
  * false, and the process exits nonzero — a regression can never "pass"
  * the bench by computing nothing. */
object Bench {

  /** Per-query budgets: the round-1 sf0.1 bench (BENCH_r01.json, the
    * BASELINE.md gate) for queries that existed then. Any query running
    * over 2× its budget is reported in `"regressions"` (non-fatal) — the
    * instrument that catches a creeping quadratic the round it appears
    * instead of rounds later. Queries added after r1 have no entry until
    * a budget is established. */
  private val baselineSec: Map[String, Double] = Map(
    "adjacency_norm" -> 0.48, "bipartite_edges" -> 0.30,
    "collab_topk" -> 2.92, "cooc_pairs" -> 0.21, "cooc_topk" -> 2.36,
    "dedup_embedding" -> 0.81, "dedup_exact" -> 0.65,
    "dedup_minhash" -> 2.75, "dedup_simhash" -> 0.39,
    "edges_build" -> 1.65, "event_edges" -> 0.21, "event_hourly" -> 0.45,
    "event_sliding" -> 0.45, "event_weights" -> 0.31,
    "jaccard_sim" -> 6.30, "json_props" -> 0.35, "knn_bucketed" -> 0.67,
    "lang_id" -> 0.17, "multimodal_features" -> 0.37,
    "ngram_jaccard" -> 11.18, "orderfreq_topk" -> 1.26,
    "pagerank_global" -> 32.62, "popularity_approx" -> 5.31,
    "popularity_topk" -> 1.57, "ppr_seeded" -> 18.60,
    "rec_blend" -> 14.18, "rec_blend_full" -> 15.43,
    "scan_project" -> 0.23, "sessionize" -> 1.09, "sim_topk" -> 0.31,
    "text_fingerprint" -> 0.20, "text_quality" -> 0.17,
    "text_tokens" -> 0.17, "tfidf" -> 0.60,
    // queries added after r1: budgets from their first green round's
    // bench (r2 for the pairs/funnel tier, r4 for the corpus tier),
    // with ~1.5x headroom for builder-attribution drift — the sorted-
    // name run order means the alphabetically-first consumer of a
    // shared builder absorbs its materialization
    "dedup_simhash_pairs" -> 4.5, "knn_ivf" -> 4.0,
    "knn_multiprobe" -> 1.0, "event_funnel" -> 0.8,
    "event_retention" -> 1.2, "lang_id_ngram" -> 0.5,
    "multimodal_frames" -> 0.8, "multimodal_resize" -> 0.7,
    "dedup_clusters" -> 7.0, "dedup_survivors" -> 1.0,
    "split_assign" -> 0.5, "sample_stratified" -> 1.5,
    "corpus_mix" -> 1.0, "pack_assign" -> 1.0, "corpus_prepare" -> 9.0,
    // r5: first quiet-ish-box medians (decontaminate 0.6s median /
    // 2.5s cold at load 2.5; ngram_counts 2.0s / 5.5s cold and
    // vocab_build 0.5s / 1.1s cold at load 2.7)
    "decontaminate" -> 1.0, "ngram_counts" -> 2.5, "vocab_build" -> 0.8)

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** 1/5/15-minute load averages — the co-tenant-noise instrument: this
    * box's totals swing ±50% with background load, so every bench line
    * records the load it ran under (before and after) for the reader to
    * discount outliers. */
  private def loadavg: Seq[Double] =
    scala.util.Try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split(" ").take(3).toSeq.map(_.toDouble)
      finally src.close()
    }.getOrElse(Seq.empty)

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2) // odd run counts; even → upper median, still robust
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, scheduler, small-table reads) so the
    // first measured query doesn't absorb JVM startup, and run queries in
    // sorted name order so per-query attribution is stable across rounds
    // (shared cached builders mean the first query touching a subplan
    // pays its materialization)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // median-of-N per query: run1 ("cold") absorbs shared-builder
    // materialization and JIT/page-cache noise, the median is the
    // steady-state cost the budgets actually guard. Both are reported —
    // "queries"/"value" carry medians (sum of medians = total), "cold"/
    // "cold_total" carry run1 — so builder first-touch attribution is in
    // the artifact instead of re-litigated from SCALING runs each round.
    val runsN = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val load0 = loadavg
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        var err: Option[String] = None
        var i = 0
        while (i < runsN && err.isEmpty) { // a failing query fails fast
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable => err = Some(e.toString.take(300)) }
          times += (System.nanoTime() - t0) / 1e9
          i += 1
        }
        (name, median(times.toSeq), times.head, err)
    }
    val load1 = loadavg
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val colds = results.map { case (k, _, c, _) => s"\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) =>
      s"\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val ok = results.forall(_._4.isEmpty)
    val total = results.map(_._2).sum
    val coldTotal = results.map(_._3).sum
    // regression budget: only meaningful at the baseline's scale (sf0.1);
    // compares MEDIANS, so builder first-touch can no longer masquerade
    // as a regression (nor co-tenant spikes, unless they last all N runs)
    val regs =
      if (!sfDir.contains("sf0.1")) "{}"
      else results.collect {
        case (k, v, _, _) if baselineSec.get(k).exists(b => v > 2 * b) =>
          f""""$k":${v / baselineSec(k)}%.2f"""
      }.mkString("{", ",", "}")
    val la = (l: Seq[Double]) => l.mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","ok":$ok,"runs":$runsN,"loadavg":${la(load0)},"loadavg_end":${la(load1)},"cold_total":$coldTotal,"errors":$errs,"regressions":$regs,"queries":$qs,"cold":$colds,"sf":"$sfDir"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
