package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at the sf dir and prints ONE
  * JSON line for the driver. Failures are loud: the per-query time map
  * keeps the driver's expected `{"queries":{name:sec}}` shape, but any
  * query that throws lands in `"errors":{name:msg}`, flips `"ok"` to
  * false, and the process exits nonzero — a regression can never "pass"
  * the bench by computing nothing. */
object Bench {

  /** Per-query budgets, RE-DERIVED in round 9 from the r9 QUIET sweep
    * (PROFILE_r09.md §1: loadavg 1.3 at start, total 30.28 s, zero
    * exceedances against the prior budgets): each entry is that sweep's
    * per-query MEDIAN × 1.5 headroom, floored at 0.3 s so sub-100 ms
    * queries don't alarm on scheduler jitter. The round-5 derivation
    * had drifted — the engine sped up ~35% on several entries (r8
    * verdict item 5), leaving dead headroom where a creeping quadratic
    * could hide. Any query whose MEDIAN exceeds 2× its budget lands in
    * `"regressions"` (after load-gated solo adjudication below) — i.e.
    * the alarm fires at ~3× today's steady state. */
  private val baselineSec: Map[String, Double] = Map(
    "adjacency_norm" -> 0.32, "bipartite_edges" -> 0.3,
    // bpe rows derived round 13 (the r12 verdict's budget-table gap):
    // quiet sf0.1 TimeQuery 5-run medians 1.95 / 1.38 × 1.5. The two
    // r13 queries follow the same derivation — jaccard_lsh_2l median
    // 2.63, span_survivors 2.31, × 1.5
    // bpe_merges is cold-gated below since round 15 (merge table memoized)
    "bpe_merges_bytes" -> 2.1,
    "jaccard_lsh_2l" -> 3.9, "span_survivors" -> 3.5,
    // distillation tier, derived round 14 (same discipline: quiet
    // sf0.1 TimeQuery 5-run warm medians 0.65 / 0.91 / 0.66 / 0.98,
    // × 1.5)
    "quality_fit" -> 1.0, "quality_predict" -> 1.4,
    "domain_topk" -> 1.0, "fim_transform" -> 1.5,
    // curriculum_order: quiet warm median 1.06 × 1.5
    "curriculum_order" -> 1.6,
    // source_cap: quiet warm median 0.76 × 1.5
    "source_cap" -> 1.15,
    // bpe_encode re-runs the learn loop plus k encode passes every
    // run: quiet warm median 2.4 × 1.5
    "bpe_encode" -> 3.6,
    // chunk_assign/viz_dot joined in round 9: quiet TimeQuery warm
    // medians 0.83 / 0.80 s × 1.5
    "chunk_assign" -> 1.25,
    "collab_topk" -> 1.22, "cooc_pairs" -> 0.3,
    "cooc_topk" -> 0.76, "corpus_mix" -> 0.43,
    "corpus_prepare" -> 1.11, "corpus_quantiles" -> 0.3,
    "corpus_stats" -> 0.31, "decontaminate" -> 0.36,
    "dedup_clusters" -> 0.3, "dedup_embedding" -> 0.3,
    "dedup_exact" -> 0.35, "dedup_minhash" -> 0.3,
    "dedup_simhash" -> 0.3, "dedup_simhash_pairs" -> 5.26,
    "dedup_survivors" -> 0.3, "edges_build" -> 1.77,
    "embed_quantize" -> 0.3, "event_asof" -> 0.3,
    "event_edges" -> 0.3, "event_funnel" -> 0.3,
    "event_hourly" -> 0.3, "event_retention" -> 0.49,
    "event_sliding" -> 0.3, "event_weights" -> 0.3,
    "event_window_join" -> 0.3, "jaccard_lsh" -> 4.06,
    "jaccard_sim" -> 0.74,
    "json_props" -> 0.3, "knn_bucketed" -> 0.46,
    "knn_ivf" -> 0.41, "knn_ivf_fixed" -> 1.07,
    "knn_multiprobe" -> 0.45, "knn_quantized" -> 0.66,
    "lang_id" -> 0.3, "lang_id_ngram" -> 0.3,
    "multimodal_features" -> 0.48, "multimodal_frames" -> 0.3,
    "multimodal_resize" -> 0.3, "ngram_counts" -> 3.27,
    // re-derived round 10 with the corpus-relative guard chain (quiet
    // sweep loadavg 1.08 at start): median 1.94 × 1.5
    "ngram_jaccard" -> 2.9, "orderfreq_topk" -> 1.08,
    "pack_assign" -> 0.53, "pack_manifest" -> 0.61,
    "pack_tokens" -> 0.78, "popularity_approx" -> 2.61,
    "popularity_topk" -> 0.87, "rec_blend" -> 0.76,
    "rec_blend_fixed" -> 0.89, "rec_blend_full" -> 1.5,
    "sample_stratified" -> 0.77, "scan_project" -> 0.3,
    "sessionize" -> 0.54, "sim_topk" -> 0.3,
    "span_dup_rate" -> 0.3, "split_assign" -> 0.3,
    "text_fingerprint" -> 0.3, "text_quality" -> 0.3,
    // late round-9 queries: quiet TimeQuery warm medians × 1.5.
    // degree_dist recomputes two aggs off the warm cooc memo;
    // triangle_counts reads the memoized triangle frame (graph_stats —
    // sorted first — carries the chain cost in coldBaselineSec), so its
    // median is a memo read
    "degree_dist" -> 0.9,
    "text_clean" -> 3.3,
    // round-9 late tiers (observability, semdedup/PII/BFS, retrieval):
    // quiet QProfile warm medians × 1.5, floored at 0.3 (PROFILE_r09 §7)
    "domain_stats" -> 0.45, "vocab_coverage" -> 0.72,
    "cluster_stats" -> 0.98, "semdedup_fixed" -> 0.7,
    // reach_hops: per-level localCheckpoint landed after the first
    // QProfile pass — warm median 3.2 s × 1.5
    "pii_redact" -> 0.3, "reach_hops" -> 4.8,
    "bm25_topk" -> 1.35, "unigram_logprob" -> 0.95,
    // nll_bucket has NO median budget: it cold-gates below — its input
    // tf frame is BuilderCache-memoized, so after the round-9 memo its
    // warm median no longer contains the token-stream shuffle a
    // regression would hit (the round-5 memoization rule)
    "pmi_bigrams" -> 3.75, "text_entropy" -> 0.44,
    // winnow_fingerprints / bigram_nll / source_kl RE-DERIVED round 10
    // on a quiet box (r9 had set them under loadavg ~4-6, verdict item
    // 6): quiet sweep medians 2.80 / 3.22 / 0.44 × 1.5
    "event_anomaly" -> 1.02, "winnow_fingerprints" -> 4.2,
    "bigram_nll" -> 4.8, "source_kl" -> 0.66,
    // winnow_pairs reads the memoized fingerprint sets after
    // winnow_fingerprints in sorted order → warm median is the pairing
    // (quiet median 1.91 × 1.5 under the round-10 relative guard)
    "winnow_pairs" -> 2.9,
    "text_repetition" -> 2.27, "text_tokens" -> 0.3,
    "tfidf" -> 0.8, "tokenize_ids" -> 0.67,
    "tokenize_unk" -> 0.62, "triangle_counts" -> 0.5,
    // triangle_est re-runs its sampled chain every run (only the cooc
    // builder is shared): quiet median 1.64 × 1.5
    "triangle_est" -> 2.45,
    "viz_dot" -> 1.2,
    "vocab_build" -> 0.41)

  /** Queries whose WHOLE RESULT is session-memoized (BuilderCache memo /
    * PageRank fixpoint memo): bench runs 2..N are memo reads (~0.1 s), so
    * a warm median can never see a regression in the actual computation
    * chain (round-5 advice). These gate on the COLD run-1 time instead,
    * against round-5 sf0.1 cold times × 1.5 — the same headroom
    * discipline as the median budgets. Cold times carry builder
    * first-touch + co-tenant noise, which is exactly why everything ELSE
    * gates on medians; for a memoized query the cold run is the only run
    * that executes the chain at all. */
  /** RE-DERIVED in round 8 from SOLO-RELEASED first-touch times (the
    * [[soloRelease]] hooks drop exactly the query's own memo, upstream
    * shared state warm — PROFILE_r08.md §3), not from in-sequence sweep
    * colds, so the budgets no longer encode alphabetical bench order.
    * Each is the r8 sf0.1 solo-released measurement × 1.5 headroom
    * (same discipline as the median budgets); the in-sequence quiet
    * colds (PROFILE_r08.md §1) agree within noise, confirming the two
    * regimes coincide under sorted order. Load-inflated sweep colds that
    * cross the 2× gate are cleared by the solo re-adjudication, so
    * these can stay tight enough that a real ~3× chain regression
    * actually fires. */
  private val coldBaselineSec: Map[String, Double] = Map(
    // solo-released 3.65 s (own memo dropped, corpus_prepare's shared
    // builders warm); quiet in-sequence cold 4.46 s, loaded 10.2 s —
    // the 2× gate (11 s) still clears a loaded sweep via adjudication
    "corpus_prepare_full" -> 5.5,
    // solo-released 4.84 s: its hook is the only one that also drops
    // the shared adjacency cache, so this budget alone carries the
    // DF→RDD + groupByKey first-touch (quiet in-sequence cold 6.02 s)
    "pagerank_fixed" -> 7.5,
    // solo-released 0.55 s (warm adjacency, own converged fixpoint);
    // in-sequence colds 0.55–0.85 s across load — budget on the
    // loaded upper × 1.5
    "pagerank_global" -> 1.3,
    // solo-released 1.25 s (warm adjacency, own 8-step seeded fixpoint;
    // 12 s standalone when it must first-touch the whole cooc chain)
    "ppr_fixed" -> 1.9,
    // solo-released 0.94 s (warm adjacency, own converged seeded
    // fixpoint)
    "ppr_seeded" -> 1.4,
    // first toucher of the memoized triangle frame in sorted order
    // (cooc builder warm by then — the c-queries precede it); quiet
    // warm-chain ~5–6.5 s at sf0.1, the adjacency-intersection form
    "graph_stats" -> 9.8,
    // its solo-released cold re-runs the shared docTf token-stream
    // shuffle (the memoized input of the whole LM tier) PLUS its own
    // rank two-pass — the one gate that still sees a tf-build
    // regression after the round-9 memo. Forced-adjudication solo
    // measurement 2.07 s at loadavg 3.6 (PROFILE_r09 §8) × 1.5
    "nll_bucket" -> 3.1,
    // memoized round 15 (the bpe_encode learn-twice fix): cold run is
    // the 4-round learn loop; runs 2..N are memo reads. Budget = the
    // r15 quiet solo-released cold × 1.5
    "bpe_merges" -> 3.0)

  /** Memo-release hooks for the cold-gated queries above: before a solo
    * re-run, drop EXACTLY the memo state the query owns — its
    * [[graft.model.BuilderCache]] fixpoint entry — so the gated
    * computation re-executes, while upstream shared state stays warm
    * (every [[coldBaselineSec]] budget is an in-sequence cold that
    * assumes warm shared builders). `pagerank_fixed` sorts first in the
    * sweep and its budget includes the shared-adjacency first-touch, so
    * only ITS hook also drops [[graft.algo.PageRank]]'s adjacency cache;
    * releasing it for the other three would overstate their solo colds
    * against budgets set under a warm adjacency. The `pprRanks` prefix
    * covers both the uniform (pagerank_global) and seeded (ppr_seeded)
    * converged fixpoints — dropping the sibling's memo is harmless, its
    * own hook re-drops before its own solo run — and does NOT touch the
    * serving-path `engine.pprRanks:*` entries. */
  private val soloRelease: Map[String, SparkSession => Unit] = Map(
    "pagerank_fixed" -> { s: SparkSession =>
      graft.algo.PageRank.releaseAdjacency(s)
      graft.model.BuilderCache.release(s, "pprFixed8")
    },
    "pagerank_global" ->
      ((s: SparkSession) => graft.model.BuilderCache.release(s, "pprRanks")),
    "ppr_seeded" ->
      ((s: SparkSession) => graft.model.BuilderCache.release(s, "pprRanks")),
    "ppr_fixed" ->
      ((s: SparkSession) =>
        graft.model.BuilderCache.release(s, "pprSeededFixed8")),
    "corpus_prepare_full" ->
      ((s: SparkSession) =>
        graft.model.BuilderCache.release(s, "corpusPrepareFull")),
    "graph_stats" ->
      ((s: SparkSession) =>
        graft.model.BuilderCache.release(s, "triangleCounts")),
    "nll_bucket" ->
      ((s: SparkSession) => graft.model.BuilderCache.release(s, "docTf")),
    "bpe_merges" ->
      ((s: SparkSession) =>
        graft.model.BuilderCache.release(s, "bpeMerges")))

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
    // SPARK_GRAFT_SKIP: comma-separated query names to EXCLUDE from the
    // sweep — for scale runs where a family is measured to exceed the
    // box (round 9: the exact-jaccard builder at sf10 spills ~40 GB and
    // fills /tmp, then OOMs retries; see SCALING.md's crossover section).
    // Never silent: skipped names are listed in the JSON as "skipped",
    // and the driver's sf0.1 gate runs with the variable unset.
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val skippedJson = skip.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val load0 = loadavg
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => skip(q._1)).map {
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
    // ---- regression self-adjudication (round-6 verdict, top item; ----
    // ---- LOAD-GATED since round 9)                                ----
    // The sweep can record spurious budget exceedances when the box is
    // loaded: BENCH_r06.json flagged 6 queries at loadavg 4.2→7.3 that
    // all re-timed at or under budget on a quiet box. Every sweep
    // exceedance is therefore re-run SOLO after the sweep (serial,
    // nothing else in flight, same session) and only a query that ALSO
    // exceeds its budget solo lands in "regressions"; sweep-only
    // exceedances land in "suspect_load" as {name: [swept_sec,
    // solo_sec]}. Round 8 proved the solo pass ITSELF is not load-proof:
    // text_repetition solo-timed 15.7 s against a 2.76 s budget because
    // the co-tenant load that inflated the sweep was still draining when
    // the solo pass started seconds later (loadavg_solo_end 15-min 5.19),
    // and the artifact "confirmed" a regression that re-times at 2.1 s
    // quiet. A confirmation is now only valid when the confirming solo
    // run executed on a QUIET box: each solo attempt first waits
    // (bounded sleep budget) for the 1-min loadavg to drop to
    // `quietLoad`, records the load it started under (→ "solo_load"),
    // and exceedances are confirmed on the MIN of two spaced attempts —
    // a draining co-tenant inflates the two differently, a real chain
    // regression inflates both. An exceedance whose attempts never got a
    // quiet window lands in "unadjudicated" as {name: [swept_sec,
    // solo_sec, load_1min]} — visibly needing a manual re-time — never
    // in "regressions". Budgets only mean anything at the baseline's
    // scale (sf0.1): on any other sfDir the budget comparisons are
    // skipped entirely and only FORCE_EXCEED-named queries adjudicate.
    // ROUND 10 tightening (two phantom confirms in two rounds —
    // text_repetition r8, jaccard_sim r9): a draining 32-core box
    // recovers its 1-MIN loadavg under the old 4.0 gate while co-tenant
    // work is still unwinding (r9's confirming attempt started at 1-min
    // 1.81 and still timed 2.15× budget; quiet re-time 0.62 s). Quiet
    // now means BOTH the 1-min AND the 5-min loadavg at or under 2.0 —
    // the 5-min average is the drain detector the 1-min cannot be — and
    // confirmation takes the MIN of up to THREE spaced attempts, any
    // one under-budget attempt clearing. Test hooks:
    // SPARK_GRAFT_FORCE_EXCEED routes named queries through
    // adjudication (sweep time reported as the sentinel 9999 s);
    // SPARK_GRAFT_QUIET_LOAD / SPARK_GRAFT_SOLO_WAIT_SECS override the
    // quiet threshold (default 2.0, applied to both loadavg horizons)
    // and the total sleep budget (default 240 s across the whole
    // adjudication phase).
    val forced = sys.env.get("SPARK_GRAFT_FORCE_EXCEED")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val budgetsApply = sfDir.contains("sf0.1")
    val exceeded = results.collect {
      // memoized queries gate on the cold run (the only run that
      // executes the chain); everything else on the median
      case (k, v, c, None)
          if forced.contains(k) ||
            (budgetsApply &&
              (coldBaselineSec.get(k).exists(b => c > 2 * b) ||
                (!coldBaselineSec.contains(k) &&
                  baselineSec.get(k).exists(b => v > 2 * b)))) =>
        val isCold = coldBaselineSec.contains(k)
        val budget = coldBaselineSec.getOrElse(k,
          baselineSec.getOrElse(k, 9999.0))
        val swept = if (forced.contains(k)) 9999.0
          else if (isCold) c else v
        (k, swept, budget, isCold)
    }
    val quietLoad =
      sys.env.getOrElse("SPARK_GRAFT_QUIET_LOAD", "2.0").toDouble
    var sleepBudget =
      sys.env.getOrElse("SPARK_GRAFT_SOLO_WAIT_SECS", "240").toDouble
    // quiet = 1-min AND 5-min loadavg both at/under the threshold: the
    // 1-min recovers within seconds of a co-tenant draining while the
    // 5-min still carries the drain — gating on both is what keeps a
    // "solo" run from timing against work that is still unwinding
    def loadPair: (Double, Double) = loadavg match {
      case Seq(l1, l5, _*) => (l1, l5)
      case Seq(l1) => (l1, l1)
      case _ => (0.0, 0.0)
    }
    def isQuiet(l: (Double, Double)): Boolean =
      l._1 <= quietLoad && l._2 <= quietLoad
    def nap(secs: Double): Unit = {
      val s = math.min(secs, sleepBudget)
      if (s > 0) { Thread.sleep((s * 1000).toLong); sleepBudget -= s }
    }
    def awaitQuiet(): (Double, Double) = {
      var l = loadPair
      while (!isQuiet(l) && sleepBudget > 0) { nap(30); l = loadPair }
      l
    }
    val soloErrors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val soloLoads =
      scala.collection.mutable.LinkedHashMap.empty[String, Seq[(Double, Double)]]
    val adjudicated = exceeded.map { case (k, swept, budget, isCold) =>
      // (attempt_sec, (loadavg_1min, loadavg_5min) at attempt start);
      // confirmation requires EVERY attempt over budget, clearing needs
      // only one under
      val attempts =
        scala.collection.mutable.ArrayBuffer.empty[(Double, (Double, Double))]
      var attempt = 0
      var cleared = false
      while (attempt < 3 && !cleared && !soloErrors.contains(k)) {
        if (attempt > 0) nap(30) // space the re-try: draining load decays
        val lStart = awaitQuiet()
        // memoized chains would replay as ~0.1 s memo reads: drop exactly
        // the memo state the query owns before EVERY attempt (upstream
        // shared builders stay warm, reproducing the in-sequence cold
        // conditions the budget was set under) so the solo run
        // re-executes the gated computation. Cold-gated queries run ONCE
        // per attempt — runs 2..N would be memo reads that add
        // wall-clock without affecting the verdict.
        soloRelease.get(k).foreach(_(spark))
        val soloRuns = if (isCold) 1 else runsN
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        var i = 0
        while (i < soloRuns && !soloErrors.contains(k)) {
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(k)(spark, sfDir).count()
            times += (System.nanoTime() - t0) / 1e9
          } catch {
            // a solo-pass failure (a path the sweep never exercised, e.g.
            // post-release rebuild) must CONFIRM the exceedance, never
            // time as a fast run that clears it
            case scala.util.control.NonFatal(e) =>
              soloErrors(k) = e.toString.take(300)
          }
          i += 1
        }
        if (!soloErrors.contains(k) && times.nonEmpty) {
          val t = if (isCold) times.head else median(times.toSeq)
          attempts += ((t, lStart))
          cleared = t <= 2 * budget
        }
        attempt += 1
      }
      soloLoads(k) = attempts.toSeq.map(_._2)
      val solo =
        if (soloErrors.contains(k) || attempts.isEmpty) Double.PositiveInfinity
        else attempts.map(_._1).min
      // valid confirmation evidence = at least one attempt started quiet
      // on BOTH loadavg horizons
      val quietRun = attempts.exists(a => isQuiet(a._2))
      (k, swept, solo, budget, quietRun)
    }
    val load2 = loadavg
    // pagerank_fixed's hook is the only one that drops the app-wide
    // shared adjacency cache; if ITS solo run fails, the later-
    // adjudicated adjacency-dependent queries pay the DF→RDD+groupByKey
    // first-touch against budgets set under a warm adjacency — their
    // exceedances are environment damage, not regressions (round-8
    // advice), so they demote to "unadjudicated".
    val adjacencyDeps = Set("pagerank_global", "ppr_fixed", "ppr_seeded")
    val adjacencyBroken = soloErrors.contains("pagerank_fixed")
    def confirmed(k: String, solo: Double, b: Double, quietRun: Boolean) =
      solo > 2 * b && (solo.isInfinity || // own solo crash: always confirm
        (quietRun && !(adjacencyBroken && adjacencyDeps(k))))
    val suspect = adjudicated.collect {
      case (k, swept, solo, b, _) if solo <= 2 * b =>
        f""""$k":[$swept%.3f,$solo%.3f]"""
    }.mkString("{", ",", "}")
    val unadjudicated = adjudicated.collect {
      case (k, swept, solo, b, quietRun)
          if solo > 2 * b && !confirmed(k, solo, b, quietRun) =>
        val (l1, l5) =
          soloLoads.getOrElse(k, Seq.empty).lastOption.getOrElse((-1.0, -1.0))
        f""""$k":[$swept%.3f,$solo%.3f,$l1%.2f,$l5%.2f]"""
    }.mkString("{", ",", "}")
    val regs = adjudicated.collect {
      case (k, _, solo, b, quietRun) if confirmed(k, solo, b, quietRun) =>
        // -1 = the solo run itself failed (see solo_errors)
        if (solo.isInfinity) s""""$k":-1"""
        else f""""$k":${solo / b}%.2f"""
    }.mkString("{", ",", "}")
    // per attempt: [loadavg_1min, loadavg_5min] at attempt start
    val soloLoad = soloLoads.map { case (k, ls) =>
      s"\"" + k + "\":" + ls.map { case (l1, l5) =>
        f"[$l1%.2f,$l5%.2f]" }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val soloErrs = soloErrors.map { case (k, e) =>
      s"\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val la = (l: Seq[Double]) => l.mkString("[", ",", "]")
    // the JVM heap this sweep actually ran under (build.sbt couples the
    // default -Xmx to the sf dir; recording it makes scale artifacts
    // self-describing instead of env-var archaeology)
    val heapGb = f"${Runtime.getRuntime.maxMemory / 1073741824.0}%.1f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","ok":$ok,"runs":$runsN,"skipped":$skippedJson,"heap_gb":$heapGb,"loadavg":${la(load0)},"loadavg_end":${la(load1)},"loadavg_solo_end":${la(load2)},"cold_total":$coldTotal,"errors":$errs,"regressions":$regs,"suspect_load":$suspect,"unadjudicated":$unadjudicated,"solo_load":$soloLoad,"solo_errors":$soloErrs,"queries":$qs,"cold":$colds,"sf":"$sfDir"}""")
    // The driver keeps only the LAST 2000 chars of stdout: the 59-query
    // "queries"/"cold" maps above push the gate fields (value/ok/
    // regressions) past that window (round-5 verdict). Repeat them in a
    // compact FINAL line so truncation can never eat the gate.
    println(s"""{"metric":"summary","value":$total,"unit":"sec","ok":$ok,"runs":$runsN,"skipped":$skippedJson,"heap_gb":$heapGb,"cold_total":$coldTotal,"errors":$errs,"regressions":$regs,"suspect_load":$suspect,"unadjudicated":$unadjudicated,"solo_load":$soloLoad,"solo_errors":$soloErrs,"loadavg":${la(load0)},"loadavg_end":${la(load1)},"loadavg_solo_end":${la(load2)},"sf":"$sfDir"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
