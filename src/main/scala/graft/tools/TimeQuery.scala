package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeat-time a single declared query against one sf dir — the A/B
  * instrument behind SCALING.md's quiet re-times (run 1 = cold with
  * builder first-touch, runs 2+ = warm). [[graft.Bench]] sweeps the
  * whole surface with budgets; this answers the narrower question
  * "did THIS query get faster under THIS code change" without paying
  * for a sweep, so variants can be swapped in place and compared on a
  * load-gated box (gate on the 1-min AND 5-min loadavg yourself before
  * trusting the numbers — see the bench-isolation note in the verify
  * skill). The JVM heap comes from build.sbt's scale coupling, which
  * reads SPARK_GRAFT_SF_DIR (not argv) — export it alongside the argv
  * sfDir when timing sf1+/sf10 so the fork gets the matching heap; the
  * header line records what the run actually got.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <query> [runs=4]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val heapGb = Runtime.getRuntime.maxMemory / 1073741824.0
    println(f"heap_gb $heapGb%.1f sf ${args(0)}")
    // build.sbt's heapForScale keys off SPARK_GRAFT_SF_DIR, not argv —
    // catch the foot-gun of timing an sf1+/sf10 dir under the 8 g
    // default (the scaladoc's documented OOM pairing) before it wastes
    // a run. Heuristic mirror of heapForScale's thresholds.
    val sfFactor = args(0).split('/').filter(_.nonEmpty).lastOption
      .flatMap("sf([0-9.]+)".r.findFirstMatchIn(_))
      .flatMap(m => scala.util.Try(m.group(1).toDouble).toOption)
    sfFactor.foreach { f =>
      val needGb = if (f >= 10) 40.0 else if (f >= 1) 12.0 else 0.0
      if (heapGb + 0.5 < needGb &&
          !sys.env.contains("SPARK_GRAFT_HEAP_OVERRIDE"))
        sys.error(f"TimeQuery: sf dir '${args(0)}' needs a ~${needGb}%.0f g" +
          f" heap but this JVM got $heapGb%.1f g — export" +
          s" SPARK_GRAFT_SF_DIR=${args(0)} (build.sbt heapForScale) or" +
          " SPARK_DRIVER_MEM before running. (Set" +
          " SPARK_GRAFT_HEAP_OVERRIDE=1 to proceed anyway.)")
    }
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // same cure as Verify (round-13 finding, winnow at sf30: repeat
      // runs in one JVM grew 149→215 s as dead shuffle files from the
      // previous runs accumulated — a 48 g heap never GCs unprompted,
      // so the ContextCleaner never releases them; the warm-run series
      // then measures disk fill, not the query)
      .config("spark.cleaner.periodicGC.interval", "60s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(args(1))
    val runs = if (args.length > 2) args(2).toInt else 4
    // SPARK_GRAFT_TQ_ACTION swaps the terminal action. collect (default
    // — includes result serialization, the historical method) breaks
    // maxResultSize on queries whose OUTPUT scales with sf
    // (scan_project at sf100 ships >1 GB of task results). noop writes
    // to the noop sink: every row of the full projection is computed
    // but nothing crosses to the driver — the right action for
    // scan-throughput exponents. count is NOT a benchmark action for
    // projection queries (Catalyst prunes the projection down to the
    // filter columns — measured 0.3 s flat from sf10 to sf100, i.e. it
    // measures metadata, not the query); it exists for row-count
    // sanity checks only. Never mix modes within one exponent series.
    val action = sys.env.getOrElse("SPARK_GRAFT_TQ_ACTION", "collect")
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val df = q(spark, args(0))
      action match {
        case "noop" => df.write.mode("overwrite").format("noop").save()
        case "count" => df.count()
        case _ => df.collect()
      }
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($action)")
    }
    spark.stop()
  }
}
