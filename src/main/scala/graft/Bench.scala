package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at the sf dir and prints ONE
  * JSON line for the driver. Failures are loud: the per-query time map
  * keeps the driver's expected `{"queries":{name:sec}}` shape, but any
  * query that throws lands in `"errors":{name:msg}`, flips `"ok"` to
  * false, and the process exits nonzero — a regression can never "pass"
  * the bench by computing nothing. */
object Bench {
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(e.toString.take(300)) }
        (name, (System.nanoTime() - t0) / 1e9, err)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + esc(e) + "\"" }.mkString("{", ",", "}")
    val ok = results.forall(_._3.isEmpty)
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","ok":$ok,"errors":$errs,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
