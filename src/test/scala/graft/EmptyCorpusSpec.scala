package graft

/** Empty-input robustness: at 100 TB, empty inputs are routine (fresh
  * ingestion dirs, filtered-out partitions, a source with no rows yet).
  * Every declared query must degrade to ZERO ROWS on a corpus of empty
  * tables — never an NPE, a fit-on-nothing crash, or a null-seed blowup.
  * This sweep found (and now guards) three real corners: PageRank's
  * vertex require, knn_ivf's k-means fit on an empty training set, and
  * rec_blend_full's null min-customer seed. */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val src = new java.io.File("/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft-empty")
    src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      // real schema, zero rows (the session reads ns timestamps as long
      // via the legacy conf, exactly like the driver testdata layout)
      val schema = spark.read.parquet(f.toString).schema
      spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/staging-${f.getName}")
      val part = new java.io.File(s"$dir/staging-${f.getName}")
        .listFiles().filter(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$dir/${f.getName}"))
    }
    dir.toString
  }

  test("every declared query returns 0 rows on an empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, emptyDir).count()
          if (n == 0) None else Some(s"$name: $n rows from empty input")
        } catch {
          case e: Throwable =>
            Some(s"$name threw ${e.getClass.getSimpleName}: " +
              e.getMessage.take(120))
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
