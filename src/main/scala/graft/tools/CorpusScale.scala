package graft.tools

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.CorpusStream

/** Round-13 instrument, the CorpusStream half of the streaming scale
  * posture (r12 verdict item 5): replay a GenScale'd documents table
  * through [[CorpusStream.ingestStateful]] in `chunks` micro-batches
  * and measure what the scaladoc claims — per-batch latency =
  * per-batch pipeline + one store-probe equi-join whose STORE side
  * grows with the corpus (inherent to global dedup, not a leak), so
  * the latency slope across batches is the store-scan term, and the
  * band store's row growth tracks emitted documents × bands exactly.
  *
  * Usage: runMain graft.tools.CorpusScale <sfDir> [chunks=20] */
object CorpusScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val chunks = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val staging = Files.createTempDirectory("graft-corpusscale").toString
    val ck = Files.createTempDirectory("graft-corpusscale-ck").toString
    val out = Files.createTempDirectory("graft-corpusscale-out").toString
    val state = Files.createTempDirectory("graft-corpusscale-st").toString

    val docs = spark.read.schema(CorpusStream.documentsSchema)
      .parquet(s"$dir/documents.parquet")
    val nTotal = docs.count()
    println(s"CORPSCALE input dir=$dir docs=$nTotal chunks=$chunks")
    (0 until chunks).foreach { i =>
      val tmp = s"$staging/_tmp$i"
      docs.filter(pmod(col("doc_id"), lit(chunks)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, Paths.get(f"$staging/chunk$i%03d.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    val src = spark.readStream.schema(CorpusStream.documentsSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "chunk*.parquet")
      .parquet(staging)
    val t0 = System.nanoTime()
    val q = CorpusStream.ingestStateful(src, out, ck, state)
    q.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val progs = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    progs.foreach { p =>
      println(s"CORPBATCH batch=${p.batchId} in=${p.numInputRows} " +
        s"ms=${p.batchDuration}")
    }
    // partition-column types are INFERRED on read (batch_id comes back
    // as int) — cast before typed access
    val storeByBatch = spark.read.parquet(state)
      .groupBy(col("batch_id").cast("long").as("b")).count()
      .orderBy("b").collect()
    var cum = 0L
    storeByBatch.foreach { r =>
      cum += r.getLong(1)
      println(s"CORPSTORE batch=${r.getLong(0)} bands=${r.getLong(1)} " +
        s"cumBands=$cum")
    }
    val kept = spark.read.parquet(out).count()
    println(f"CORPSCALE result docs=$nTotal kept=$kept " +
      f"batches=${progs.length} wall=$wall%.1f s " +
      f"rate=${nTotal / wall}%.0f docs/s storeBands=$cum")
    spark.stop()
  }
}
