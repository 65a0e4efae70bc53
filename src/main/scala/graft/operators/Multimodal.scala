package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multimodal column plumbing (extension surface): image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs partition-parallel over a typed
  * Dataset. The actual codec is STUBBED — this container has no
  * image/audio libraries — with a deterministic byte-level feature
  * extractor, clearly marked below; everything around it (schema, batch
  * shape, partition-parallel execution, output contract) is the real
  * Spark plumbing a production decoder would drop into.
  *
  * Scale posture: payload bytes never pass through a shuffle — decode is
  * a narrow `mapPartitions` directly over the scan, and only the small
  * fixed-width feature vectors flow downstream. At 100 TB the payloads
  * live in the parquet (or object-store pointers) and per-file
  * parallelism is the unit of scale; batch size per partition is
  * controlled by `spark.sql.files.maxPartitionBytes`.
  */
object Multimodal {

  /** One media asset: payload + typed metadata (the schema a real
    * ingest would carry: media kind, declared format, source id). */
  final case class Asset(asset_id: Long, kind: String, format: String,
      payload: Array[Byte])

  /** Extracted features: fixed-width vector + basic stats. */
  final case class AssetFeatures(asset_id: Long, kind: String,
      n_bytes: Long, features: Array[Float])

  /** Stand-in asset table derived from `documents` (the testdata has no
    * binary table): payload = UTF-8 bytes of the text, kind/format cycled
    * deterministically. Real deployments replace this with a binary
    * parquet scan. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        element_at(array(lit("png"), lit("wav"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Asset]
  }

  /** ==== STUB ====
    * Deterministic fake decoder: a 16-bin byte histogram, normalized.
    * A real implementation would decode the payload with an image/audio
    * codec here (partition-local, no Spark API in the hot loop) and emit
    * e.g. resized pixels or mel features. The signature and batch shape
    * (Iterator→Iterator, one JVM object reuse scope per partition) are
    * exactly what the real codec needs. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](16)
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) >> 4) += 1f
      i += 1
    }
    if (payload.length > 0) {
      var j = 0
      while (j < 16) { bins(j) /= payload.length.toFloat; j += 1 }
    }
    bins
  }

  /** `multimodal_features`: partition-parallel decode + feature extract.
    * mapPartitions (not a per-row UDF) so a real codec can amortize
    * per-partition setup (decoder contexts, native buffers). */
  def features(spark: SparkSession, dir: String): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets(spark, dir).mapPartitions { it =>
      it.map { a =>
        AssetFeatures(a.asset_id, a.kind, a.payload.length.toLong,
          decodeStub(a.payload))
      }
    }
  }

  /** Declared-query form: stable columns, deterministic order. The float
    * vector stays internal (fp comparison nondeterminism); the scalar
    * projection is exact. */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        size(col("features")).cast("long").as("dim"))
      .orderBy("asset_id")

  /** One sampled frame: position, size, and a 32-bit content
    * fingerprint of the raw frame bytes. */
  final case class Frame(asset_id: Long, frame_idx: Long, n_bytes: Long,
      frame_fp: Long)

  /** `multimodal_frames`: frame sampling for video assets — every
    * `every`-th fixed-size byte window of the payload becomes one frame
    * row. The "demuxer" here is a byte slicer (==== STUB ====: a real
    * container demuxer slots into the same loop); the plumbing is the
    * production shape — `mapPartitions` over the typed asset Dataset so
    * the demuxer context (here the reused MessageDigest; in production a
    * codec handle + native buffers) is allocated once per PARTITION, and
    * payload bytes never shuffle: only (id, idx, size, fingerprint) rows
    * flow downstream. Oracle-checkable because the testdata payloads are
    * ASCII (byte windows == character windows, verified over every sf),
    * so DuckDB replays the exact slicing + md5 fingerprint in SQL. */
  def frameSample(spark: SparkSession, dir: String, frameSize: Int = 256,
      every: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    assets(spark, dir).filter(col("kind") === "video").mapPartitions { it =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { a =>
        val n = a.payload.length
        val nFrames = (n + frameSize - 1) / frameSize
        Iterator.range(0, nFrames, every).map { i =>
          val start = i * frameSize
          val len = math.min(frameSize, n - start)
          md5.reset()
          val hex = md5
            .digest(java.util.Arrays.copyOfRange(a.payload, start, start + len))
            .map("%02x".format(_)).mkString
          Frame(a.asset_id, i.toLong, len.toLong,
            java.lang.Long.parseLong(hex.substring(0, 8), 16))
        }
      }
    }
  }

  /** Declared-query form of [[frameSample]]. */
  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir).toDF()
      .orderBy("asset_id", "frame_idx")

  /** One resized asset: original and downsampled sizes plus a 32-bit
    * fingerprint of the downsampled bytes. */
  final case class Resized(asset_id: Long, n_bytes: Long,
      resized_bytes: Long, resized_fp: Long)

  /** `multimodal_resize`: nearest-neighbor downsampling for image assets
    * — keep every `factor`-th payload byte (==== STUB ====: a real
    * implementation decodes pixels and resamples; the nearest-neighbor
    * byte stride is the honest stand-in with identical data movement).
    * Same plumbing contract as [[frameSample]]: partition-amortized
    * context, no payload shuffle, small rows out. Oracle-checked for
    * factor=2 via the pair-regex in DuckDB (ASCII payloads, no
    * newlines — both verified over every sf). */
  def resize(spark: SparkSession, dir: String,
      factor: Int = 2): Dataset[Resized] = {
    import spark.implicits._
    assets(spark, dir).filter(col("kind") === "image").mapPartitions { it =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val out = new Array[Byte]((a.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = a.payload(i * factor); i += 1 }
        md5.reset()
        val hex = md5.digest(out).map("%02x".format(_)).mkString
        Resized(a.asset_id, a.payload.length.toLong, out.length.toLong,
          java.lang.Long.parseLong(hex.substring(0, 8), 16))
      }
    }
  }

  /** Declared-query form of [[resize]]. */
  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resize(spark, dir).toDF().orderBy("asset_id")
}
