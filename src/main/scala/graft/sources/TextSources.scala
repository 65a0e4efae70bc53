package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus ingestion from the text interchange formats a real pipeline
  * receives — JSONL (the de-facto corpus dump format: one document per
  * line) and CSV (metadata exports) — landing on the SAME schema as the
  * parquet `documents` table, so every operator downstream is
  * source-agnostic (EtlSpec proves it by running the quality gate over
  * all three sources and asserting identical results).
  *
  * Scale posture, explicitly:
  *   - ALWAYS an explicit schema — schema inference is a full extra scan
  *     (a second pass over 100 TB) and infers from a sample, so a late
  *     malformed row flips a column type mid-job. The schema is pinned
  *     once here.
  *   - PERMISSIVE mode with a corrupt-record column — at corpus scale
  *     malformed lines are a certainty; FAILFAST kills a day-long job on
  *     line 40 billion and DROPMALFORMED silently changes corpus
  *     statistics. Quarantining keeps the job running AND the loss
  *     auditable ([[quarantine]] splits the frames; the bad side is a
  *     writable audit table, not a log line).
  *   - JSONL splits by line, so a 100 TB dump parallelizes for free. CSV
  *     only splits when values embed no newlines; `multiLine=true` makes
  *     each FILE one split (a scale non-starter) — so the CSV reader here
  *     stays line-split and relies on the writer quoting, the right
  *     default for machine-written exports.
  */
object TextSources {

  /** The documents schema (mirrors the driver parquet, TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val Corrupt = "_corrupt_record"
  private val withCorrupt = documentsSchema.add(Corrupt, StringType)

  /** JSONL corpus source: explicit schema, malformed lines quarantined
    * into `_corrupt_record` instead of dropped or fatal. */
  def documentsJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)

  /** CSV corpus source: explicit schema + header, line-split (no
    * multiLine — see scale posture above), malformed rows quarantined. */
  def documentsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(withCorrupt)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .csv(path)

  /** Split a PERMISSIVE read into (clean documents, quarantined lines).
    * Clean rows drop the corrupt column and match [[documentsSchema]]
    * exactly; quarantined rows keep the raw line for the audit table.
    *
    * The parsed frame is cached first — Spark refuses to answer queries
    * that reference ONLY `_corrupt_record` against the raw file (the
    * parser would have to re-read just to re-fail), and semantically the
    * split should be ONE pass feeding both sides anyway: at scale the
    * equivalent is persisting the parsed read to a staging table and
    * deriving both the corpus and the audit from it. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.cache()
    val good = parsed.filter(col(Corrupt).isNull)
      .select(documentsSchema.fieldNames.map(col).toIndexedSeq: _*)
    val bad = parsed.filter(col(Corrupt).isNotNull)
      .select(col(Corrupt).as("raw_line"))
    (good, bad)
  }
}
