package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.TextOps.h32

/** Corpus assembly operators for training-data pipelines (extension
  * surface, SURVEY §7.4 companion tier to [[Dedup]]/[[TextOps]]):
  * deterministic train/val/test splitting and exact-quota stratified
  * sampling. Both are pure hash arithmetic over the md5-based
  * [[TextOps.h32]] primitive — no RNG, no driver state — so assignments
  * are reproducible across runs, engines (DuckDB replays them
  * bit-for-bit) and cluster sizes, which is the property a training
  * pipeline actually needs from "random" splits: adding documents never
  * reassigns existing ones, and re-running never shuffles the split.
  */
object Corpus {

  /** `split_assign`: deterministic train/val/test assignment — bucket =
    * h32("split:" + doc_id) mod 100, train < `trainPct` ≤ val <
    * `trainPct + valPct` ≤ test. The salt prefix decorrelates the split
    * from every other doc_id-hash use (fingerprints, sampling), the
    * classic independent-hash-per-purpose rule.
    *
    * Scale posture: scan→project, shuffle-free — the assignment column
    * is computable inside any other pipeline stage for free. At 100 TB
    * the split is stable under corpus growth (a new document's bucket
    * depends only on its own id), unlike sampling by position or RNG. */
  /** The split-assignment COLUMNS, composable into any pipeline stage
    * for free (the shuffle-free property PlanSpec asserts): bucket =
    * h32("split:" + id) mod 100, split by cumulative percentage. */
  def splitBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    h32(concat(lit("split:"), id)) % 100

  def splitOf(id: org.apache.spark.sql.Column, trainPct: Int = 80,
      valPct: Int = 10): org.apache.spark.sql.Column = {
    val bucket = splitBucket(id)
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  def splitAssign(spark: SparkSession, dir: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), splitBucket(col("doc_id")).as("bucket"),
        splitOf(col("doc_id"), trainPct, valPct).as("split"))
      .orderBy("doc_id")

  /** `sample_stratified`: exact per-stratum quota sampling — the `quota`
    * documents with the smallest salted hash per language, ranked
    * deterministically (h, then doc_id). Equivalent to a seeded uniform
    * draw per stratum, but reproducible and engine-replayable.
    *
    * Scale posture: the naive form — `row_number() OVER (PARTITION BY
    * lang)` over the full corpus — funnels each stratum through one
    * task, and at 100 TB the biggest language IS most of the corpus.
    * Instead: per-stratum counts (tiny agg) derive a hash THRESHOLD
    * keeping ~`safety`×quota expected survivors, the window ranks only
    * those (strata bounded by construction), and any stratum the
    * prefilter left short of its quota — astronomically unlikely at
    * safety=4, but possible on adversarial hash clustering — falls back
    * to ranking that stratum unfiltered. Both paths rank identically,
    * so the output is EXACTLY the naive form's (the DuckDB oracle runs
    * the naive form), while no executor ever sorts more than
    * ~safety×quota rows per healthy stratum. */
  def sampleStratified(spark: SparkSession, dir: String, quota: Int = 50,
      safety: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        h32(concat(lit("strat:"), col("doc_id"))).as("h"))
    // per-stratum thresholds: one row per language — tiny in practice
    // but DATA-DEPENDENT (a pathological corpus could carry millions of
    // distinct lang values), so like collab_topk's candidate set these
    // joins carry NO broadcast hint: plain equi-keys, AQE broadcasts
    // only when the runtime size actually fits (the repo's own plan
    // guard rejects a forced broadcast of an unbounded distinct set)
    val thr = docs.groupBy("lang")
      .agg(count(lit(1)).as("n"))
      .select(col("lang"),
        least(lit(1L << 32),
          ceil(lit((1L << 32).toDouble) * quota * safety / col("n"))
            .cast("long")).as("thr"))
    val survivors = docs.join(thr, "lang")
      .filter(col("h") <= col("thr"))
      .select("doc_id", "lang", "h")
    // short strata from the FULL stratum list (thr), not from the
    // survivor counts — a stratum the filter emptied entirely must
    // still fall back
    val survCnt = survivors.groupBy("lang").agg(count(lit(1)).as("m"))
    val short = thr.select("lang")
      .join(survCnt, Seq("lang"), "left_outer")
      .filter(coalesce(col("m"), lit(0L)) < quota)
      .select("lang")
    val ranked = survivors
      .join(short, Seq("lang"), "left_anti")
      .unionByName(docs.join(short, Seq("lang"), "left_semi"))
    val w = Window.partitionBy("lang").orderBy(asc("h"), asc("doc_id"))
    ranked.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .select(col("lang"), col("rk").cast("long").as("rk"), col("doc_id"))
      .orderBy("lang", "rk")
  }
}
