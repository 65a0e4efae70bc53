package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Approximate-nearest-neighbor search over the embedding column
  * (extension surface, SURVEY §7.4). Vectors are float32 in the parquet;
  * all arithmetic casts to double first so both engines see identical
  * bits. The dot/norm folds are `aggregate`/`zip_with` array expressions —
  * codegen'd, no UDF.
  *
  * Scale posture: brute force is the correctness baseline (O(N) per probe,
  * broadcast the probes); the bucketed variant is the 100 TB path — a
  * deterministic sign-quantization over the leading dimensions plays the
  * role of an IVF coarse quantizer, turning the scan into an equi-join on
  * bucket id. Recall/cost trades by bucket bit-width exactly as IVF nlist
  * does; a learned quantizer would drop in behind the same bucket column.
  */
object Similarity {

  // plain cast, not a transform lambda: float→double widening is exact
  // and the Cast stays inside whole-stage codegen (HOF lambdas don't)
  private def asDouble(c: Column): Column =
    c.cast("array<double>")

  // native codegen'd expressions (graft.functions.VectorExpressions) —
  // bit-identical to the aggregate/zip_with folds (VectorExprSpec) but a
  // fused primitive loop with no intermediate array
  private val dot = "graft_dot(v, pv)"
  private val norm2 = (c: String) => s"graft_norm2($c)"

  private def vectors(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
  }

  /** `sim_topk`: brute-force cosine top-k for the probe vector (min
    * vec_id — same deterministic-parameter convention as the seed
    * customer). */
  def simTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val e = vectors(spark, dir)
    val probe = e.orderBy("vec_id").limit(1)
      .select(col("vec_id").as("pid"), col("v").as("pv"))
    e.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("vec_id"),
        round(expr(dot) /
          (sqrt(expr(norm2("v"))) * sqrt(expr(norm2("pv")))), 6)
          .as("cosine"))
      .orderBy(desc("cosine"), asc("vec_id"))
      .limit(k)
  }

  /** Deterministic sign-quantization bucket over the first `signDims`
    * dimensions of array column `arr` — the IVF-style coarse partition.
    * Dimension-guarded: `size(arr) > i` short-circuits before the
    * `element_at` (Spark's And does not evaluate the right side when the
    * left is false, in eval and codegen both), so vectors shorter than
    * `signDims` bucket on their available signs instead of relying on
    * non-ANSI NULL-on-out-of-bounds — safe under
    * spark.sql.ansi.enabled=true. */
  private def signBucket(arr: Column, signDims: Int): Column =
    (0 until signDims)
      .map(i =>
        when(size(arr) > i && element_at(arr, i + 1) > 0, lit(1L << i))
          .otherwise(0L))
      .reduce(_ + _)

  private def bucketOf(signDims: Int): Column = signBucket(col("v"), signDims)

  /** `dedup_embedding`: embedding-cosine near-duplicate pairs — all pairs
    * sharing a sign-bucket (the LSH-style candidate filter: near-identical
    * vectors agree on every leading-dimension sign), scored by exact
    * cosine, highest first. The bucket equi-join bounds the pairwise work
    * per bucket exactly as MinHash banding does for text
    * ([[Dedup.dedupMinhash]]); the hot-bucket guard drops degenerate
    * cells (e.g. a mass of all-equal or all-zero vectors collapsing into
    * one sign pattern) whose in-bucket all-pairs join would go quadratic.
    * The sf0.1 maximum bucket is 16, so the default never fires on
    * oracle-checked data. */
  def dedupEmbedding(spark: SparkSession, dir: String, signDims: Int = 8,
      limit: Int = 100, maxBucket: Int = 1000): DataFrame = {
    val e = graft.model.BuilderCache.memo(spark,
        s"embBuckets:$dir:$signDims:$maxBucket") {
      Dedup.dropHotBuckets(
        vectors(spark, dir).withColumn("bucket", bucketOf(signDims)),
        Seq("bucket"), maxBucket)
    }
    val pairs = e.as("x").join(e.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("p1"), col("y.vec_id").as("p2"),
        col("x.v").as("v"), col("y.v").as("pv"))
    pairs.select(col("p1"), col("p2"),
        round(expr(dot) /
          (sqrt(expr(norm2("v"))) * sqrt(expr(norm2("pv")))), 6)
          .as("cosine"))
      .orderBy(desc("cosine"), asc("p1"), asc("p2"))
      .limit(limit)
  }

  /** `semdedup_fixed`: semantic deduplication over the embedding space —
    * the SemDeDup scheme (Abbas et al. 2023, arXiv:2303.09540, "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the corpus, then WITHIN each cluster mark
    * every vector that sits within cosine τ of a higher-priority vector
    * as a semantic duplicate, keeping one representative per
    * neighborhood. Complements the exact/near-dup text tier
    * ([[graft.operators.Dedup]]) and [[dedupEmbedding]]'s top-pairs
    * report: this is the per-vector KEEP/DROP verdict a curation
    * pipeline applies, plus `max_cos` — the vector's semantic-redundancy
    * score (its closest in-cluster neighbor), the quantity SemDeDup
    * thresholds on. Priority = lower vec_id (deterministic, the repo's
    * min-id survivor convention, [[Dedup.dedupSurvivors]]); clustering =
    * the [[knnIvfFixed]] fixed centroids (first `nClusters` vec_ids,
    * same argmin arithmetic — the three fixed-centroid queries pin each
    * other), so every step is SQL-expressible and the DuckDB oracle
    * replays the verdicts bit-for-bit. A vector with no cluster peer
    * keeps `max_cos` NULL and `keep = true`.
    *
    * Scale posture: the published algorithm's whole point is that
    * clustering BOUNDS the quadratic — pairwise cosine runs only inside
    * a cell, so cost is Σ|cell|², and `nClusters` is the scale knob
    * (SemDeDup uses 50k clusters on LAION-440M; cells stay ~10⁴ rows at
    * any corpus size when nClusters grows with N — here 16 cells match
    * the test-scale knn_ivf_fixed topology). The cell equi-join carries
    * no broadcast hint (cell population is data-dependent); the
    * [[Dedup.dropHotBuckets]] guard excludes degenerate cells (>
    * `maxCell` rows, e.g. a mass of identical vectors collapsing into
    * one cell) from pair generation entirely — their members emit
    * `max_cos` NULL / `keep = true`, the same conservative lower-bound
    * semantics as [[dedupEmbedding]]'s guard: an oversized cell demands
    * a finer quantizer, not a quadratic join. sf0.1 max cell is 148, so
    * the default never fires on oracle-checked data (GuardSpec feeds the
    * degenerate case). */
  def semdedupFixed(spark: SparkSession, dir: String, nClusters: Int = 16,
      tau: Double = 0.4, maxCell: Int = 1000): DataFrame =
    semdedupFixedOf(vectors(spark, dir), nClusters, tau, maxCell)

  /** [[semdedupFixed]] over any (vec_id, v) relation — the
    * fixture-testable form (callers must have
    * [[graft.functions.VectorExpressions]] registered). */
  private[graft] def semdedupFixedOf(e: DataFrame, nClusters: Int = 16,
      tau: Double = 0.4, maxCell: Int = 1000): DataFrame = {
    val cents = e.orderBy("vec_id").limit(nClusters)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val argmin = Window.partitionBy("vec_id")
      .orderBy(asc("d2"), asc("cell"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("d2",
        expr("graft_norm2(cv)") - lit(2.0) * expr("graft_dot(cv, v)"))
      .withColumn("ark", row_number().over(argmin))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("v"), col("cell"))
    val cool = Dedup.dropHotBuckets(assigned, Seq("cell"), maxCell)
    // both orientations of each in-cell pair, so the per-vector max and
    // the lower-id-peer drop test are one groupBy over the same stream
    val pairs = cool.as("a")
      .join(cool.select(col("cell"), col("vec_id").as("pid"),
        col("v").as("pv")).as("b"),
        col("a.cell") === col("b.cell") && col("vec_id") =!= col("pid"))
      .select(col("vec_id"), col("pid"),
        round(expr(dot) /
          (sqrt(expr(norm2("v"))) * sqrt(expr(norm2("pv")))), 6)
          .as("cosine"))
    val perVec = pairs.groupBy("vec_id")
      .agg(max(col("cosine")).as("max_cos"),
        max(when(col("pid") < col("vec_id") && col("cosine") >= tau, 1)
          .otherwise(0)).as("drp"))
    assigned.join(perVec, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"), col("max_cos"),
        (coalesce(col("drp"), lit(0)) === 0).as("keep"))
      .orderBy("vec_id")
  }

  /** `knn_multiprobe`: ANN with the IVF `nprobe` lever — each probe
    * searches its own sign-bucket PLUS every bucket at hamming distance 1
    * (one flipped quantization bit), the standard multi-probe LSH recall
    * fix: a near neighbor that lands on the other side of one hyperplane
    * is no longer missed. Still an equi-join — the probe side explodes to
    * (signDims+1) candidate bucket ids (tiny, broadcast), the corpus side
    * never fans out. Recall grows from 1 bucket to signDims+1 buckets of
    * candidates per probe at the same shuffle shape; cost stays bounded
    * by bucket sizes, monotone in `signDims`. */
  def knnMultiProbe(spark: SparkSession, dir: String, signDims: Int = 8,
      nProbes: Int = 5, k: Int = 5): DataFrame = {
    val e = vectors(spark, dir).withColumn("bucket", bucketOf(signDims))
    val probes = e.orderBy("vec_id").limit(nProbes)
      .select(col("vec_id").as("pid"), col("v").as("pv"),
        col("bucket").as("pbucket"))
    val candBuckets = probes.select(col("pid"), col("pv"),
      explode(array(col("pbucket") +:
        (0 until signDims).map(b => col("pbucket")
          .bitwiseXOR(lit(1L << b))): _*)).as("cb"))
    val scored = e.join(broadcast(candBuckets),
        col("bucket") === col("cb") && col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        round(expr(dot) /
          (sqrt(expr(norm2("v"))) * sqrt(expr(norm2("pv")))), 6)
          .as("cosine"))
    val w = Window.partitionBy("pid")
      .orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cosine"))
      .orderBy("pid", "rank")
  }

  /** `knn_ivf`: ANN with a LEARNED coarse quantizer — k-means centroids
    * (Spark ML, fixed seed + bounded iterations) instead of the fixed
    * sign hyperplanes: this is actual IVF, where cells adapt to the data
    * distribution and occupancy stays balanced even when the corpus
    * doesn't straddle the axes. The query shape is unchanged — bucket =
    * nearest centroid, probes equi-join candidate cells, per-probe
    * top-k window — and the multiprobe lever is real: each probe
    * searches its `nCells` nearest centroid cells (IVF nprobe), with
    * nCells = nClusters provably equal to the exhaustive scan
    * (ExtensionSpec). Like PageRank, the k-means fixpoint is
    * iterative and float-order-sensitive → no DuckDB oracle by design;
    * ScalaTest pins the invariants instead (every returned score is
    * brute-force-exact; every assignment is the argmin centroid).
    * At 100 TB: training runs on a seeded SAMPLE ([[ivfTrainingSet]]) —
    * k-means needs only enough rows to place `nClusters` centroids, not
    * the corpus — and the full table is touched exactly once per
    * iteration-free ASSIGNMENT pass (`model.transform`, a narrow map
    * against the driver-broadcast centroid table); the bucket column
    * then behaves exactly like [[bucketOf]]'s. */
  /** Memoized k-means quantizer per (application, dir, k): fixed seed +
    * deterministic training set → refits would be identical, the memo
    * just avoids paying them. */
  private val models = scala.collection.concurrent.TrieMap
    .empty[(String, String, Int), org.apache.spark.ml.clustering.KMeansModel]

  private def ivfModel(spark: SparkSession, dir: String, nClusters: Int,
      e: DataFrame) =
    models.getOrElseUpdate(
      (spark.sparkContext.applicationId, dir, nClusters), {
        import org.apache.spark.ml.clustering.KMeans
        new KMeans().setK(nClusters).setSeed(7L).setMaxIter(5)
          .setFeaturesCol("fv").setPredictionCol("bucket")
          .fit(ivfTrainingSet(e, nClusters))
      })

  def knnIvf(spark: SparkSession, dir: String, nClusters: Int = 16,
      nProbes: Int = 5, k: Int = 5, nCells: Int = 3): DataFrame = {
    import spark.implicits._
    val e = graft.model.BuilderCache.memo(spark, s"ivfVectors:$dir") {
      import org.apache.spark.ml.functions.array_to_vector
      vectors(spark, dir).withColumn("fv", array_to_vector(col("v")))
    }
    if (e.isEmpty) // no vectors → no quantizer to train, empty result
      return e.select(col("vec_id").as("pid"), lit(0L).as("rank"),
        col("vec_id"), lit(0.0).as("cosine")).limit(0)
    val model = ivfModel(spark, dir, nClusters, e)
    // the fitted assignment is itself a builder: one k-means fit + one
    // assignment pass per (session, dir, k), however many probes ask
    val eb = graft.model.BuilderCache.memo(spark,
        s"ivfAssigned:$dir:$nClusters") {
      model.transform(e)
        .select(col("vec_id"), col("v"), col("bucket").cast("long").as("bucket"))
    }
    val probes = eb.orderBy("vec_id").limit(nProbes)
      .select(col("vec_id").as("pid"), col("v").as("pv"))
    // IVF nprobe: each probe searches its `nCells` NEAREST centroid
    // cells (the assigned cell is always among them — it is the argmin).
    // The centroid table is a literal bounded relation (nClusters rows,
    // driver-held by Spark ML itself), so the cross join + broadcast are
    // provably bounded; |pv|² is constant per probe, so ranking cells by
    // |c|² − 2·c·p ranks by true distance.
    val cents = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }.toSeq.toDF("cell", "cv")
    val cellRank = Window.partitionBy("pid")
      .orderBy(asc("d2"), asc("cell"))
    val candBuckets = probes.crossJoin(broadcast(cents))
      .withColumn("d2",
        expr("graft_norm2(cv)") - lit(2.0) * expr("graft_dot(cv, pv)"))
      .withColumn("crk", row_number().over(cellRank))
      .filter(col("crk") <= nCells)
      .select(col("pid"), col("pv"), col("cell").as("cb"))
    val scored = eb.join(broadcast(candBuckets),
        col("bucket") === col("cb") && col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        round(expr(dot) /
          (sqrt(expr(norm2("v"))) * sqrt(expr(norm2("pv")))), 6)
          .as("cosine"))
    val w = Window.partitionBy("pid")
      .orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cosine"))
      .orderBy("pid", "rank")
  }

  /** `knn_ivf_fixed`: the hash-checkable twin of [[knnIvf]] — the SAME
    * IVF topology (assign each vector to its nearest centroid cell →
    * each probe searches its `nCells` nearest cells → exact cosine
    * within the candidate cells → top-k), but with FIXED centroids (the
    * vectors of the first `nClusters` vec_ids, cell id = that vec_id)
    * instead of learned k-means means. No iterative float state →
    * every step is SQL-expressible and the DuckDB oracle replays the
    * whole pipeline bit-for-bit, moving the IVF candidate-generation +
    * scoring machinery into the hash gate (knn_ivf itself stays
    * invariant-tested: learned centroids are engine-specific by
    * design). Assignment ranks cells by |c|² − 2·c·v (|v|² is constant
    * per vector), ties by cell id — the same arithmetic [[knnIvf]]
    * uses for its probe-side cell ranking, computed by the codegen'd
    * [[graft.functions.VectorExpressions]] folds whose index order the
    * DuckDB `list_transform` oracles are proven to match.
    *
    * Scale posture: identical to [[knnIvf]]'s assignment pass — the
    * centroid table is a `limit(nClusters)` bounded relation
    * (broadcast-safe by maxRows), the argmin is a per-vector window
    * over nClusters rows, and the candidate join fans each vector out
    * to at most the probes sharing its cell. */
  def knnIvfFixed(spark: SparkSession, dir: String, nClusters: Int = 16,
      nProbes: Int = 5, k: Int = 5, nCells: Int = 3): DataFrame = {
    val e = vectors(spark, dir)
    val cents = e.orderBy("vec_id").limit(nClusters)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val d2 = expr("graft_norm2(cv)") - lit(2.0) * expr("graft_dot(cv, v)")
    val argmin = Window.partitionBy("vec_id")
      .orderBy(asc("d2"), asc("cell"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("d2", d2)
      .withColumn("ark", row_number().over(argmin))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("v"), col("cell").as("bucket"))
    val probes = e.orderBy("vec_id").limit(nProbes)
      .select(col("vec_id").as("pid"), col("v").as("pv"))
    val cellRank = Window.partitionBy("pid")
      .orderBy(asc("d2"), asc("cell"))
    val candBuckets = probes.crossJoin(broadcast(cents))
      .withColumn("d2",
        expr("graft_norm2(cv)") - lit(2.0) * expr("graft_dot(cv, pv)"))
      .withColumn("crk", row_number().over(cellRank))
      .filter(col("crk") <= nCells)
      .select(col("pid"), col("pv"), col("cell").as("cb"))
    val scored = assigned.join(broadcast(candBuckets),
        col("bucket") === col("cb") && col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        round(expr(dot) /
          (sqrt(expr(norm2("v"))) * sqrt(expr(norm2("pv")))), 6)
          .as("cosine"))
    val w = Window.partitionBy("pid")
      .orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cosine"))
      .orderBy("pid", "rank")
  }

  /** `cluster_stats`: the semantic-cluster audit over the embedding
    * space — assign every vector to its nearest of the [[knnIvfFixed]]
    * fixed centroids (same argmin arithmetic, so the two queries pin
    * each other), then per cluster: size, mean cosine-to-centroid (the
    * cluster's coherence), and the label MODE with its purity (how well
    * unsupervised cells recover the labeled classes — the topic-balance
    * report a curation pipeline reads before up/down-weighting semantic
    * regions, and the standard external cluster-quality check while
    * labels are available). Mean cosine avoids cross-row float
    * accumulation entirely: each cosine rounds once, quantizes to an
    * exact micro-unit long, sums exactly (order-free), and divides back
    * out once — bit-stable under any partitioning, replayed exactly by
    * the DuckDB oracle.
    *
    * Scale posture: the centroid table is `limit(nClusters)` bounded →
    * broadcast-safe by maxRows; assignment is one narrow pass with a
    * vec_id-keyed argmin window (no corpus shuffle beyond it); both
    * rollups are partial-aggregated shuffles keyed by cell — at most
    * nClusters × nLabels rows survive the map side. */
  def clusterStats(spark: SparkSession, dir: String,
      nClusters: Int = 16): DataFrame = {
    graft.functions.VectorExpressions.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"),
        col("label").cast("long").as("label"))
    val cents = e.orderBy("vec_id").limit(nClusters)
      .select(col("vec_id").as("cell"), col("v").as("cv"))
    val argmin = Window.partitionBy("vec_id")
      .orderBy(asc("d2"), asc("cell"))
    val assigned = e.crossJoin(broadcast(cents))
      .withColumn("d2",
        expr("graft_norm2(cv)") - lit(2.0) * expr("graft_dot(cv, v)"))
      .withColumn("ark", row_number().over(argmin))
      .filter(col("ark") === 1)
      .select(col("vec_id"), col("label"), col("cell"),
        round(round(expr("graft_dot(cv, v)") /
          (sqrt(expr(norm2("v"))) * sqrt(expr("graft_norm2(cv)"))), 6)
          * 1000000).cast("long").as("cos_micro"))
    val perCell = assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), sum("cos_micro").as("sum_micro"))
    val lrk = Window.partitionBy("cell").orderBy(desc("ln"), asc("label"))
    val top = assigned.groupBy("cell", "label")
      .agg(count(lit(1)).as("ln"))
      .withColumn("lrk", row_number().over(lrk))
      .filter(col("lrk") === 1)
      .select(col("cell"), col("label").as("top_label"),
        col("ln").as("top_label_n"))
    perCell.join(top, "cell")
      .select(col("cell"), col("n_vecs"),
        round(col("sum_micro").cast("double")
          / (col("n_vecs") * 1000000L).cast("double"), 6).as("mean_cos"),
        col("top_label"), col("top_label_n"),
        round(col("top_label_n") / col("n_vecs").cast("double"), 6)
          .as("purity"))
      .orderBy("cell")
  }

  /** Quantizer training set: a seeded 10% sample of the vector table —
    * centroid placement needs sampling density, not the corpus, so the
    * k-means iterations scan ~N/10 rows instead of N per pass (at 100 TB
    * the fraction shrinks further; 256 cells train fine on millions of
    * rows, never billions). Falls back to the full table only when the
    * sample is too thin to separate `nClusters` centroids (tiny sf dirs),
    * so small-scale correctness tests and large-scale cost see the same
    * code path. Seeded → deterministic within a session; knn_ivf is
    * invariant-tested (no cross-engine oracle), so sample-vs-full changes
    * centroids, never the score/assignment invariants. */
  private[graft] def ivfTrainingSet(e: DataFrame, nClusters: Int,
      fraction: Double = 0.1): DataFrame = {
    val sample = e.sample(withReplacement = false, fraction, seed = 7L)
    if (sample.count() >= nClusters.toLong * 8) sample else e
  }

  /** `embed_quantize`: symmetric int8 quantization per embedding — the
    * compression step a 100 TB ANN index applies before storage (4×
    * smaller than float32, SIMD-friendly dot products): per vector,
    * scale = 127/max|x| and q_i = floor(x_i·scale + 0.5), so values
    * span [-127, 127] with the sign structure preserved. Declared
    * output is the quantization SUMMARY (scale, q_min/q_max/q_sum) —
    * exact integers plus one rounded double, chosen so DuckDB replays
    * it bit-for-bit: max is order-insensitive, 127/maxabs is a single
    * correctly-rounded division, each x·scale+0.5→floor chain is three
    * exact-deterministic double ops, and the q-sums are integer
    * arithmetic. The full q-vector stays internal (same contract as
    * [[graft.operators.Multimodal]]'s float features).
    *
    * Scale posture: embarrassingly parallel — scan→project, zero
    * shuffles except the deterministic output sort; the quantized
    * array would be written columnar next to the bucket id, and the
    * reconstruction bound (|x − q/scale| ≤ 1/(2·scale), ExtensionSpec)
    * is the standard scalar-quantization recall argument. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    val e = vectors(spark, dir)
    e.select(col("vec_id"), col("v"),
        expr("aggregate(v, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))")
          .as("maxabs"))
      .withColumn("scale",
        when(col("maxabs") > 0, lit(127.0) / col("maxabs")).otherwise(0.0))
      .withColumn("qs",
        expr("transform(v, x -> CAST(floor(x * scale + 0.5D) AS BIGINT))"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        expr("CAST(array_min(qs) AS BIGINT)").as("q_min"),
        expr("CAST(array_max(qs) AS BIGINT)").as("q_max"),
        expr("aggregate(qs, CAST(0 AS BIGINT), (a, q) -> a + q)").as("q_sum"))
      .orderBy("vec_id")
  }

  /** The quantized vectors themselves (internal form for tests and
    * downstream index builds): (vec_id, scale, qs). */
  private[graft] def quantizedVectors(spark: SparkSession,
      dir: String): DataFrame =
    vectors(spark, dir)
      .select(col("vec_id"), col("v"),
        expr("aggregate(v, CAST(0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))")
          .as("maxabs"))
      .withColumn("scale",
        when(col("maxabs") > 0, lit(127.0) / col("maxabs")).otherwise(0.0))
      .select(col("vec_id"), col("v"), col("scale"),
        expr("transform(v, x -> CAST(floor(x * scale + 0.5D) AS BIGINT))")
          .as("qs"))

  /** `knn_quantized`: ANN over the int8-quantized vectors — the query
    * path that justifies [[embedQuantize]] at 100 TB: candidates are
    * scored by the INTEGER dot product alone, because in
    * cos ≈ Σ(qa/sa)(qb/sb) / (|qa|/sa · |qb|/sb) the scales cancel —
    * quantized cosine = Σqa·qb / (√Σqa² · √Σqb²), pure int64 folds plus
    * two square roots. A production index stores only (bucket, qs):
    * 4× smaller scans, SIMD integer dots, no float payload. Same
    * bucket-equi-join + per-probe rank shape as [[knnBucketed]]; the
    * sign bucket is computed FROM the quantized values (quantization
    * preserves signs), so the float vector is never needed after the
    * one-time quantization pass. Scores approximate exact cosine within
    * the scalar-quantization error (ExtensionSpec pins the tolerance
    * and top-k recall vs the exact scorer) — but the quantized
    * computation ITSELF is deterministic end-to-end (the quantization
    * chain is engine-exact, see [[embedQuantize]]; the dots are pure
    * integer arithmetic), so unlike knn_ivf this path is DuckDB
    * oracle-checked. */
  def knnQuantized(spark: SparkSession, dir: String, signDims: Int = 8,
      nProbes: Int = 5, k: Int = 5): DataFrame = {
    val q = quantizedVectors(spark, dir)
      .select(col("vec_id"), col("qs"),
        signBucket(col("qs"), signDims).as("bucket"))
    val probes = q.orderBy("vec_id").limit(nProbes)
      .select(col("vec_id").as("pid"), col("qs").as("ps"),
        col("bucket").as("pbucket"))
    val scored = q.join(broadcast(probes),
        col("bucket") === col("pbucket") && col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        round(
          expr("aggregate(zip_with(qs, ps, (a, b) -> a * b), " +
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").cast("double") /
            (sqrt(expr("aggregate(qs, CAST(0 AS BIGINT), " +
              "(acc, x) -> acc + x * x)").cast("double")) *
             sqrt(expr("aggregate(ps, CAST(0 AS BIGINT), " +
               "(acc, x) -> acc + x * x)").cast("double"))), 6)
          .as("cosine"))
    val w = Window.partitionBy("pid")
      .orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cosine"))
      .orderBy("pid", "rank")
  }

  /** `knn_bucketed`: ANN — probes (the `nProbes` lowest vec_ids) matched
    * only against vectors in the same sign-bucket; per-probe top-k via a
    * rank window. The bucket equi-join replaces the all-pairs cross join:
    * at 100 TB this is one shuffle on bucket id instead of a broadcast
    * scan per probe batch. */
  def knnBucketed(spark: SparkSession, dir: String, signDims: Int = 8,
      nProbes: Int = 5, k: Int = 5): DataFrame = {
    val e = vectors(spark, dir).withColumn("bucket", bucketOf(signDims))
    val probes = e.orderBy("vec_id").limit(nProbes)
      .select(col("vec_id").as("pid"), col("v").as("pv"),
        col("bucket").as("pbucket"))
    val scored = e.join(broadcast(probes),
        col("bucket") === col("pbucket") && col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        round(expr(dot) /
          (sqrt(expr(norm2("v"))) * sqrt(expr(norm2("pv")))), 6)
          .as("cosine"))
    val w = Window.partitionBy("pid")
      .orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cosine"))
      .orderBy("pid", "rank")
  }
}
