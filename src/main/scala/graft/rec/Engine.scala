package graft.rec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.algo.PageRank
import graft.model.BuilderCache
import graft.operators.{Recommend, Relational}

/** The tp1 `RecommendationEngine` re-expressed over DataFrames
  * (`tp1/knoledge_graphs/recommendation.py`) — the full three-strategy
  * blend including the personalized-PageRank component, with every edge
  * case the reference defines (SURVEY §7.5.4):
  *   - unknown customer → error (`recommendation.py:93-95`, P5);
  *   - seedless customer → global-PageRank fallback labeled
  *     `global_pagerank` (`recommendation.py:52,224-229`, G2);
  *   - candidates already seen are excluded (`recommendation.py:66-67`);
  *   - per-strategy max-normalization, max==0 → zeros
  *     (`recommendation.py:190-196`);
  *   - blend weights cooc 0.4 / similarity 0.3 / PPR 0.3
  *     (`recommendation.py:10-14`), non-positive totals dropped;
  *   - top-N by (-score, product_id), scores rounded to 6 dp
  *     (`recommendation.py:221`, `api.py:47-48`).
  *
  * The graph inputs are parameters (a [[ProductGraph]]) rather than table
  * reads: the reference builds its incidence from orders AND events
  * (`graph.py:55-66`); the driver testdata has no event→product edge, so
  * the testdata path uses order-derived incidence while the unit tests
  * feed the reference's exact toy graph and assert its golden outputs.
  */
object Engine {

  /** The derived graph structures of tp1 `GraphData` (`graph.py:19-33`):
    * catalog products, customer↔product incidence, directed co-occurrence
    * counts. The row-normalized adjacency (graph.py:70-77) derives from
    * `cooc` on demand. */
  final case class ProductGraph(
      customers: DataFrame, // (customer_id: Long)
      products: DataFrame,  // (id: Long)
      incidence: DataFrame, // (customer_id, product_id) distinct
      cooc: DataFrame)      // (src, dst, cnt)

  /** Testdata builder: order-derived incidence + lineitem co-occurrence. */
  def fromOrders(spark: SparkSession, dir: String): ProductGraph =
    ProductGraph(
      customers = spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("customer_id")),
      products = spark.read.parquet(s"$dir/part.parquet")
        .select(col("p_partkey").as("id")),
      incidence = Relational.bipartite(spark, dir),
      cooc = Relational.coocCounts(spark, dir))

  /** P5 existence guard (`recommendation.py:93-95`): unknown customer is
    * an error — distinct from a KNOWN customer with no interactions, who
    * gets the global fallback. */
  private def ensureKnown(g: ProductGraph, customerId: Long): Unit =
    require(!g.customers.filter(col("customer_id") === customerId).isEmpty,
      s"unknown customer id: $customerId")

  private def adjacency(g: ProductGraph): DataFrame = {
    val w = Window.partitionBy("src")
    g.cooc.select(col("src"), col("dst"),
      (col("cnt") / sum(col("cnt")).over(w)).as("weight"))
  }

  private val BlendCooc = 0.4
  private val BlendSim = 0.3
  private val BlendPpr = 0.3

  /** Bound on memoized per-personalization PageRank entries
    * (`engine.pprRanks:*`): each distinct customer pins one converged
    * rank table (catalog-sized — small, but a long-serving session sees
    * unbounded distinct customers). Beyond the cap the whole prefix is
    * evicted — epoch eviction: crude, O(1), and bounded; an evicted
    * customer's next request pays one fixpoint rebuild. The GLOBAL
    * fallback ranks live under their own `engine.pprGlobal` prefix
    * precisely so this eviction cannot touch them (round-5 advice:
    * every seedless request shares that one entry — evicting it made
    * the next seedless request re-pay the full fixpoint). */
  private[graft] val MaxPprEntries = 64

  private[graft] def boundPprCache(spark: SparkSession,
      max: Int = MaxPprEntries): Unit =
    if (BuilderCache.list(spark)
        .count(_.startsWith("engine.pprRanks")) >= max)
      BuilderCache.release(spark, "engine.pprRanks")

  /** `recommend_for_customer` (`recommendation.py:44-68`). Output:
    * (product_id, score, c_cooc, c_sim, c_ppr, c_global) — the per-
    * strategy contribution breakdown the reference's API returns. */
  def recommend(spark: SparkSession, gRaw: ProductGraph, customerId: Long,
      topN: Int = 3): DataFrame =
    recommendInternal(spark, gRaw, customerId, topN)._1

  /** Serving path ([[graft.serve.HttpApi]]): materializes the top-N and
    * releases the PER-REQUEST caches (this customer's seed set and
    * candidate table). A long-lived server answering many customers would
    * otherwise accumulate one cache entry per request; the session-level
    * builder caches (incidence, cooc, jaccard pairs, PageRank adjacency)
    * are shared across customers and stay. */
  def recommendRows(spark: SparkSession, gRaw: ProductGraph,
      customerId: Long, topN: Int = 3)
      : Array[org.apache.spark.sql.Row] = {
    val (df, perRequest) = recommendInternal(spark, gRaw, customerId, topN)
    val rows = df.collect()
    // blocking: the release must be visible before the response returns
    // (ServeSpec asserts zero steady-state cache growth); these are
    // request-sized frames, the synchronous unpersist is microseconds
    perRequest.foreach(_.unpersist(blocking = true))
    rows
  }

  private def recommendInternal(spark: SparkSession, gRaw: ProductGraph,
      customerId: Long, topN: Int): (DataFrame, Seq[DataFrame]) = {
    // T3: [1,10] clamp, default 3 (api.py:66) — shared with RecsApi
    val n = RecsApi.clampTopN(topN)
    ensureKnown(gRaw, customerId)
    // cooc feeds both the co-occurrence scores and the PPR adjacency, and
    // the incidence feeds seeds + jaccard sizes + jaccard pairs — cache
    // the shared inputs so the blend evaluates each subplan once; via the
    // registry so repeated requests over the same graph never re-mark
    val g = gRaw.copy(
      incidence = BuilderCache.ensureCached(spark, "engine.incidence",
        gRaw.incidence),
      cooc = BuilderCache.ensureCached(spark, "engine.cooc", gRaw.cooc))
    val seeds = BuilderCache.cacheOnce(g.incidence
      .filter(col("customer_id") === customerId)
      .select(col("product_id").as("sp")))
    if (seeds.isEmpty) return (globalFallback(spark, g, n), Seq(seeds))

    // seeds (one customer's basket) is data-dependent, not provably
    // bounded, so its inner/outer joins carry NO broadcast hint
    // (bounded-relation rule) — AQE elects broadcast at runtime. The
    // LeftAnti seen-exclusion keeps its hint per the guard-list pattern.
    // strategy 1: co-occurrence — Σ over seeds of pair counts (A7)
    val cScore = g.cooc.join(seeds, col("src") === col("sp"))
      .groupBy(col("dst").as("product_id"))
      .agg(sum("cnt").as("s_cooc"))
    // strategy 2: Jaccard similarity — Σ over seeds of per-seed jaccard
    val jp = Recommend.jaccardPairsFrom(g.incidence) // cached at builder
    val sym = jp.select(col("p1").as("a"), col("p2").as("bb"), col("jaccard"))
      .unionAll(jp.select(col("p2").as("a"), col("p1").as("bb"),
        col("jaccard")))
    val jScore = sym.join(seeds, col("a") === col("sp"))
      .groupBy(col("bb").as("product_id"))
      .agg(sum("jaccard").as("s_jacc"))
    // strategy 3: seeded personalized PageRank (G1)
    val pers = g.products
      .join(seeds, col("id") === col("sp"), "left_outer")
      .select(col("id"), when(col("sp").isNotNull, 1.0).otherwise(0.0)
        .as("pers"))
    boundPprCache(spark)
    val pScore = PageRank.runMemo(spark, "engine.pprRanks", pers,
        adjacency(g))
      .select(col("id").as("product_id"), col("rank").as("s_ppr"))

    val cand = cScore
      .join(jScore, Seq("product_id"), "full_outer")
      .join(pScore, Seq("product_id"), "full_outer")
      .select(col("product_id"),
        coalesce(col("s_cooc"), lit(0L)).as("s_cooc"),
        coalesce(col("s_jacc"), lit(0.0)).as("s_jacc"),
        coalesce(col("s_ppr"), lit(0.0)).as("s_ppr"))
      .join(broadcast(seeds), col("product_id") === col("sp"), "left_anti")
      // PPR normalizes over its FULL rank dict, seeds included — the
      // reference's cooc/jaccard loops skip seed candidates while building
      // their maps (recommendation.py:109-110,117-118) but the PPR map is
      // the raw rank vector (:135-142); normalizing PPR over non-seed
      // candidates only would inflate c_ppr (golden C2: 0.136231, not 0.3)
      .crossJoin(broadcast(
        pScore.agg(max(col("s_ppr")).as("ppr_max"))))
    // cooc/jaccard maxes as broadcast scalars too (same pattern as
    // ppr_max) — A8 max-scaling must not funnel the candidate set into a
    // single partition, which is what an empty Window.partitionBy() does
    val candC = BuilderCache.cacheOnce(cand)
    val maxes = candC.agg(max(col("s_cooc")).as("max_cooc"),
      max(col("s_jacc")).as("max_jacc"))
    def norm(c: String, m: String) =
      when(col(m) > 0, col(c) / col(m)).otherwise(0.0)
    val out = candC.crossJoin(broadcast(maxes))
      .withColumn("nc", norm("s_cooc", "max_cooc"))
      .withColumn("nj", norm("s_jacc", "max_jacc"))
      .withColumn("np", when(col("ppr_max") > 0,
        col("s_ppr") / col("ppr_max")).otherwise(0.0))
      .withColumn("blend", lit(BlendCooc) * col("nc")
        + lit(BlendSim) * col("nj") + lit(BlendPpr) * col("np"))
      .filter(col("blend") > 0)
      .select(col("product_id"),
        round(col("blend"), 6).as("score"),
        round(lit(BlendCooc) * col("nc"), 6).as("c_cooc"),
        round(lit(BlendSim) * col("nj"), 6).as("c_sim"),
        round(lit(BlendPpr) * col("np"), 6).as("c_ppr"),
        lit(0.0).as("c_global"))
      .orderBy(desc("score"), asc("product_id"))
      .limit(n)
    (out, Seq(seeds, candC))
  }

  /** G2: seedless customers get the global PageRank top-N, labeled
    * `global_pagerank` (`recommendation.py:224-229`). */
  private def globalFallback(spark: SparkSession, g: ProductGraph,
      topN: Int): DataFrame = {
    val v = g.products.withColumn("pers", lit(1.0))
    PageRank.runMemo(spark, "engine.pprGlobal", v, adjacency(g))
      .select(col("id").as("product_id"),
        round(col("rank"), 6).as("score"),
        lit(0.0).as("c_cooc"), lit(0.0).as("c_sim"), lit(0.0).as("c_ppr"),
        round(col("rank"), 6).as("c_global"))
      .orderBy(desc("score"), asc("product_id"))
      .limit(topN)
  }

  /** `strategy_breakdown` (`recommendation.py:70-89`): raw un-normalized
    * per-strategy rankings for debugging. Returns
    * (strategy, product_id, score). */
  def strategyBreakdown(spark: SparkSession, g: ProductGraph,
      customerId: Long): DataFrame =
    breakdownInternal(spark, g, customerId)._1

  /** Serving path twin of [[recommendRows]] for the breakdown endpoint:
    * collect, then release the per-request seed cache. */
  def breakdownRows(spark: SparkSession, g: ProductGraph,
      customerId: Long): Array[org.apache.spark.sql.Row] = {
    val (df, perRequest) = breakdownInternal(spark, g, customerId)
    val rows = df.collect()
    perRequest.foreach(_.unpersist(blocking = true))
    rows
  }

  private def breakdownInternal(spark: SparkSession, g: ProductGraph,
      customerId: Long): (DataFrame, Seq[DataFrame]) = {
    ensureKnown(g, customerId)
    val seeds = BuilderCache.cacheOnce(g.incidence
      .filter(col("customer_id") === customerId)
      .select(col("product_id").as("sp")))
    if (seeds.isEmpty)
      return (PageRank.runMemo(spark, "engine.pprGlobal",
          g.products.withColumn("pers", lit(1.0)), adjacency(g))
        .select(lit("global_pagerank").as("strategy"),
          col("id").as("product_id"), round(col("rank"), 6).as("score"))
        .orderBy(desc("score"), asc("product_id")), Seq(seeds))
    def dropSeeds(df: DataFrame): DataFrame =
      df.join(broadcast(seeds), col("product_id") === col("sp"), "left_anti")
    // as in recommendInternal: no hint on the unbounded seeds side of
    // inner/outer joins, AQE decides; the anti-join guard keeps its hint
    val cScore = dropSeeds(
      g.cooc.join(seeds, col("src") === col("sp"))
        .groupBy(col("dst").as("product_id"))
        .agg(sum("cnt").cast("double").as("score")))
      .select(lit("co_occurrence").as("strategy"), col("product_id"),
        round(col("score"), 6).as("score"))
    val jp = Recommend.jaccardPairsFrom(g.incidence)
    val sym = jp.select(col("p1").as("a"), col("p2").as("bb"), col("jaccard"))
      .unionAll(jp.select(col("p2").as("a"), col("p1").as("bb"),
        col("jaccard")))
    val jScore = dropSeeds(
      sym.join(seeds, col("a") === col("sp"))
        .groupBy(col("bb").as("product_id"))
        .agg(sum("jaccard").as("score")))
      .select(lit("similarity").as("strategy"), col("product_id"),
        round(col("score"), 6).as("score"))
    val pers = g.products
      .join(seeds, col("id") === col("sp"), "left_outer")
      .select(col("id"), when(col("sp").isNotNull, 1.0).otherwise(0.0)
        .as("pers"))
    boundPprCache(spark)
    val pScore = dropSeeds(
      PageRank.runMemo(spark, "engine.pprRanks", pers, adjacency(g))
        .select(col("id").as("product_id"), col("rank").as("score")))
      .select(lit("personalized_pagerank").as("strategy"), col("product_id"),
        round(col("score"), 6).as("score"))
    (cScore.unionAll(jScore).unionAll(pScore)
      .orderBy(asc("strategy"), desc("score"), asc("product_id")),
      Seq(seeds))
  }
}
