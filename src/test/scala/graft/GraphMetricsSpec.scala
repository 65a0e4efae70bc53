package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphMetrics, Relational}

/** Semantic tests for the triadic-structure tier: exact hand-computed
  * fixture, and an independent brute-force recount on the real sf0.001
  * co-purchase graph (the oracle runs the same orientation algorithm, so
  * the spec's job is to pin the ALGORITHM against a different one). */
class GraphMetricsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("triangle_counts: hand-computed fixture (two shared triangles)") {
    // undirected: 1-2, 1-3, 2-3, 2-4, 3-4, 4-5 → triangles {1,2,3} and
    // {2,3,4}; degrees 2,3,3,3,1; coefficients 1, 2/3, 2/3, 1/3, 0
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val cc = (und ++ und.map { case (a, b) => (b, a) })
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    val got = GraphMetrics.triangleCountsOf(cc)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 1.0), (2L, 3L, 2L, 0.666667), (3L, 3L, 2L, 0.666667),
      (4L, 3L, 1L, 0.333333), (5L, 1L, 0L, 0.0)))
  }

  test("graph_stats: hand-computed fixture values") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val cc = (und ++ und.map { case (a, b) => (b, a) })
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    val got = GraphMetrics.graphStatsOf(GraphMetrics.triangleCountsOf(cc))
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().head
    // V=5, E=6, T=2, W = 1+3+3+3+0 = 10, max=3, avg=12/5, trans=6/10
    assert(got == ((5L, 6L, 2L, 10L, 3L, 2.4, 0.6)))
  }

  test("degree_dist: fixture histogram and real-graph reconciliation") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val cc = (und ++ und.map { case (a, b) => (b, a) })
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    val hist = GraphMetrics.degreeDistOf(cc)
      .as[(Long, Long)].collect().toSeq
    assert(hist == Seq((1L, 1L), (2L, 1L), (3L, 3L)))
    // real graph: histogram masses reconcile with the per-vertex table
    val dist = GraphMetrics.degreeDist(spark, dir)
    val tc = GraphMetrics.triangleCounts(spark, dir)
    val nV = tc.count()
    val degSum = tc.agg(sum("degree")).as[Long].collect().head
    assert(dist.agg(sum("n_products")).as[Long].collect().head == nV)
    assert(dist.agg(sum(col("degree") * col("n_products")))
      .as[Long].collect().head == degSum)
  }

  test("triangle_est: pDenom=1 is EXACTLY the exact count; p=1/2 estimates within bounds") {
    // unsampled (p=1): the estimator pipeline must reproduce the exact
    // twin bit-for-bit — sampling is the ONLY approximation in it
    val cc = Relational.coocCounts(spark, dir)
    val exact = GraphMetrics.graphStats(spark, dir)
      .select("n_edges", "n_triangles").as[(Long, Long)].collect().head
    val full = GraphMetrics.triangleEstOf(cc, 1)
      .as[(Long, Long, Long, Long)].collect().head
    assert(full == ((exact._1, exact._1, exact._2, exact._2)), full)
    // p=1/2 (the declared query): est = 8·tri_sampled by construction,
    // roughly half the edges survive, and the estimate lands within a
    // generous ±50% of the exact count on the real graph (deterministic
    // hash sampling → this is a stable regression pin, not a flaky
    // statistical one; the estimator's variance shrinks with T, and
    // sf0.001's T is the smallest we ever run it on)
    val est = GraphMetrics.triangleEst(spark, dir)
      .as[(Long, Long, Long, Long)].collect().head
    assert(est._1 == exact._1)
    assert(est._2 > est._1 / 3 && est._2 < 2 * est._1 / 3,
      s"sampling rate off: ${est._2} of ${est._1} edges")
    assert(est._4 == 8 * est._3)
    val relErr = math.abs(est._4 - exact._2).toDouble / exact._2
    assert(relErr < 0.5, s"est ${est._4} vs exact ${exact._2} (err $relErr)")
  }

  test("triangle_est: fixture — sampling drops triangles, scaling stays exact-integer") {
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val cc = (und ++ und.map { case (a, b) => (b, a) })
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    val r = GraphMetrics.triangleEstOf(cc, 1)
      .as[(Long, Long, Long, Long)].collect().head
    assert(r == ((6L, 6L, 2L, 2L)), r)
    // empty graph → zero rows (the graphStats contract)
    assert(GraphMetrics.triangleEstOf(cc.filter(col("src") > 99L), 2)
      .count() == 0L)
  }

  test("graph_stats: real graph agrees with the per-vertex table") {
    val tc = GraphMetrics.triangleCounts(spark, dir).cache()
    val st = GraphMetrics.graphStats(spark, dir)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().head
    assert(st._1 == tc.count())
    assert(st._2 * 2 == tc.agg(sum("degree")).as[Long].collect().head)
    assert(st._3 * 3 == tc.agg(sum("triangles")).as[Long].collect().head)
    assert(st._5 == tc.agg(max("degree")).as[Long].collect().head)
    // transitivity is a wedge-weighted mean of closures: strictly inside
    // the local-coefficient extremes, and in [0, 1]
    assert(st._7 >= 0.0 && st._7 <= 1.0)
    tc.unpersist()
  }

  test("reach_hops: hand-computed fixture (min-hop wins over longer paths)") {
    // path 1-2-3-4-5 plus chord 1-3: from seed 1, vertex 3 is 1 hop (the
    // chord), 4 is 2, 5 is 3 — the 2-hop path to 3 via 2 must not emit
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L))
    val cc = (und ++ und.map { case (a, b) => (b, a) })
      .map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    val got = GraphMetrics.reachHopsOf(cc, nSeeds = 1, maxHops = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 2L), (1L, 5L, 3L)))
    // two seeds: seed 2 reaches 1,3 in one hop, 4 in two (via 3 — vertex
    // 2 itself is excluded as seed), 5 in three
    val got2 = GraphMetrics.reachHopsOf(cc, nSeeds = 2, maxHops = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got2.filter(_._1 == 2L) == Seq(
      (2L, 1L, 1L), (2L, 3L, 1L), (2L, 4L, 2L), (2L, 5L, 3L)))
  }

  test("reach_hops: real graph — BFS invariants vs the edge relation") {
    val out = GraphMetrics.reachHops(spark, dir).cache()
    val edges = Relational.coocCounts(spark, dir).select("src", "dst").cache()
    // hop range, per-seed uniqueness, no self-reach
    assert(out.filter(col("hops") < 1 || col("hops") > 3).count() == 0)
    assert(out.groupBy("seed", "product_id").count()
      .filter(col("count") > 1).count() == 0)
    assert(out.filter(col("seed") === col("product_id")).count() == 0)
    // hop-1 rows are exactly the seeds' direct neighborhoods
    val seeds = out.select("seed").distinct()
    val direct = seeds.join(edges, col("seed") === col("src"))
      .filter(col("dst") =!= col("seed"))
      .select(col("seed"), col("dst").as("product_id")).distinct()
    val h1 = out.filter(col("hops") === 1).select("seed", "product_id")
    assert(h1.except(direct).count() == 0 && direct.except(h1).count() == 0)
    // every hop-h vertex (h ≥ 2) has an edge from some hop-(h−1) vertex
    for (h <- 2 to 3) {
      val prev = out.filter(col("hops") === h - 1)
        .select(col("seed"), col("product_id").as("u"))
      val cur = out.filter(col("hops") === h).select("seed", "product_id")
      val reachable = prev.join(edges, col("u") === col("src"))
        .select(col("seed"), col("dst").as("product_id")).distinct()
      assert(cur.except(reachable).count() == 0,
        s"hop-$h vertex with no hop-${h - 1} predecessor")
    }
    edges.unpersist(); out.unpersist()
  }

  test("triangle_counts: real graph equals a brute-force triple-join recount") {
    val out = GraphMetrics.triangleCounts(spark, dir).cache()
    val und = Relational.coocCounts(spark, dir)
      .filter(col("src") < col("dst")).select("src", "dst").cache()
    // independent algorithm: enumerate ordered triples a<b<c directly
    // (no degree orientation involved)
    val e1 = und.select(col("src").as("a"), col("dst").as("b"))
    val e2 = und.select(col("src").as("b"), col("dst").as("c"))
    val e3 = und.select(col("src").as("a"), col("dst").as("c"))
    val bruteTotal = e1.join(e2, "b").join(e3, Seq("a", "c")).count()
    val perVertexSum = out.agg(sum("triangles")).as[Long].collect().head
    assert(perVertexSum == 3 * bruteTotal,
      s"per-vertex sum $perVertexSum vs 3×$bruteTotal")
    assert(bruteTotal > 0, "sf0.001 cooc graph unexpectedly triangle-free")
    // structural invariants: every vertex appears once; degree sum =
    // directed edge count; triangles bounded by the wedge count
    assert(out.groupBy("product_id").count().filter(col("count") > 1)
      .count() == 0)
    val degSum = out.agg(sum("degree")).as[Long].collect().head
    assert(degSum == Relational.coocCounts(spark, dir).count())
    assert(out.filter(col("triangles") * 2 >
      col("degree") * (col("degree") - 1)).count() == 0)
    assert(out.filter(col("clust_coeff") < 0 || col("clust_coeff") > 1)
      .count() == 0)
    und.unpersist(); out.unpersist()
  }
}
