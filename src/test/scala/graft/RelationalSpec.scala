package graft

import org.apache.spark.sql.functions._

import graft.operators.{Recommend, Relational}

/** Unit tests on the reference toy dataset (FIXTURES.md §A) — the
  * per-operator asserts the reference itself lacks (SURVEY §5.1). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = Fixtures.write(spark)

  test("cooc_pairs reproduces product_cooccurrence (graph.py:60-62)") {
    // symmetric: P1–P2: 1, P2–P4: 1 → 4 directed rows
    val got = Relational.coocPairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (2L, 1L, 1L), (2L, 4L, 1L), (4L, 2L, 1L)))
  }

  test("bipartite reproduces order-derived customer_products") {
    val got = Relational.bipartite(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (1L, 2L), (1L, 4L), (2L, 3L)))
  }

  test("event_weights: CASE weights with unknown→0 (graph.py:64-68)") {
    // C1: view+click = 1.5; C2: view + add_to_cart(unknown→0) = 0.5; C3: 0.5
    val got = Relational.eventWeights(spark, dir)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.5, 2L -> 0.5, 3L -> 0.5))
  }

  test("adjacency_norm rows sum to 1 per source (graph.py:70-77)") {
    val sums = Relational.adjacencyNorm(spark, dir)
      .groupBy("src").agg(sum("weight").as("s"))
      .as[(Long, Double)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (src, s) =>
      assert(math.abs(s - 1.0) < 1e-6, s"src $src sums to $s") }
    // exact golden: P1:{P2:1.0}  P2:{P1:0.5,P4:0.5}  P4:{P2:1.0}
    val adj = Relational.adjacencyNorm(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(adj == Set((1L, 2L, 1.0), (2L, 1L, 0.5), (2L, 4L, 0.5),
      (4L, 2L, 1.0)))
  }

  test("cooc_topk ranks P2 first (A.3: co_occurrence P2:2, P1:1, P4:1)") {
    val got = Relational.coocTopk(spark, dir)
      .select("product_id", "co_count").as[(Long, Long)].collect().toList
    assert(got == List((2L, 2L), (1L, 1L), (4L, 1L)))
  }

  test("orderfreq reproduces the 'pagerank' strategy (A.3: P2:2,P1:1,P3:1,P4:1)") {
    val got = Relational.orderfreqTopk(spark, dir)
      .as[(Long, Long)].collect().toList
    assert(got == List((2L, 2L), (1L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("jaccard over order-derived incidence") {
    // sizes P1:{C1} P2:{C1} P3:{C2} P4:{C1} → all co-bought pairs jac 1.0
    val got = Recommend.jaccardTopk(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0), (1L, 4L, 1.0), (2L, 4L, 1.0)))
  }

  test("jaccard_lsh recovers the exact operator's pairs on the fixture") {
    // P1/P2/P4 share the identical customer set {C1} → identical minhash
    // signatures → every band collides: the LSH tier must surface all
    // three pairs with the same exact scores as jaccard_topk (identical
    // sets are the one class banding finds with probability 1).
    val exact = Recommend.jaccardTopk(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Recommend.jaccardLsh(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh == exact)
  }

  test("edges_build: MATCH-semantics edge counts (FIXTURES A.3 ETL: 3 PLACED, 5 CONTAINS, 4 IN_CATEGORY)") {
    val byType = Relational.edgesBuild(spark, dir)
      .groupBy("rel_type").count().as[(String, Long)].collect().toMap
    assert(byType == Map("PLACED" -> 3L, "CONTAINS" -> 5L,
      "IN_CATEGORY" -> 4L))
  }

  test("popularity: distinct purchasing customers per product") {
    val got = Relational.popularityTopk(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("popularity_approx tracks the exact variant within the HLL rsd") {
    val sf = "/root/testdata/sf0.001"
    val exact = Relational.popularityTopk(spark, sf, k = 10000)
      .as[(Long, Long)].collect().toMap
    val approx = Relational.popularityApprox(spark, sf, k = 10000)
      .as[(Long, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    // rsd 0.02 → ~3σ bound of 6% (plus integer rounding at tiny counts)
    exact.foreach { case (pid, n) =>
      val a = approx(pid)
      assert(math.abs(a - n) <= math.max(1L, math.ceil(n * 0.06).toLong),
        s"product $pid: approx $a vs exact $n")
    }
  }
}
