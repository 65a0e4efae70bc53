package graft

import org.apache.spark.sql.functions._

import graft.operators.{Recommend, Relational}

/** Boundary-input behavior locked in (SURVEY §7.5.4 lists the edge cases
  * the reference defines; these cover the declared-query layer). */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("collab for a customer with no interactions returns empty, not error") {
    val got = Recommend.collabTopkFor(spark, dir, customerId = -1L)
    assert(got.count() == 0)
  }

  test("event_weights drops users whose events all weigh zero") {
    // signup/error-only users must be filtered by the weight>0 gate
    val weights = Relational.eventWeights(spark, dir)
    assert(weights.filter(col("weight") <= 0).count() == 0)
  }

  test("cooc self-join never emits self-pairs") {
    val bad = Relational.coocPairs(spark, dir)
      .filter(col("src") === col("dst")).count()
    assert(bad == 0)
  }

  test("adjacency rows are valid transition probabilities") {
    val adj = Relational.adjacencyNorm(spark, dir)
    assert(adj.filter(col("weight") <= 0 || col("weight") > 1).count() == 0)
  }

  test("minhash estimate is always within [0,1]; jaccard likewise") {
    val mh = graft.operators.Dedup.dedupMinhash(spark, dir, limit = 10000)
    assert(mh.filter(col("est_jaccard") < 0 || col("est_jaccard") > 1)
      .count() == 0)
    val nj = graft.operators.Dedup.ngramJaccard(spark, dir, limit = 100000)
    assert(nj.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
  }

  test("cosine scores bounded in [-1, 1] after rounding") {
    val s = graft.operators.Similarity.simTopk(spark, dir, k = 1000)
    assert(s.filter(col("cosine") < -1 || col("cosine") > 1).count() == 0)
  }

  test("F6: now() sanity query answers (ref tp2/app/test.py:96-127)") {
    // the reference's test_3 is a bare `SELECT now()` liveness probe;
    // the engine answers the same SQL
    val ts = spark.sql("SELECT now() AS ts").collect()(0).getTimestamp(0)
    assert(ts != null)
  }

  test("T3: RecsApi clamps limit to [1,10] — 0, -5 and 99 never error") {
    import graft.rec.RecsApi
    assert(RecsApi.recs(spark, dir, "co_occurrence", limit = 0).count() == 1)
    assert(RecsApi.recs(spark, dir, "co_occurrence", limit = -5).count() == 1)
    assert(RecsApi.recs(spark, dir, "co_occurrence", limit = 99).count() == 10)
  }

  test("T3: Engine.recommend clamps topN to [1,10] on the toy graph") {
    import graft.rec.Engine
    val g = Engine.fromOrders(spark, Fixtures.write(spark))
    // C1's toy blend has 2 candidates (P3, P4) — topN=-5 clamps to 1
    assert(Engine.recommend(spark, g, 1L, topN = -5).count() == 1)
    // 99 clamps to 10, which exceeds the candidate count → all candidates
    val all = Engine.recommend(spark, g, 1L, topN = 99).count()
    assert(all >= 1 && all <= 10)
  }
}
