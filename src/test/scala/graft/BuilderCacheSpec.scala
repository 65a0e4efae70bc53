package graft

import graft.model.BuilderCache

/** Registry semantics: idempotence, plan-keyed isolation, and scoped
  * release (the serving-session eviction path). */
class BuilderCacheSpec extends SparkSpec {

  test("memo returns the same instance and caches exactly once") {
    var builds = 0
    def build() = { builds += 1; spark.range(10).toDF() }
    val a = BuilderCache.memo(spark, "bcspec:memo")(build())
    val b = BuilderCache.memo(spark, "bcspec:memo")(build())
    assert(a eq b)
    assert(builds == 1)
    assert(a.storageLevel.useMemory, "memo entry must be cached")
    assert(BuilderCache.list(spark).contains("bcspec:memo"))
  }

  test("memoByPlan keys different input plans separately") {
    val in1 = spark.range(5).toDF()
    val in2 = spark.range(50).toDF()
    val a = BuilderCache.memoByPlan(spark, "bcspec:byplan", in1)(in1)
    val b = BuilderCache.memoByPlan(spark, "bcspec:byplan", in2)(in2)
    assert(!(a eq b))
    assert(a.count() == 5 && b.count() == 50)
    // same plan → same entry
    val a2 = BuilderCache.memoByPlan(spark, "bcspec:byplan",
      spark.range(5).toDF())(spark.range(5).toDF())
    assert(a eq a2)
  }

  test("release(prefix) evicts only matching entries and re-caching works") {
    val kept = BuilderCache.memo(spark, "bcspec:keep")(spark.range(3).toDF())
    var builds = 0
    def build() = { builds += 1; spark.range(7).toDF() }
    val gone = BuilderCache.memo(spark, "bcspec:drop:x")(build())
    assert(gone.storageLevel.useMemory)
    BuilderCache.release(spark, "bcspec:drop")
    assert(BuilderCache.list(spark).contains("bcspec:keep"))
    assert(!BuilderCache.list(spark).exists(_.startsWith("bcspec:drop")))
    assert(kept.storageLevel.useMemory, "unrelated entry must stay cached")
    // rebuild under the same key: builder runs again AND re-caches
    val again = BuilderCache.memo(spark, "bcspec:drop:x")(build())
    assert(builds == 2)
    assert(again.storageLevel.useMemory,
      "re-registered entry must be cache-marked again")
  }
}
