package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** The native codegen'd vector expressions must be bit-identical to the
  * built-in aggregate/zip_with composition (same summation order). */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot / graft_norm2 match the built-in folds bit-for-bit") {
    VectorExpressions.register(spark)
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
    val probe = e.orderBy("vec_id").limit(1)
      .select(col("v").as("pv"))
    val both = e.crossJoin(broadcast(probe)).select(
      expr("aggregate(zip_with(v, pv, (x, y) -> x * y), 0D, (a, x) -> a + x)")
        .as("dot_builtin"),
      expr("graft_dot(v, pv)").as("dot_native"),
      expr("aggregate(v, 0D, (a, x) -> a + x * x)").as("n2_builtin"),
      expr("graft_norm2(v)").as("n2_native"))
      .as[(Double, Double, Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (db, dn, nb, nn) =>
      assert(db == dn, s"dot: $db vs $dn")
      assert(nb == nn, s"norm2: $nb vs $nn")
    }
  }

  test("native expressions survive whole-stage codegen (plan + result)") {
    VectorExpressions.register(spark)
    // cast (not a transform lambda) so the whole pipeline stays
    // codegen-able — higher-order functions would break the stage
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(expr("cast(embedding as array<double>)").as("v"))
    val df = e.select(expr("graft_norm2(v)").as("n2"))
    // executedPlan.toString marks codegen'd operators with a "*(n)"
    // prefix; the Project carrying graft_norm2 must be inside a stage
    val planLines = df.queryExecution.executedPlan.toString.linesIterator
    assert(planLines.exists(l =>
      l.contains("graft_norm2") && l.trim.startsWith("*(")))
    val s = df.agg(sum("n2")).collect()(0).getDouble(0)
    assert(s > 0)
  }
}
