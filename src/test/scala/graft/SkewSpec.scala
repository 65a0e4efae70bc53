package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting is mechanical: salted plans must give exactly the unsalted
  * results (integer aggregates → order-insensitive). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select(col("l_partkey"),
      round(col("l_quantity") * 100).cast("long").as("qty_c"))

  test("saltedAgg equals the plain aggregation exactly") {
    val plain = li.groupBy("l_partkey")
      .agg(sum("qty_c").as("s"), count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(li, "l_partkey", "qty_c")
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals the plain inner join exactly") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = li.join(part, "l_partkey")
      .select("l_partkey", "qty_c", "p_brand")
      .as[(Long, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedJoin(li, part, "l_partkey")
      .select("l_partkey", "qty_c", "p_brand")
      .as[(Long, Long, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain) // exact multiset equality
  }
}
