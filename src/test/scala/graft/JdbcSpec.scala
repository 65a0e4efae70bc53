package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.model.Tables

/** S2 JDBC extraction against an embedded Derby database (the in-process
  * stand-in for the reference's live Postgres, `tp2/app/etl.py:201-206`).
  * Locks in the two scale behaviors parquet can't show: filter pushdown
  * INTO the database, and partitioned (parallel range-query) extracts. */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url: String = {
    // keep Derby's log out of the repo root (it is a test artifact)
    System.setProperty("derby.stream.error.file", "target/derby.log")
    val u = "jdbc:derby:memory:graftjdbc;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute(
      "CREATE TABLE products (id INT NOT NULL, name VARCHAR(64), price DOUBLE)")
    st.execute("INSERT INTO products VALUES " +
      "(1, 'Wireless Mouse', 29.99), (2, 'USB-C Hub', 49.0), " +
      "(3, 'Graph Databases Book', 39.0), (4, 'Mechanical Keyboard', 89.0)")
    st.close(); conn.close()
    u
  }
  private val driverOpt =
    Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("jdbc extract reads the table (S2 live-DB analogue)") {
    val df = Tables.jdbc(spark, url, "products", driverOpt)
    assert(df.count() == 4)
    assert(df.columns.map(_.toLowerCase).sorted
      .sameElements(Array("id", "name", "price")))
  }

  test("filters push down into the database scan") {
    val df = Tables.jdbc(spark, url, "products", driverOpt)
      .filter(col("PRICE") > 30.0).select(col("ID"))
    assert(df.as[Int].collect().sorted.sameElements(Array(2, 3, 4)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("PRICE"), plan)
  }

  test("partitioned extract splits into parallel range queries") {
    val df = Tables.jdbc(spark, url, "products", driverOpt ++ Map(
      "partitionColumn" -> "id", "lowerBound" -> "1",
      "upperBound" -> "5", "numPartitions" -> "2"))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 4) // range split loses no rows
  }
}
