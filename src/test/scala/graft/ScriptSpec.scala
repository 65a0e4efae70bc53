package graft

import graft.sources.SqlScript

/** S7 script-runner semantics (ref: `tp2/app/etl.py:122-150`): split on
  * semicolons outside string literals, execute in order, tolerate
  * idempotent "already exists" DDL, strict-by-default on real errors. */
class ScriptSpec extends SparkSpec {

  test("splitStatements splits on ; outside quotes, drops empties") {
    val s = SqlScript.splitStatements(
      "SELECT ';' AS x; \n ;SELECT 1;; SELECT 'a;b' AS y")
    assert(s == Seq("SELECT ';' AS x", "SELECT 1", "SELECT 'a;b' AS y"))
  }

  test("run executes statements in order and returns the last frame lazily") {
    SqlScript.registerTables(spark, "/root/testdata/sf0.001")
    val (n, last) = SqlScript.run(spark,
      """CREATE TEMPORARY VIEW script_spec_v1 AS
        |  SELECT l_partkey FROM lineitem LIMIT 5;
        |SELECT count(*) AS c FROM script_spec_v1""".stripMargin)
    assert(n == 2)
    assert(last.get.collect()(0).getLong(0) == 5L)
  }

  test("already-exists DDL is tolerated (reference's idempotency carve-out)") {
    spark.sql("CREATE TEMPORARY VIEW script_spec_v2 AS SELECT 1 AS a")
    // re-running the same CREATE must not throw and still counts
    val (n, _) = SqlScript.run(spark,
      "CREATE TEMPORARY VIEW script_spec_v2 AS SELECT 1 AS a; SELECT a FROM script_spec_v2")
    assert(n == 2)
  }

  test("strict mode throws on a failing statement; lenient warns and continues") {
    intercept[Exception] {
      SqlScript.run(spark, "SELECT * FROM script_spec_no_such_table")
    }
    val (n, last) = SqlScript.run(spark,
      "SELECT * FROM script_spec_no_such_table; SELECT 7 AS ok",
      lenient = true)
    assert(n == 1)
    assert(last.get.collect()(0).getInt(0) == 7)
  }
}
