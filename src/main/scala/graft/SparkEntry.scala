package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.algo.PageRank
import graft.operators.{Recommend, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2 (or the
  * extension surface §7.4); every key that is ANSI-SQL-expressible also
  * appears in [[oracleSql]] with a DuckDB-runnable equivalent over the same
  * parquet tables. Column names and ordering are aligned pairwise; floats
  * are engine-deterministic by construction (see [[graft.operators.Det]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * cooc_topk = the reference's "frequently bought together" ranking
    * (`tp2/app/main.py:98-105`) — scan+join+agg+sort+limit in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.coocTopk(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_project"      -> ((s, d) => Relational.scanProject(s, d)),
    "cooc_topk"         -> ((s, d) => Relational.coocTopk(s, d)),
    "cooc_pairs"        -> ((s, d) => Relational.coocPairs(s, d)),
    "popularity_topk"   -> ((s, d) => Relational.popularityTopk(s, d)),
    "popularity_approx" -> ((s, d) => Relational.popularityApprox(s, d)),
    "orderfreq_topk"    -> ((s, d) => Relational.orderfreqTopk(s, d)),
    "event_weights"     -> ((s, d) => Relational.eventWeights(s, d)),
    "edges_build"       -> ((s, d) => Relational.edgesBuild(s, d)),
    "event_edges"       -> ((s, d) => Relational.eventEdges(s, d)),
    "bipartite_edges"   -> ((s, d) => Relational.bipartiteEdges(s, d)),
    "adjacency_norm"    -> ((s, d) => Relational.adjacencyNorm(s, d)),
    "collab_topk"       -> ((s, d) => Recommend.collabTopk(s, d)),
    "jaccard_topk"      -> ((s, d) => Recommend.jaccardTopk(s, d)),
    "rec_blend"         -> ((s, d) => Recommend.recBlend(s, d)),
    // iterative graph tier — not SQL-expressible, so no oracleSql entry;
    // verified by golden-fixture + invariant ScalaTests (SURVEY §5.2)
    "pagerank_global"   -> ((s, d) => PageRank.pagerankGlobal(s, d)),
    "ppr_seeded"        -> ((s, d) => PageRank.pprSeeded(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "scan_project" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE event_type IN ('view','click','purchase')
        |ORDER BY event_id""".stripMargin,

    "cooc_topk" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cnt AS (SELECT b.l_partkey AS product_id,
        |               CAST(count(*) AS BIGINT) AS co_count
        |        FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
        |                           AND a.l_partkey <> b.l_partkey
        |        GROUP BY 1)
        |SELECT product_id, p_name AS name, p_retailprice AS price, co_count
        |FROM cnt JOIN part ON product_id = p_partkey
        |ORDER BY co_count DESC, product_id ASC LIMIT 10""".stripMargin,

    "cooc_pairs" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |       CAST(count(*) AS BIGINT) AS cnt
        |FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
        |                   AND a.l_partkey <> b.l_partkey
        |GROUP BY 1, 2 ORDER BY src, dst""".stripMargin,

    "popularity_topk" ->
      """SELECT l_partkey AS product_id,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS popularity
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY popularity DESC, product_id ASC LIMIT 100""".stripMargin,

    "orderfreq_topk" ->
      """SELECT l_partkey AS product_id,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS order_count
        |FROM lineitem
        |GROUP BY 1 ORDER BY order_count DESC, product_id ASC LIMIT 100""".stripMargin,

    "event_weights" ->
      """SELECT * FROM (
        |  SELECT user_id,
        |         sum(CASE event_type WHEN 'view' THEN CAST(0.5 AS DOUBLE)
        |                             WHEN 'click' THEN CAST(1.0 AS DOUBLE)
        |                             WHEN 'purchase' THEN CAST(2.0 AS DOUBLE)
        |                             ELSE CAST(0.0 AS DOUBLE) END) AS weight
        |  FROM events GROUP BY user_id)
        |WHERE weight > 0 ORDER BY user_id""".stripMargin,

    "edges_build" ->
      """WITH placed AS (
        |  SELECT 'PLACED' AS rel_type, 'C' || o_custkey AS src,
        |         'O' || o_orderkey AS dst, CAST(1.0 AS DOUBLE) AS weight
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |contains_e AS (
        |  SELECT 'CONTAINS' AS rel_type, 'O' || l_orderkey AS src,
        |         'P' || l_partkey AS dst,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |           / 100.0 AS weight
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |                JOIN part ON l_partkey = p_partkey
        |  GROUP BY l_orderkey, l_partkey),
        |incat AS (
        |  SELECT 'IN_CATEGORY' AS rel_type, 'P' || p_partkey AS src,
        |         p_brand AS dst, CAST(1.0 AS DOUBLE) AS weight
        |  FROM part)
        |SELECT * FROM (SELECT * FROM placed UNION ALL
        |               SELECT * FROM contains_e UNION ALL
        |               SELECT * FROM incat)
        |ORDER BY rel_type, src, dst""".stripMargin,

    "event_edges" ->
      """SELECT event_id, 'C' || user_id AS src,
        |       CASE event_type WHEN 'view' THEN 'VIEWED'
        |                       WHEN 'click' THEN 'CLICKED'
        |                       WHEN 'purchase' THEN 'PURCHASED'
        |                       ELSE 'VIEWED' END AS rel_type,
        |       date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts, value
        |FROM events ORDER BY event_id""".stripMargin,

    "bipartite_edges" ->
      """SELECT DISTINCT o_custkey AS customer_id, l_partkey AS product_id
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY customer_id, product_id""".stripMargin,

    "adjacency_norm" ->
      """WITH oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cnt AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
        |               CAST(count(*) AS BIGINT) AS cnt
        |        FROM oi a JOIN oi b ON a.l_orderkey = b.l_orderkey
        |                           AND a.l_partkey <> b.l_partkey
        |        GROUP BY 1, 2)
        |SELECT src, dst,
        |       round(cnt / (sum(cnt) OVER (PARTITION BY src)), 6) AS weight
        |FROM cnt ORDER BY src, dst""".stripMargin,

    "collab_topk" ->
      """WITH b AS (SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |seed AS (SELECT min(cid) AS seed_cid FROM b),
        |p1s AS (SELECT DISTINCT pid AS p1 FROM b, seed WHERE cid = seed_cid),
        |c2s AS (SELECT DISTINCT b.cid AS c2, p1s.p1
        |        FROM b JOIN p1s ON b.pid = p1s.p1, seed
        |        WHERE b.cid <> seed_cid),
        |paths AS (SELECT c2s.c2, b.pid AS p2
        |          FROM c2s JOIN b ON b.cid = c2s.c2
        |          WHERE b.pid <> c2s.p1)
        |SELECT p2 AS product_id, CAST(count(DISTINCT c2) AS BIGINT) AS score
        |FROM paths GROUP BY 1
        |ORDER BY score DESC, product_id ASC LIMIT 10""".stripMargin,

    "jaccard_topk" ->
      """WITH b AS (SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |sizes AS (SELECT pid, CAST(count(*) AS BIGINT) AS sz FROM b GROUP BY 1),
        |common AS (SELECT x.pid AS p1, y.pid AS p2,
        |                  CAST(count(*) AS BIGINT) AS common
        |           FROM b x JOIN b y ON x.cid = y.cid AND x.pid < y.pid
        |           GROUP BY 1, 2)
        |SELECT p1, p2,
        |       round(common / (s1.sz + s2.sz - common), 6) AS jaccard
        |FROM common JOIN sizes s1 ON p1 = s1.pid
        |            JOIN sizes s2 ON p2 = s2.pid
        |ORDER BY jaccard DESC, p1 ASC, p2 ASC LIMIT 100""".stripMargin,

    "rec_blend" ->
      """WITH b AS (SELECT DISTINCT o_custkey AS cid, l_partkey AS pid
        |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |seed AS (SELECT min(cid) AS seed_cid FROM b),
        |seeds AS (SELECT DISTINCT pid AS sp FROM b, seed WHERE cid = seed_cid),
        |oi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |cooc AS (SELECT a.l_partkey AS src, b2.l_partkey AS dst,
        |                CAST(count(*) AS BIGINT) AS cnt
        |         FROM oi a JOIN oi b2 ON a.l_orderkey = b2.l_orderkey
        |                            AND a.l_partkey <> b2.l_partkey
        |         GROUP BY 1, 2),
        |cscore AS (SELECT dst AS pid, CAST(sum(cnt) AS BIGINT) AS s_cooc
        |           FROM cooc JOIN seeds ON src = sp GROUP BY 1),
        |sizes AS (SELECT pid, CAST(count(*) AS BIGINT) AS sz FROM b GROUP BY 1),
        |common AS (SELECT x.pid AS p1, y.pid AS p2,
        |                  CAST(count(*) AS BIGINT) AS common
        |           FROM b x JOIN b y ON x.cid = y.cid AND x.pid < y.pid
        |           GROUP BY 1, 2),
        |jac AS (SELECT p1, p2, common / (s1.sz + s2.sz - common) AS j
        |        FROM common JOIN sizes s1 ON p1 = s1.pid
        |                    JOIN sizes s2 ON p2 = s2.pid),
        |sym AS (SELECT p1 AS a, p2 AS bb, j FROM jac
        |        UNION ALL SELECT p2, p1, j FROM jac),
        |jscore AS (SELECT bb AS pid, sum(j) AS s_jacc
        |           FROM sym JOIN seeds ON a = sp GROUP BY 1),
        |cand AS (SELECT COALESCE(c.pid, js.pid) AS pid,
        |                COALESCE(s_cooc, 0) AS s_cooc,
        |                COALESCE(s_jacc, CAST(0.0 AS DOUBLE)) AS s_jacc
        |         FROM cscore c FULL OUTER JOIN jscore js ON c.pid = js.pid),
        |cand2 AS (SELECT * FROM cand
        |          WHERE pid NOT IN (SELECT sp FROM seeds)),
        |norm AS (SELECT pid,
        |    CASE WHEN max(s_cooc) OVER () > 0
        |         THEN s_cooc / (max(s_cooc) OVER ())
        |         ELSE CAST(0.0 AS DOUBLE) END AS nc,
        |    CASE WHEN max(s_jacc) OVER () > 0
        |         THEN s_jacc / (max(s_jacc) OVER ())
        |         ELSE CAST(0.0 AS DOUBLE) END AS nj
        |  FROM cand2)
        |SELECT pid AS product_id,
        |       round(CAST(0.4 AS DOUBLE)*nc + CAST(0.3 AS DOUBLE)*nj, 6) AS score,
        |       round(CAST(0.4 AS DOUBLE)*nc, 6) AS c_cooc,
        |       round(CAST(0.3 AS DOUBLE)*nj, 6) AS c_sim
        |FROM norm
        |WHERE CAST(0.4 AS DOUBLE)*nc + CAST(0.3 AS DOUBLE)*nj > 0
        |ORDER BY score DESC, product_id ASC LIMIT 10""".stripMargin,
  )
}
