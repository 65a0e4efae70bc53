package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G3 — graph visualization (ref: `tp1/knoledge_graphs/graph.py:88-127`,
  * `display_graph`): the reference draws the product co-occurrence graph
  * with networkx/matplotlib — nodes = products, undirected edges
  * weighted by co-occurrence count, edge width `2 + 6·(w/max_w)`. A
  * matplotlib window has no distributed meaning; the Spark reframe emits
  * the graph in Graphviz DOT — the standard text serialization every
  * renderer consumes — computed as an ordinary bounded query.
  *
  * Scale posture: a drawing is inherently a bounded artifact, so the
  * export bounds itself the same way every serving query does — top-k
  * edges by weight (`TakeOrderedAndProject`, no global sort), nodes =
  * the endpoints of those edges. The one non-equi shape is the max-
  * weight normalizer: a broadcast-of-scalar cross join (1-row frame onto
  * k rows), the audited constant-cost pattern. Edge widths are
  * integerized (`w100 = 200 + 600·w div max_w`, rendered `%d.%02d`) so
  * the emitted text is engine-deterministic — same reason every float
  * output rounds to 6dp. */
object Viz {

  /** `viz_dot`: the DOT body lines as a one-column frame — node lines
    * (`  <id>;`) then edge lines (`  <src> -- <dst> [penwidth=<w>];`),
    * deterministically ordered. Undirected: the symmetric cooc matrix is
    * halved with `src < dst` before ranking (the reference's
    * `G.has_edge` double-add guard, `graph.py:108-110`). */
  def dotLines(spark: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val top = Relational.coocCounts(spark, dir)
      .filter(col("src") < col("dst"))
      .orderBy(desc("cnt"), asc("src"), asc("dst"))
      .limit(k)
    val mx = top.agg(max(col("cnt")).as("mw"))
    val edges = top.crossJoin(broadcast(mx))
      .withColumn("w100", lit(200) + expr("(600 * cnt) div mw"))
      .select(lit(1).as("sect"),
        format_string("  %d -- %d [penwidth=%d.%02d];",
          col("src"), col("dst"),
          expr("w100 DIV 100"), expr("w100 % 100")).as("line"))
    val nodes = top.select(col("src").as("id"))
      .union(top.select(col("dst").as("id")))
      .distinct()
      .select(lit(0).as("sect"), format_string("  %d;", col("id")).as("line"))
    nodes.unionAll(edges).orderBy("sect", "line").select("line")
  }

  /** The user-facing artifact: the bounded body collected (k node + k
    * edge lines — the same bounded-collect contract as the serving
    * top-N) and wrapped in a `graph` block, ready for `dot -Tsvg`. */
  def toDot(spark: SparkSession, dir: String, k: Int = 100): String =
    dotLines(spark, dir, k).collect()
      .map(_.getString(0))
      .mkString("graph cooc {\n", "\n", "\n}\n")
}
