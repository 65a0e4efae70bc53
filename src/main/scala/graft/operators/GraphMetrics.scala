package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structural graph metrics over the derived co-purchase graph — the
  * extension tier's graph-analytics widening beyond the reference's
  * PageRank family (SURVEY §2.9: the reference's only graph computation
  * is the PPR fixpoint; triadic structure is the natural next audit a
  * product-graph owner runs: triangle-dense neighborhoods are bundles /
  * substitute clusters, and the local clustering coefficient is the
  * standard cohesion score per node).
  */
object GraphMetrics {

  /** `triangle_counts`: per-vertex triangle count + local clustering
    * coefficient `2T / (d·(d−1))` on the undirected co-purchase graph
    * (vertices = products, edges = "appeared in the same order at least
    * once" — [[Relational.coocCounts]]' pair relation).
    *
    * Algorithm: degree-ordered edge orientation (the classic
    * MapReduce-era scheme — Suri & Vassilvitskii, WWW'11; Schank's
    * thesis): orient every edge from its (degree, id)-smaller endpoint
    * to the larger, making the graph a DAG in which each triangle has
    * exactly one source vertex; enumerate out-neighbor pairs (wedges)
    * per source and keep those closed by an edge. Orientation bounds
    * per-vertex out-degree by O(√(2m)) REGARDLESS of hot vertices — a
    * celebrity product with degree 10⁶ contributes 10⁶ wedge rows, not
    * 10¹² — which is what makes the wedge expansion safe at 100 TB
    * (measured here: max degree 222 → max out-degree 97 at sf0.1, and
    * per-vertex degrees stay ~flat as the catalog grows, so wedge volume
    * scales LINEARLY with edges: 7.7M wedges at sf0.01 → 82M at sf0.1,
    * both ~67× the edge count).
    *
    * Plan shape: the wedge expansion is in-row ([[Dedup.bucketPairs]]
    * over the collected out-adjacency — provably bounded arrays, the
    * orientation IS the hot-bucket guard), so the only joins are the two
    * vertex-keyed degree attachments and ONE closing equi-join of wedges
    * against the id-sorted undirected edge list (wedge pairs come out of
    * bucketPairs id-sorted, so the closing probe needs no orientation
    * case split). Nothing is hinted: the edge relation grows with the
    * catalog, so AQE elects broadcast only when it measures small.
    */
  def triangleCounts(spark: SparkSession, dir: String): DataFrame =
    triangleCountsOf(Relational.coocCounts(spark, dir))

  /** [[triangleCounts]] over any symmetric directed (src, dst, …)
    * neighbor relation (one row per orientation of each undirected
    * edge, no self-loops) — the fixture-testable form. */
  private[graft] def triangleCountsOf(cc: DataFrame): DataFrame = {
    // degree = out-degree in the symmetric directed relation (one row
    // per (vertex, neighbor))
    val deg = cc.groupBy(col("src").as("v")).agg(count(lit(1)).as("d"))
    // undirected edge list, canonically id-sorted (src < dst)
    val und = cc.filter(col("src") < col("dst")).select("src", "dst")
    val srcFirst = col("d_src") < col("d_dst") ||
      (col("d_src") === col("d_dst") && col("src") < col("dst"))
    val oriented = und
      .join(deg.select(col("v").as("src"), col("d").as("d_src")), Seq("src"))
      .join(deg.select(col("v").as("dst"), col("d").as("d_dst")), Seq("dst"))
      .select(when(srcFirst, col("src")).otherwise(col("dst")).as("u"),
        when(srcFirst, col("dst")).otherwise(col("src")).as("v"))
    // out-adjacency per source — bounded by O(√(2m)) via the orientation
    val adj = oriented.groupBy("u")
      .agg(sort_array(collect_list(col("v"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    val wedges = adj.select(col("u"),
      Dedup.bucketPairs((x, y) => s"struct($x AS a, $y AS b)").as("pr"))
      .select(col("u"), col("pr.a").as("a"), col("pr.b").as("b"))
    // a wedge (u; a, b) closes iff the undirected edge {a, b} exists;
    // (a, b) is id-sorted by construction, matching und's canonical form,
    // and the orientation DAG gives each triangle exactly one source u —
    // every triangle is found exactly once
    val tri = wedges.join(und,
      wedges("a") === und("src") && wedges("b") === und("dst"))
      .select(col("u"), col("a"), col("b"))
    val perVertex = tri
      .select(explode(array(col("u"), col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("t"))
    deg.join(perVertex, Seq("v"), "left_outer")
      .select(col("v").as("product_id"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        when(col("d") >= 2,
          round((lit(2.0) * coalesce(col("t"), lit(0L))) /
            (col("d") * (col("d") - lit(1.0))), 6))
          .otherwise(0.0).as("clust_coeff"))
      .orderBy("product_id")
  }
}
