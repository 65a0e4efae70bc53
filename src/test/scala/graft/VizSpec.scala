package graft

import graft.operators.Viz

/** G3 DOT export semantics (ref: `tp1/knoledge_graphs/graph.py:88-127`):
  * nodes = endpoints of the surfaced co-occurrence edges, undirected
  * edges once each, penwidth = 2 + 6·(w/max_w) integerized to 2dp. */
class VizSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val NodeLine = """  (\d+);""".r
  private val EdgeLine = """  (\d+) -- (\d+) \[penwidth=(\d)\.(\d\d)\];""".r

  test("dotLines emits well-formed node and edge lines, nodes first") {
    val lines = Viz.dotLines(spark, dir, k = 50).collect().map(_.getString(0))
    assert(lines.nonEmpty)
    val (nodes, edges) = lines.span(NodeLine.matches(_))
    assert(edges.nonEmpty && edges.forall(EdgeLine.matches(_)),
      s"unparsed lines: ${edges.filterNot(EdgeLine.matches(_)).take(3).toSeq}")
    assert(edges.length <= 50)
    // node set == endpoint set of the emitted edges
    val ids = nodes.map { case NodeLine(id) => id.toLong }.toSet
    val endpoints = edges.flatMap {
      case EdgeLine(a, b, _, _) => Seq(a.toLong, b.toLong)
    }.toSet
    assert(ids == endpoints)
    // undirected once each: src < dst, no duplicate pair
    val pairs = edges.map { case EdgeLine(a, b, _, _) => (a.toLong, b.toLong) }
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
  }

  test("penwidths span [2.00, 8.00] with the max-weight edge at 8.00") {
    val widths = Viz.dotLines(spark, dir, k = 50).collect()
      .map(_.getString(0)).collect {
        case EdgeLine(_, _, i, f) => i.toInt * 100 + f.toInt
      }
    assert(widths.max == 800) // w == max_w → 2 + 6·1
    assert(widths.forall(w => w >= 200 && w <= 800))
  }

  test("toDot wraps the body in a graph block") {
    val dot = Viz.toDot(spark, dir, k = 10)
    assert(dot.startsWith("graph cooc {\n"))
    assert(dot.endsWith("\n}\n"))
  }
}
