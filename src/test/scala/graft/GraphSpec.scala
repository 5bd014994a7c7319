package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine-side pins for the graph family's r18 closing key —
  * q_graph_assortativity (Newman 2002 degree assortativity). The
  * oracle pins the arithmetic cross-engine; these pin (a) the exact
  * Pearson chain against a scalar re-derivation from the raw edge
  * list, (b) the symmetry theorem the undirected formula leans on,
  * and (c) the broadcast degree-attach plan shape.
  */
class GraphSpec extends AnyFunSuite {
  import TestSpark._

  test("q_graph_assortativity: scalar Pearson re-derivation from the edge list") {
    val row = SparkEntry.queries("q_graph_assortativity")(spark, sf0001)
      .collect().head
    val (nEdges, sxServed, sxyServed, rServed) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))

    val (symDf, degDf) = operators.GraphOps.symWithDeg(spark, sf0001)
    val deg = degDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = symDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.length.toLong == nEdges)

    // the six exact integer sums, re-accumulated scalar-side
    var (sx, sy, sxy, sxx, syy) = (0L, 0L, 0L, 0L, 0L)
    edges.foreach { case (a, b) =>
      val (dx, dy) = (deg(a), deg(b))
      sx += dx; sy += dy; sxy += dx * dy; sxx += dx * dx; syy += dy * dy
    }
    assert(sx == sxServed && sxy == sxyServed,
      s"sufficient statistics drifted: ($sx, $sxy) vs ($sxServed, $sxyServed)")
    // symmetry theorem: the symmetrized edge list makes the two axes
    // exchangeable, so Σx = Σy and Σx² = Σy² EXACTLY — the undirected
    // Newman formula falls out of the generic Pearson chain
    assert(sx == sy && sxx == syy, s"symmetry broken: $sx/$sy, $sxx/$syy")
    // the one IEEE boundary, replayed in the identical op order
    val n = nEdges.toDouble
    val r = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (math.sqrt(n * sxx.toDouble - sx.toDouble * sx.toDouble) *
        math.sqrt(n * syy.toDouble - sy.toDouble * sy.toDouble))
    assert(math.floor(r * 1000000.0).toLong == rServed,
      s"Pearson chain drifted: scalar $r vs served $rServed")
    // degrees are in [-1, 1] by Cauchy–Schwarz
    assert(rServed >= -1000000L && rServed <= 1000000L)
  }

  test("q_graph_assortativity plan: degree attaches ride broadcasts, no cartesian") {
    val df = SparkEntry.queries("q_graph_assortativity")(spark, sf0001)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!fin.contains("CartesianProduct"), fin.take(2500))
    // both endpoint degree joins broadcast the Heaps-law-sized degree
    // table — the corpus-scale edge list never shuffles for the attach
    assert("BroadcastHashJoin".r.findAllIn(fin).size >= 2, fin.take(2500))
    assert(!fin.contains("SortMergeJoin"),
      s"degree attach fell back to a corpus shuffle:\n${fin.take(2500)}")
  }
}
