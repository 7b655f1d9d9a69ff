package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L),
    (7L, 7L)).toDF("s", "d")

  test("degrees counts in and out per vertex") {
    val m = Graph.degrees(edges, "s", "d").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == (1L, 0L) && m(2L) == (1L, 1L) && m(4L) == (0L, 1L))
    assert(m(7L) == (1L, 1L)) // self-loop
  }

  test("twoHop chains edges") {
    val hops = Graph.twoHop(edges, "s", "d", edges, "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hops.contains((1L, 2L, 3L)) && hops.contains((2L, 3L, 4L)))
    assert(!hops.exists(h => h._1 == 5L))
  }

  test("connected components: min-label propagation converges") {
    val comp = Graph.connectedComponents(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).map(comp).toSet == Set(1L))
    assert(comp(5L) == 5L && comp(6L) == 5L)
    assert(comp(7L) == 7L)
  }
}
